package graft.sink

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The distributed twin of [[ColumnarSize]]: the same uncompressed
  * columnar size estimate, but as a Catalyst expression evaluated
  * where the data lives — no driver collect, codegen'd, one `sum`
  * away from a whole-DataFrame size. Used by the streaming shard sink
  * to derive per-file record caps from byte thresholds at scale.
  *
  * Keep the two estimators in lockstep: a value must cost the same
  * bytes here and in [[ColumnarSize.ofRow]].
  */
object ColumnarSizeExpr {

  /** Estimated bytes of one row of `schema`. */
  def rowBytes(schema: StructType): Column =
    schema.fields.map(f => valueBytes(col(f.name), f.dataType)).reduce(_ + _)

  private def valueBytes(c: Column, dt: DataType): Column = {
    val sz: Column = dt match {
      case LongType | DoubleType | TimestampType | TimestampNTZType => lit(8L)
      case IntegerType | FloatType | DateType => lit(4L)
      case ShortType => lit(2L)
      case ByteType | BooleanType => lit(1L)
      case StringType | BinaryType => octet_length(c).cast("long") + 4L
      case _: DecimalType => lit(16L)
      case ArrayType(et, _) if fixedWidth(et).isDefined =>
        lit(4L) + size(c).cast("long") * fixedWidth(et).get
      case ArrayType(StringType, _) =>
        // sum of element byte lengths + a 4-byte offset each
        lit(4L) + coalesce(
          aggregate(c, lit(0L), (acc, e) => acc + octet_length(e) + 4L), lit(0L))
      case st: StructType =>
        st.fields.map(f => valueBytes(c.getField(f.name), f.dataType)).reduce(_ + _)
      case other => lit(other.defaultSize.toLong)
    }
    when(c.isNull, lit(0L)).otherwise(sz)
  }

  private def fixedWidth(dt: DataType): Option[Long] = dt match {
    case LongType | DoubleType | TimestampType => Some(8L)
    case IntegerType | FloatType | DateType    => Some(4L)
    case ShortType                             => Some(2L)
    case ByteType | BooleanType                => Some(1L)
    case _                                     => None
  }
}

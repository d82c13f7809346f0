package graft.sink

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Runtime type-conformance check: does this external `Row` already
  * hold exactly the JVM representations the schema's encoder expects?
  * Used by [[ParquetStreamSink.writeRows]] to skip the Catalyst cast
  * for already-typed rows (the cast would be the identity). The check
  * is CONSERVATIVE: any type it doesn't recognize returns false and
  * the caller routes through the full cast/validation path, so a
  * wrong answer can only cost speed, never correctness.
  */
object RowConformance {

  def conforms(r: Row, schema: StructType): Boolean =
    r.length == schema.length && {
      var i = 0
      var ok = true
      while (ok && i < schema.length) {
        if (!r.isNullAt(i)) ok = valueConforms(r.get(i), schema(i).dataType)
        i += 1
      }
      ok
    }

  private def valueConforms(v: Any, dt: DataType): Boolean = dt match {
    case LongType      => v.isInstanceOf[java.lang.Long]
    case IntegerType   => v.isInstanceOf[java.lang.Integer]
    case DoubleType    => v.isInstanceOf[java.lang.Double]
    case FloatType     => v.isInstanceOf[java.lang.Float]
    case ShortType     => v.isInstanceOf[java.lang.Short]
    case ByteType      => v.isInstanceOf[java.lang.Byte]
    case BooleanType   => v.isInstanceOf[java.lang.Boolean]
    case StringType    => v.isInstanceOf[String]
    case BinaryType    => v.isInstanceOf[Array[Byte]]
    case TimestampType =>
      v.isInstanceOf[java.sql.Timestamp] || v.isInstanceOf[java.time.Instant]
    case DateType =>
      v.isInstanceOf[java.sql.Date] || v.isInstanceOf[java.time.LocalDate]
    case _: DecimalType => v.isInstanceOf[java.math.BigDecimal]
    case ArrayType(et, _) => v match {
      case s: scala.collection.Seq[_] => s.forall(e => e == null || valueConforms(e, et))
      case _                          => false
    }
    case st: StructType => v match {
      case r: Row => conforms(r, st)
      case _      => false
    }
    case _ => false // unknown type: let the cast path decide
  }
}

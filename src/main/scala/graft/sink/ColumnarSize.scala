package graft.sink

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Estimated uncompressed in-memory *columnar* size of rows — the
  * sink's byte-accounting unit, mirroring the reference's use of Arrow
  * `RecordBatch.nbytes` (`writer.py:20`): fixed-width values at their
  * width, variable-width values at data bytes + a 4-byte offset,
  * nulls at zero (validity bitmaps are noise at threshold scale).
  *
  * This is an ESTIMATE by design — the reference documents its
  * thresholds as "approximate maximum uncompressed memory size"
  * (`README.md:135-137`). What must be exact is monotonic accounting
  * (more data never measures smaller) and determinism (same rows →
  * same bytes on every engine), both of which hold here. Tests compute
  * thresholds with this same function, exactly as the reference tests
  * derive thresholds from `table.nbytes`.
  */
object ColumnarSize {

  def ofRows(rows: Iterable[Row], schema: StructType): Long =
    rows.iterator.map(ofRow(_, schema)).sum

  def ofRow(row: Row, schema: StructType): Long = {
    var total = 0L
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) total += ofValue(row.get(i), schema(i).dataType)
      i += 1
    }
    total
  }

  private def ofValue(v: Any, dt: DataType): Long = dt match {
    case LongType | DoubleType | TimestampType | TimestampNTZType => 8L
    case IntegerType | FloatType | DateType => 4L
    case ShortType => 2L
    case ByteType | BooleanType => 1L
    case StringType =>
      v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong + 4L
    case BinaryType => v.asInstanceOf[Array[Byte]].length.toLong + 4L
    case _: DecimalType => 16L
    case ArrayType(et, _) =>
      4L + v.asInstanceOf[scala.collection.Seq[Any]].iterator
        .filter(_ != null).map(ofValue(_, et)).sum
    case MapType(kt, vt, _) =>
      4L + v.asInstanceOf[scala.collection.Map[Any, Any]].iterator.map {
        case (k, mv) =>
          ofValue(k, kt) + (if (mv == null) 0L else ofValue(mv, vt))
      }.sum
    case st: StructType => ofRow(v.asInstanceOf[Row], st)
    case other => other.defaultSize.toLong
  }
}

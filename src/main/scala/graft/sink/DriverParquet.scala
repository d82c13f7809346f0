package graft.sink

import java.nio.file.Path

import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetOutputFormat}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** In-process Parquet encoding for the parity sink's staged flushes —
  * the driver-side analog of the reference's single `pq.ParquetWriter`
  * (`writer.py:192-196`).
  *
  * The rows of a parity-mode flush are already ON the driver (the
  * reference semantic under test is single-process buffering), so
  * encoding them through a Spark job costs one full job cycle —
  * schedule, task launch, commit protocol, ~1-2 s — per flush, pure
  * overhead that scales O(flushes), not O(data). This writer produces
  * the identical bytes with zero jobs: Spark's own
  * [[ParquetWriteSupport]] (same Catalyst→Parquet encoder the
  * executors run) driven directly through parquet-mr's
  * [[ParquetOutputFormat]]. `parquet.*` Hadoop options and the
  * `compression` option behave exactly as they do on the Spark write
  * path because both paths read them from the same Hadoop conf.
  */
object DriverParquet {

  /** Write `rows` (possibly empty ⇒ schema+footer-only file) to `dest`
    * as one Parquet file, one row group (parquet-mr rolls extra groups
    * only past the 128 MiB default block size — flushes are bounded by
    * the sink's buffer size, far below it).
    */
  def write(
      spark: SparkSession,
      dest: Path,
      schema: StructType,
      rows: Iterable[Row],
      options: Map[String, String]): Unit = {
    val sqlConf = spark.sessionState.conf
    val conf = spark.sessionState.newHadoopConfWithOptions(options)
    // The conf keys ParquetFileFormat.prepareWrite pins before handing
    // executors a write task; ParquetWriteSupport.init asserts on them.
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlConf.writeLegacyParquetFormat.toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlConf.parquetOutputTimestampType.toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlConf.parquetFieldIdWriteEnabled.toString)
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlConf.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    ParquetWriteSupport.setSchema(schema, conf)

    // Same precedence and case-insensitivity as Spark's ParquetOptions:
    // `compression` option → `parquet.compression` option → session
    // default. The explicit codec handed to getRecordWriter overrides
    // whatever the Hadoop conf carries, so the resolution must consult
    // parquet.compression itself — newHadoopConfWithOptions alone
    // would silently lose it.
    val codec = codecName(
      option(options, "compression")
        .orElse(option(options, ParquetOutputFormat.COMPRESSION))
        .getOrElse(sqlConf.parquetCompressionCodec))
    val writer = new ParquetOutputFormat[InternalRow](new ParquetWriteSupport)
      .getRecordWriter(conf, new org.apache.hadoop.fs.Path(dest.toUri),
        codec, ParquetFileWriter.Mode.OVERWRITE)
    val toInternal = CatalystTypeConverters.createToCatalystConverter(schema)
    try rows.foreach(r => writer.write(null, toInternal(r).asInstanceOf[InternalRow]))
    finally writer.close(null)
  }

  /** DataFrameWriter options are a CaseInsensitiveMap; mirror that. */
  private def option(options: Map[String, String], key: String): Option[String] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  /** Spark's `compression` option short names → parquet-mr codecs
    * (the mapping `ParquetOptions` applies on the executor path;
    * `lz4` and `lz4_raw` are distinct codecs there and must stay
    * distinct here or files change format under the same option).
    */
  private def codecName(name: String): CompressionCodecName =
    name.toLowerCase match {
      case "none" | "uncompressed" => CompressionCodecName.UNCOMPRESSED
      case "snappy"                => CompressionCodecName.SNAPPY
      case "gzip"                  => CompressionCodecName.GZIP
      case "lzo"                   => CompressionCodecName.LZO
      case "lz4"                   => CompressionCodecName.LZ4
      case "lz4_raw"               => CompressionCodecName.LZ4_RAW
      case "brotli"                => CompressionCodecName.BROTLI
      case "zstd"                  => CompressionCodecName.ZSTD
      case other => throw new IllegalArgumentException(
        s"unknown parquet compression codec '$other'")
    }
}

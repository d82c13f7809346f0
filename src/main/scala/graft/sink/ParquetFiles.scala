package graft.sink

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}

/** Row-group-level Parquet file surgery for the sink's shard finalize
  * step. A Parquet file cannot be appended to after its footer is
  * written, so each buffer flush lands as its own staged file; when a
  * shard closes, its staged flushes are concatenated **at the binary
  * row-group level** (`ParquetFileWriter.appendFile` — no decode, no
  * re-encode, no decompress). This keeps the observable semantics of
  * the reference's single `pq.ParquetWriter` per shard
  * (`writer.py:177-199`): one file per shard, row groups in flush
  * order, each flush = the row groups `write_table` would have
  * produced.
  *
  * Cost model at scale: finalize is one sequential read+write of the
  * shard (pure I/O), done once per shard — not per flush — so total
  * merge I/O is O(data), not O(data × flushes).
  */
object ParquetFiles {

  private def conf(): Configuration = new Configuration()

  /** Concatenate `parts` (in order) into `dest`, replacing it.
    * Single part degenerates to a rename. Preserves key-value footer
    * metadata (e.g. Spark's row schema) from the first part.
    */
  def concat(parts: Seq[Path], dest: Path): Unit = {
    require(parts.nonEmpty, "concat needs at least one part")
    if (parts.sizeIs == 1) {
      Files.move(parts.head, dest, StandardCopyOption.REPLACE_EXISTING)
      return
    }
    val c = conf()
    val first = ParquetFileReader.open(
      HadoopInputFile.fromPath(hPath(parts.head), c))
    val (schema, keyValueMeta) =
      try {
        val md = first.getFooter.getFileMetaData
        (md.getSchema, md.getKeyValueMetaData)
      } finally first.close()

    val tmp = dest.resolveSibling("." + dest.getFileName.toString + ".concat.tmp")
    Files.deleteIfExists(tmp)
    // 128 MiB target block size / 8 MiB max padding — parquet-mr's own
    // defaults (ParquetWriter.DEFAULT_BLOCK_SIZE / MAX_PADDING_SIZE_DEFAULT);
    // irrelevant to appendFile, which copies source row groups verbatim.
    val writer = new ParquetFileWriter(
      HadoopOutputFile.fromPath(hPath(tmp), c), schema,
      ParquetFileWriter.Mode.OVERWRITE,
      128L * 1024 * 1024, 8 * 1024 * 1024,
      null, org.apache.parquet.column.ParquetProperties.builder().build())
    writer.start()
    parts.foreach(p => writer.appendFile(HadoopInputFile.fromPath(hPath(p), c)))
    writer.end(keyValueMeta)
    Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING)
    parts.foreach(Files.deleteIfExists(_))
  }

  /** (rowGroupCount, totalRows, maxRowsInAnyGroup) from a file footer —
    * the metadata oracle the reference tests read with
    * `pq.read_metadata` (`tests/tests.py:244-248`).
    */
  def rowGroupStats(file: Path): (Int, Long, Long) = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(hPath(file), conf()))
    try {
      val blocks = r.getFooter.getBlocks.asScala
      val rows = blocks.map(_.getRowCount)
      (blocks.size, rows.sum, if (rows.isEmpty) 0L else rows.max)
    } finally r.close()
  }

  /** Whether column-chunk statistics are present for the first column
    * of the first row group (`tests/tests.py:161-169` analog).
    */
  def firstColumnHasStatistics(file: Path): Boolean = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(hPath(file), conf()))
    try {
      val col = r.getFooter.getBlocks.get(0).getColumns.get(0)
      val st: org.apache.parquet.column.statistics.Statistics[_] = col.getStatistics
      st != null && !st.isEmpty
    } finally r.close()
  }

  /** Compression codec of the first column chunk of the first row
    * group — the footer fact the codec-option tests pin.
    */
  def firstColumnCodec(file: Path): String = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(hPath(file), conf()))
    try r.getFooter.getBlocks.get(0).getColumns.get(0).getCodec.name()
    finally r.close()
  }

  private def hPath(p: Path): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(p.toUri)
}

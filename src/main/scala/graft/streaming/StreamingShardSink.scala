package graft.streaming

import java.nio.file.{FileAlreadyExistsException, Files, NoSuchFileException, Path, StandardCopyOption}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, sum}
import org.apache.spark.sql.types.StructType

import graft.sink.ColumnarSizeExpr

/** The DISTRIBUTED execution mode of the streaming Parquet sink — the
  * shape the same semantics take on a 1000-executor cluster, where the
  * driver-buffered parity sink ([[graft.sink.ParquetStreamSink]])
  * would bottleneck on its single in-order writer.
  *
  * Mapping of the reference's concepts (`writer.py:44-303`) onto
  * Spark's streaming execution model:
  *  - "batch arrival" = one micro-batch (`foreachBatch` delivers it;
  *    Spark already serializes calls per query, matching the
  *    reference's single-threaded lifecycle, `writer.py:132-149`),
  *  - "buffer" = the micro-batch itself: flush-per-batch, so memory is
  *    bounded by trigger sizing instead of a driver-side byte counter,
  *  - "shard" = an output file: the byte threshold becomes a per-file
  *    record cap (`maxRecordsPerFile`) derived per batch from the SAME
  *    columnar byte estimator the parity sink uses
  *    ([[ColumnarSizeExpr]] — computed where the data lives, one agg,
  *    no collect),
  *  - "{prefix}-{index}.parquet" naming + `writtenFiles` manifest:
  *    tasks write to a staging dir; the driver then renames the part
  *    files to sequential shard indices — a metadata-only operation,
  *    data never moves through the driver,
  *  - validation (missing parent / existing path / negative sizes) and
  *    lazy directory semantics match the reference
  *    (`writer.py:127-169`).
  *
  * Relaxation vs the parity sink, stated honestly: global insertion
  * order across shards is only guaranteed when each micro-batch has a
  * deterministic partition order (shards are renamed in batch order,
  * then partition order, then per-task file order); rows of one input
  * partition never interleave with another's. The strict sequential
  * rollover (`strict >`, rotate-before-flush) degenerates here to
  * "each file carries ≈ shardSizeBytes", which is the property
  * downstream readers actually rely on at scale.
  *
  * RESTART SAFETY (beyond the single-process reference, which has no
  * such obligation — a "100 TB" sink does): every committed batch is
  * recorded in a sidecar commit log `_graft_commits.tsv` under the
  * output dir — one `batchId \t startIndex \t fileCount` line APPENDED
  * per batch (a single write syscall; O(1) per batch where a full
  * rewrite would make a long-running query's cumulative log I/O
  * quadratic). Completeness is the trailing newline: a torn final
  * append leaves none, restore drops the fragment, and the batch —
  * never acknowledged as committed — replays cleanly. `addBatch(df,
  * batchId)` skips batchIds the log already holds, so Structured
  * Streaming's replay of the last uncommitted micro-batch after a
  * checkpoint restart lands exactly-once; a partially-renamed batch
  * (crash between the moves and the log append) is rewritten in
  * place — orphan shard files at or beyond the restored index are
  * deleted before the batch's renames, so a replay that produces
  * fewer task files can't leave a stale duplicate shard behind.
  * Construct with `resume = true` to re-attach to an existing output
  * directory: the shard counter and manifest are restored from the
  * log. A resume dir holding shard files but NO log fails fast — with
  * the counter at zero the orphan cleanup would otherwise delete the
  * entire existing dataset on the first batch.
  */
final class StreamingShardSink(
    rawPath: Path,
    val schema: StructType,
    val shardSizeBytes: Long,
    filePrefix: Option[String] = None,
    overwrite: Boolean = false,
    val options: Map[String, String] = Map.empty,
    val writerTasks: Int = 0,
    resume: Boolean = false) {

  require(shardSizeBytes > 0, "shard_size_bytes must be positive")

  val path: Path = rawPath.toAbsolutePath.normalize
  val prefix: String = filePrefix.getOrElse(path.getFileName.toString)

  private val manifest = ArrayBuffer.empty[Path]
  private var shardIndex = 0
  // batchId → (startIndex, fileCount), insertion-ordered for the log
  private val committed = scala.collection.mutable.LinkedHashMap.empty[Long, (Int, Int)]
  private val commitLog: Path = path.resolve("_graft_commits.tsv")

  if (Files.exists(path) && !resume) {
    if (overwrite) deleteRecursively(path)
    else throw new FileAlreadyExistsException(s"'$path' already exists.")
  }
  if (path.getParent == null || !Files.exists(path.getParent))
    throw new NoSuchFileException(s"'${path.getParent}' does not exist.")
  if (Files.exists(path) && resume) restoreFromCommitLog()
  else Files.createDirectory(path)

  /** Run `f` over a lazily-populated NIO stream and CLOSE it: each of
    * Files.list/walk holds an open directory fd until closed, and the
    * per-micro-batch call sites would otherwise leak one per batch
    * until GC finalization — a long low-allocation query runs into the
    * process fd limit.
    */
  private def withStream[A](s: java.util.stream.Stream[Path])(
      f: Iterator[Path] => A): A =
    try f(s.iterator.asScala) finally s.close()

  private def deleteRecursively(p: Path): Unit =
    withStream(Files.walk(p))(
      _.toSeq.sorted(Ordering[Path].reverse).foreach(Files.deleteIfExists(_)))

  private def restoreFromCommitLog(): Unit = {
    if (Files.exists(commitLog)) {
      val bytes = Files.readAllBytes(commitLog)
      val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      // a record is complete iff its newline landed (appendCommit
      // writes line+\n in one syscall): drop a torn final fragment —
      // that batch was never acknowledged and will replay
      val complete = text.lastIndexOf('\n') match {
        case -1 => ""
        case i  => text.substring(0, i + 1)
      }
      val completeBytes = complete.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // truncate the fragment ON DISK too: appendCommit O_APPENDs, so a
      // surviving fragment would merge with the next record into one
      // line and poison the restart after this one. SHRINK IN PLACE
      // (FileChannel.truncate) — a truncate-to-zero-then-rewrite
      // (Files.write TRUNCATE_EXISTING) has a crash window in which
      // every committed record is gone while the file still exists, so
      // the next resume would restore a zero shard counter and the
      // orphan cleanup would delete all committed shards; an in-place
      // shrink never touches committed bytes, keeping the worst crash
      // outcome at "torn tail again"
      if (completeBytes.length != bytes.length) {
        val ch = java.nio.channels.FileChannel.open(commitLog,
          java.nio.file.StandardOpenOption.WRITE)
        try ch.truncate(completeBytes.length.toLong) finally ch.close()
      }
      complete.split('\n').iterator.filter(_.nonEmpty).foreach { line =>
        val Array(b, start, n) = line.split('\t')
        committed += b.toLong -> (start.toInt, n.toInt)
      }
      shardIndex = committed.valuesIterator
        .map { case (start, n) => start + n }.maxOption.getOrElse(0)
      (0 until shardIndex).foreach(i => manifest += path.resolve(s"$prefix-$i.parquet"))
    } else {
      // no log, but shard-patterned files present: resuming would
      // restore index 0 and the orphan cleanup would delete the whole
      // dataset on the first batch — refuse instead of losing data
      val orphaned = withStream(Files.list(path))(_.exists { p =>
        val n = p.getFileName.toString
        n.startsWith(s"$prefix-") && n.endsWith(".parquet")
      })
      if (orphaned) throw new IllegalStateException(
        s"resume=true but '$commitLog' is missing while '$path' holds " +
          s"'$prefix-N.parquet' files — refusing to resume with a zero " +
          "shard counter, which would delete the existing shards as " +
          "orphans on the first batch")
    }
    // leftover staging dirs from a crashed batch attempt
    withStream(Files.list(path))(
      _.filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(".batch-"))
        .toSeq).foreach(deleteRecursively)
  }

  private def appendCommit(batchId: Long, start: Int, n: Int): Unit = {
    committed += batchId -> (start, n)
    Files.write(commitLog,
      s"$batchId\t$start\t$n\n".getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  /** Absolute shard paths in creation order. */
  def writtenFiles: Seq[Path] = manifest.toSeq

  /** The next unused batchId (max committed + 1) — a resumed daily
    * append must CONTINUE the id sequence: re-using yesterday's ids
    * would make every append a silent exactly-once no-op.
    */
  def nextBatchId: Long = synchronized {
    committed.keysIterator.maxOption.map(_ + 1L).getOrElse(0L)
  }

  /** Whether `batchId` is already committed — callers doing per-batch
    * derivation work (packing offsets) can skip it entirely on a
    * replay instead of computing a frame [[addBatch]] will discard.
    */
  def isCommitted(batchId: Long): Boolean = synchronized {
    committed.contains(batchId)
  }

  /** Shard files committed by batches with id strictly below
    * `batchId`, in creation order — the packing-offset derivation for
    * the streaming export: committed files are immutable, so a
    * restart replay of `batchId` recomputes the SAME offset its first
    * attempt used, keeping the packed layout deterministic across
    * crashes.
    */
  def filesCommittedBefore(batchId: Long): Seq[Path] = synchronized {
    committed.iterator.collect { case (b, (start, n)) if b < batchId =>
      (start until start + n).map(i => path.resolve(s"$prefix-$i.parquet"))
    }.flatten.toSeq
  }

  /** `foreachBatch`-compatible entry point: exactly-once under
    * micro-batch replay — an already-committed batchId is a no-op.
    */
  def addBatch(df: DataFrame, batchId: Long): Unit = synchronized {
    if (committed.contains(batchId)) return
    // a partial earlier attempt of this batch may have renamed some
    // files before crashing; clear anything at/beyond the next index
    // so a replay with a different task-file count can't strand one
    withStream(Files.list(path))(_.toSeq).foreach { p =>
      val n = p.getFileName.toString
      if (n.startsWith(s"$prefix-") && n.endsWith(".parquet")) {
        val idx = n.stripPrefix(s"$prefix-").stripSuffix(".parquet")
        if (idx.forall(_.isDigit) && idx.toInt >= shardIndex) Files.delete(p)
      }
    }
    val start = shardIndex
    addBatch(df)
    appendCommit(batchId, start, shardIndex - start)
  }

  /** Cast one micro-batch to the schema and write it as
    * ≈`shardSizeBytes` files appended to the shard sequence.
    */
  def addBatch(df: DataFrame): Unit = synchronized {
    val casted = df.select(
      schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)

    // SAMPLE-based row sizing: a bounded CollectLimit job over the
    // first rows, not a full pass — the shard threshold is documented
    // approximate (reference README.md:135-137), so a ~1k-row average
    // is plenty, and a full-batch agg would double every batch's scan
    // (measured 3× slower end-to-end at sf0.1). Also the empty check.
    val stats = casted.limit(1024).agg(
      sum(org.apache.spark.sql.functions.lit(1L)).as("rows"),
      sum(ColumnarSizeExpr.rowBytes(schema)).as("bytes")).head()
    if (stats.isNullAt(0) || stats.getLong(0) == 0L) return
    val rows = stats.getLong(0)
    val bytes = stats.getLong(1)
    val avgRowBytes = math.max(bytes / math.max(rows, 1L), 1L)
    val recordsPerShard = math.max(shardSizeBytes / avgRowBytes, 1L)

    val staging = Files.createTempDirectory(path, ".batch-")
    val repartitioned = if (writerTasks > 0) casted.repartition(writerTasks) else casted
    repartitioned
      .write.format("parquet").mode("overwrite")
      .options(options)
      .option("maxRecordsPerFile", recordsPerShard)
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .save(staging.toString)

    // metadata-only finalize: rename task outputs into the shard
    // sequence, deterministic (partition, file-counter) order
    val parts = withStream(Files.list(staging))(
      _.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("part-") && n.endsWith(".parquet")
      }.toSeq).sortBy(_.getFileName.toString)
    parts.foreach { p =>
      val dest = path.resolve(s"$prefix-$shardIndex.parquet")
      Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE)
      manifest += dest
      shardIndex += 1
    }
    deleteRecursively(staging)
  }
}

package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.streaming.StreamingShardSink

/** 1×/10×/30× throughput probe for the DISTRIBUTED shard sink
  * ([[graft.streaming.StreamingShardSink]]) — the declared 100 TB
  * write path (the scale twin of the reference's single-writer sink)
  * — measuring what its design argument has so far stated without a
  * recorded number: micro-batch ingest throughput (rows/s), shard
  * production rate, and the growth of the two pieces of driver-side
  * state (the in-memory manifest and the appended commit log, both
  * O(shards) — the log append is O(1) per batch by design).
  *
  * Fixture: [[ScaleProbe.buildFixture]]'s salted-copy corpus (exact
  * within-copy structure, linear growth), fed as a fixed ladder of 20
  * micro-batches (hash-sliced on doc_id — deterministic, balanced),
  * so the per-batch overhead (one columnar-size aggregate, one
  * write + renames, one log append) is measured at constant batch
  * COUNT while batch SIZE scales — the deployment shape, where
  * trigger sizing fixes the cadence and data volume rides inside
  * each trigger. Timing covers the addBatch loop only (the
  * foreachBatch body — exactly what a streaming query pays per
  * micro-batch at the sink); fixture build and the row-contract
  * re-read run outside the clock. One JVM per ladder. Emits one JSON
  * line per factor; numbers land in BASELINE.md. Run:
  * `sbt "runMain graft.SinkProbe /root/testdata/sf0.1 1,10,30"`.
  */
object SinkProbe {

  private val Batches = 20

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,10,30").split(",").map(_.trim.toInt)
    val outRoot = args.lift(2).getOrElse("/tmp/graft-sink-probe")
    val spark = Sessions.builder("graft-sink-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    factors.foreach(f => runOne(spark, srcDir, s"$outRoot/f$f", f))
    spark.stop()
  }

  private def runOne(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, dir: String, factor: Int): Unit = {
    val nDocs = ScaleProbe.buildFixture(spark, srcDir, dir, factor)
    // clean slate BEFORE the slices: isolateQueries unpersists every
    // persistent RDD, which would free the localCheckpoint blocks the
    // timed loop is about to read
    Sessions.isolateQueries(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // materialize the 20 hash slices BEFORE the clock: the probe
    // times the sink, not 20 re-scans of the corpus
    val slices = (0 until Batches).map { i =>
      docs.filter(pmod(col("doc_id"), lit(Batches)) === i)
        .localCheckpoint()
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val out = Paths.get(dir, "shards")
    // 64 KiB shards: small enough that the byte threshold BINDS at
    // the higher factors (shard count then scales with volume instead
    // of sitting on the batches × partitions task-file floor), large
    // enough that factor 1 still writes one file per task
    val sink = new StreamingShardSink(out, schema,
      shardSizeBytes = 1L << 16, filePrefix = Some("doc"))
    val t0 = System.nanoTime()
    slices.zipWithIndex.foreach { case (b, i) => sink.addBatch(b, i.toLong) }
    val sinkSec = secsSince(t0)
    slices.foreach(_.unpersist(true))

    val shards = sink.writtenFiles.size
    val logBytes = Files.size(out.resolve("_graft_commits.tsv"))
    val backRows = spark.read.schema(schema).parquet(out.toString).count()
    require(backRows == nDocs, s"round-trip row loss: $backRows vs $nDocs")
    val rps = math.round(nDocs / sinkSec)
    println(
      s"""{"probe":"sink","factor":$factor,"rows":$nDocs,""" +
      s""""batches":$Batches,"sink_sec":$sinkSec,"rows_per_sec":$rps,""" +
      s""""shards":$shards,"manifest_entries":$shards,""" +
      s""""commit_log_bytes":$logBytes}""")
  }

  private def secsSince(t: Long): Double =
    math.round((System.nanoTime() - t) / 1e6) / 1e3
}

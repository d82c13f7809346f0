package graft

import org.apache.spark.sql.SparkSession

/** Scale probe for the content-defined-chunking family — measures, on
  * `factor` salted copies of sf0.1 ([[ScaleProbe.buildFixture]], the
  * same corpus the dedup-capstone probe uses), the costs the CDC
  * family's 100 TB claims rest on:
  *
  *   - `chunk_sec` / `dedup_sec`: the O(chars) map-side kernel pass
  *     (`x_cdc_chunks`) and the chunk-hash groupBy-min accounting
  *     (`x_cdc_dedup`) — both should scale ~linearly in corpus chars,
  *     since the kernel runs once per character and the dedup
  *     aggregate collapses map-side before its exchange.
  *   - `store_sec`: the stale chunk-store build (`ensureCdcStore`,
  *     cold — the fixture rebuild re-keys the stamp), the compaction-
  *     cadence artifact every ingest gate reads.
  *   - `gate_sec` / `novelty_sec`: the per-batch costs against the
  *     warm store — the bottom-k probe joins (`x_cdc_gate`) and the
  *     store-growth accounting (`x_cdc_novelty`). These pay the batch
  *     slice's chunking plus hash-only joins, so they should grow far
  *     slower than the corpus-wide passes above.
  *
  * Emits one JSON line per factor (BASELINE.md "CDC scale probe"
  * section). Run:
  * `sbt "runMain graft.CdcProbe /root/testdata/sf0.1 1,10,30"`.
  */
object CdcProbe {

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,10,30").split(",").map(_.trim.toInt)
    val outRoot = args.lift(2).getOrElse("/tmp/graft-cdc-probe")
    val spark = Sessions.builder("graft-cdc-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen startup so factor 1 isn't inflated
    spark.range(1000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    factors.foreach(f => runOne(spark, srcDir, s"$outRoot/f$f", f))
    spark.stop()
  }

  private def runOne(
      spark: SparkSession, srcDir: String, dir: String, factor: Int): Unit = {
    // the ScaleProbe measurement discipline: isolate between steps,
    // drive every query with a noop write (never .count() — Catalyst
    // eliminates unique-keyed join subtrees under count(1))
    def drive(name: String): Double = {
      Sessions.isolateQueries(spark)
      val t = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      secsSince(t)
    }
    val t0 = System.nanoTime()
    val nDocs = ScaleProbe.buildFixture(spark, srcDir, dir, factor)
    val tFixture = secsSince(t0)

    val tChunks = drive("x_cdc_chunks")
    val tDedup = drive("x_cdc_dedup")

    Sessions.isolateQueries(spark)
    val t1 = System.nanoTime()
    val storeRoot = queries.Pipeline.ensureCdcStore(spark, dir)
    val tStore = secsSince(t1)
    val nStored =
      spark.read.parquet(storeRoot.resolve("chunks").toString).count()

    val tGate = drive("x_cdc_gate")
    val tNovelty = drive("x_cdc_novelty")

    // row contracts AFTER the timings (counts drive different plans)
    val nChunks = SparkEntry.queries("x_cdc_chunks")(spark, dir).count()
    val nGate = SparkEntry.queries("x_cdc_gate")(spark, dir).count()
    require(nGate > 0 && nGate * 10 <= nChunks,
      s"gate audit rows ($nGate) implausible against $nChunks chunks")

    println(
      s"""{"probe":"cdc","factor":$factor,"docs":$nDocs,"chunks":$nChunks,""" +
      s""""stored_chunks":$nStored,"fixture_sec":$tFixture,""" +
      s""""chunk_sec":$tChunks,"dedup_sec":$tDedup,"store_sec":$tStore,""" +
      s""""gate_sec":$tGate,"novelty_sec":$tNovelty}""")
  }

  private def secsSince(t: Long): Double =
    math.round((System.nanoTime() - t) / 1e6) / 1e3
}

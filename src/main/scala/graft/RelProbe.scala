package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 1×/10×/30× scale probe for the relational capstones
  * (`q_retention_cohorts`, `q_event_funnel`, `q_correlated_agg`) —
  * the measured backing for their 100× claims, the [[ScaleProbe]] /
  * [[CdcProbe]] discipline applied to the fact tables those queries
  * read (events, lineitem ⋈ part).
  *
  * The synthetic fixture is `factor` KEY-SALTED copies of the sf0.1
  * source, designed so the measurement is interpretable:
  *
  *   - events copy `c` offsets `user_id` (and `event_id`) by
  *     `c × (max + 1)` with timestamps untouched — per-user event
  *     structure (first event, activity weeks, funnel order) is
  *     preserved EXACTLY while the user population scales linearly,
  *     so retention's per-user aggregate and the funnel's per-user
  *     minima grow linearly with NO new hot keys and NO cross-copy
  *     group merging; the cohort×offset cell COUNT is factor-
  *     invariant (same weeks), only the counts inside cells scale.
  *   - lineitem/part copy `c` offsets `l_partkey`/`p_partkey` (and
  *     `l_orderkey`) the same way — per-part groups are exact copies,
  *     the per-partkey aggregate and its join scale linearly, and
  *     p_brand is untouched so the output stays 25 rows.
  *
  * Each query is driven cold with a noop write ([[Bench]]'s
  * discipline — `.count()` would let Catalyst eliminate the very
  * subtrees being measured), isolated between steps, one JVM for the
  * whole factor ladder. Row contracts run AFTER the timings. Emits
  * one JSON line per factor; the numbers land in BASELINE.md's probe
  * section. Run:
  * `sbt "runMain graft.RelProbe /root/testdata/sf0.1 1,10,30"`.
  */
object RelProbe {

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,10,30").split(",").map(_.trim.toInt)
    val outRoot = args.lift(2).getOrElse("/tmp/graft-rel-probe")
    val spark = Sessions.builder("graft-rel-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen startup so factor 1 isn't inflated
    spark.range(1000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    factors.foreach(f => runOne(spark, srcDir, s"$outRoot/f$f", f))
    spark.stop()
  }

  private def runOne(
      spark: SparkSession, srcDir: String, dir: String, factor: Int): Unit = {
    def drive(name: String): Double = {
      Sessions.isolateQueries(spark)
      val t = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      secsSince(t)
    }
    val t0 = System.nanoTime()
    val (nEvents, nLineitem) = buildFixture(spark, srcDir, dir, factor)
    val tFixture = secsSince(t0)

    val tRetention = drive("q_retention_cohorts")
    val tFunnel = drive("q_event_funnel")
    val tCorrAgg = drive("q_correlated_agg")

    // row contracts AFTER the timings: retention's cell count is
    // factor-invariant (same weeks), the funnel is always 3 stages,
    // Q17's brand list is factor-invariant (p_brand untouched)
    val nRetCells = SparkEntry.queries("q_retention_cohorts")(spark, dir).count()
    val nFunnel = SparkEntry.queries("q_event_funnel")(spark, dir).count()
    val nBrands = SparkEntry.queries("q_correlated_agg")(spark, dir).count()
    require(nFunnel == 3L, s"funnel must be 3 stages, got $nFunnel")
    require(nBrands >= 1L, s"Q17 must price out at least one brand")

    println(
      s"""{"probe":"relational","factor":$factor,"events":$nEvents,""" +
      s""""lineitem":$nLineitem,"fixture_sec":$tFixture,""" +
      s""""retention_sec":$tRetention,"retention_cells":$nRetCells,""" +
      s""""funnel_sec":$tFunnel,"corr_agg_sec":$tCorrAgg,""" +
      s""""corr_agg_brands":$nBrands}""")
  }

  private[graft] def buildFixture(
      spark: SparkSession, srcDir: String, dir: String,
      factor: Int): (Long, Long) = {
    queries.Pipeline.deleteTree(java.nio.file.Paths.get(dir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // events through Tables so the ts unit convention (ns vs µs
    // footers) is normalized once here, not per measured run
    val ev = Tables(spark, srcDir, "events")
    val userBase = ev.agg(max(col("user_id"))).head.getLong(0) + 1L
    val eventBase = ev.agg(max(col("event_id"))).head.getLong(0) + 1L
    (0 until factor).map { c =>
      ev.select(
        (col("event_id") + lit(c * eventBase)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(c * userBase)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    val pt = spark.read.parquet(s"$srcDir/part.parquet")
    val partBase = pt.agg(max(col("p_partkey"))).head.getLong(0) + 1L
    val orderBase = li.agg(max(col("l_orderkey"))).head.getLong(0) + 1L
    (0 until factor).map { c =>
      li.withColumn("l_partkey", col("l_partkey") + lit(c * partBase))
        .withColumn("l_orderkey", col("l_orderkey") + lit(c * orderBase))
    }.reduce(_ unionByName _)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (0 until factor).map { c =>
      pt.withColumn("p_partkey", col("p_partkey") + lit(c * partBase))
    }.reduce(_ unionByName _)
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")

    (spark.read.parquet(s"$dir/events.parquet").count(),
      spark.read.parquet(s"$dir/lineitem.parquet").count())
  }

  private def secsSince(t: Long): Double =
    math.round((System.nanoTime() - t) / 1e6) / 1e3
}

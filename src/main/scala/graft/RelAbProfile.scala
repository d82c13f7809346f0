package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-JVM A/B for the round-17 relational rewrites — the accepted
  * protocol for a rewrite's performance claim (cross-run drift on
  * this box exceeds typical effect sizes, so old and new arms run
  * INTERLEAVED in one session, the [[EdgeProfile]] /
  * [[HashKeyProfile]] pattern): over the [[RelProbe]] factor-30
  * fixture (3M events, 18M lineitem),
  *
  *   - `retention_old` — the replaced two-pass form (first-event
  *     aggregate + (user, week) DISTINCT + join back + COUNT
  *     DISTINCT), kept verbatim here as the A arm;
  *     `retention_new` — the shipped single-scan
  *     `min(ts)`+`collect_set(week)` explode form.
  *   - `corr_old` — the correlated-subquery Q17 form
  *     ([[queries.Relational.correlatedAggSubqueryForm]], three
  *     lineitem scans after decorrelation); `corr_new` — the shipped
  *     explicit single per-partkey aggregate (two scans).
  *
  * Arms are interleaved A,B,A,B per rep, noop-write-driven, isolated
  * between drives. Emits one JSON line with all readings. Run:
  * `sbt "runMain graft.RelAbProfile /root/testdata/sf0.1 30 3"`.
  */
object RelAbProfile {

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).getOrElse("30").toInt
    val reps = args.lift(2).getOrElse("3").toInt
    val dir = s"/tmp/graft-rel-ab/f$factor"
    val spark = Sessions.builder("graft-rel-ab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    RelProbe.buildFixture(spark, srcDir, dir, factor)

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "retention_old" -> (() => retentionTwoPass(spark, dir)),
      "retention_new" -> (() => SparkEntry.queries("q_retention_cohorts")(spark, dir)),
      "corr_old" -> (() => queries.Relational.correlatedAggSubqueryForm(spark, dir)),
      "corr_new" -> (() => SparkEntry.queries("q_correlated_agg")(spark, dir)))

    val readings = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; (name, fn) <- arms) {
      Sessions.isolateQueries(spark)
      val t = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      readings(name) = readings(name) :+
        (math.round((System.nanoTime() - t) / 1e6) / 1e3)
    }
    // correctness cross-check AFTER the timings: old ≡ new on the
    // probe fixture, so the A/B compares equal work
    val rOld = retentionTwoPass(spark, dir).collect().map(_.toString).sorted
    val rNew = SparkEntry.queries("q_retention_cohorts")(spark, dir)
      .collect().map(_.toString).sorted
    require(rOld.sameElements(rNew), "retention old ≠ new on the fixture")
    val cOld = queries.Relational.correlatedAggSubqueryForm(spark, dir)
      .collect().map(_.toString).sorted
    val cNew = SparkEntry.queries("q_correlated_agg")(spark, dir)
      .collect().map(_.toString).sorted
    require(cOld.sameElements(cNew), "corr-agg old ≠ new on the fixture")

    val body = arms.map { case (name, _) =>
      s""""$name":[${readings(name).mkString(",")}]""" }.mkString(",")
    println(s"""{"probe":"rel_ab","factor":$factor,"reps":$reps,$body}""")
    spark.stop()
  }

  /** The replaced two-pass retention form, verbatim — the A arm. */
  private def retentionTwoPass(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(s, dir, "events")
    val firsts = ev.groupBy($"user_id")
      .agg(date_trunc("week", min($"ts")).as("cohort_week"))
    val active = ev
      .select($"user_id", date_trunc("week", $"ts").as("week"))
      .distinct()
    active.join(firsts, Seq("user_id"))
      .groupBy($"cohort_week",
        expr("datediff(week, cohort_week) div 7").cast("long").as("week_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
      .withColumn("cohort_size",
        max(when($"week_offset" === 0, $"n_users"))
          .over(Window.partitionBy($"cohort_week")))
      .select($"cohort_week", $"week_offset", $"n_users",
        expr("(n_users * 1000000) div cohort_size").as("retained_ppm"))
      .orderBy($"cohort_week", $"week_offset")
  }
}

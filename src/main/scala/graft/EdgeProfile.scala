package graft

import org.apache.spark.sql.SparkSession

/** Stage-level profile of the edge-graph build — the instrument the
  * 30× scale probe's headline number (edge_sec, the dominant scale
  * line) gets decomposed with before anything is "optimized": each
  * internal stage of the two lexical pair families and the semantic
  * family is driven to completion with a noop write, upstream to
  * downstream, so stage k's marginal cost is its time minus its
  * prefix's. Same fixture, isolation, and drive discipline as
  * [[ScaleProbe]]. Run:
  * `sbt "runMain graft.EdgeProfile /root/testdata/sf0.1 30"`.
  */
object EdgeProfile {

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("30").split(",").map(_.trim.toInt)
    val outRoot = args.lift(2).getOrElse("/tmp/graft-edge-profile")
    val spark = Sessions.builder("graft-edge-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    factors.foreach(f => runOne(spark, srcDir, s"$outRoot/f$f", f))
    spark.stop()
  }

  private def runOne(
      spark: SparkSession, srcDir: String, dir: String, factor: Int): Unit = {
    val nDocs = ScaleProbe.buildFixture(spark, srcDir, dir, factor)
    // the COLD build first — the position ScaleProbe measures it in
    // (stage warm-up below would otherwise flatter it by the warmed
    // codegen/JIT paths; the cold/warm gap is itself a finding)
    Sessions.isolateQueries(spark)
    val tc = System.nanoTime()
    val coldPath = queries.Pipeline.ensureEdgeGraph(spark, dir)
    val tEdgeCold = secs(tc)
    println(s"""{"probe":"edge-cold","factor":$factor,"cold_sec":$tEdgeCold}""")
    val stages = queries.Pipeline.edgeStageFrames(spark, dir)
    val timed = stages.map { case (name, df) =>
      Sessions.isolateQueries(spark)
      val t = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      name -> secs(t)
    }
    // the same full artifact build WARM (artifact deleted so the
    // stamp re-builds): the cold−warm gap is first-execution overhead
    // (JIT + whole-stage-codegen compilation), not data-scale work
    queries.Pipeline.deleteTree(coldPath)
    Sessions.isolateQueries(spark)
    val t = System.nanoTime()
    queries.Pipeline.ensureEdgeGraph(spark, dir)
    val tEdge = secs(t)
    val stageJson = timed
      .map { case (n, s) => "\"" + n + "\":" + s }.mkString(",")
    println(
      s"""{"probe":"edge-profile","factor":$factor,"docs":$nDocs,""" +
      stageJson + s""","edge_cold_sec":$tEdgeCold,"edge_total_sec":$tEdge}""")
  }

  private def secs(t: Long): Double =
    math.round((System.nanoTime() - t) / 1e6) / 1e3
}

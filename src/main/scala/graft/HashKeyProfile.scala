package graft

/** One-JVM A/B of the hashed join keys in `x_contamination` /
  * `x_shingle_novelty`: each operator against its pre-rewrite
  * string-keyed control ([[graft.queries.Pipeline.hashKeyAbFrames]]),
  * driven to completion with a noop write at a scale factor — the
  * [[EdgeProfile]] drive discipline (same fixture builder, same
  * isolation). Arms interleave and report min-of-2 so a slow-drift
  * stall hits both sides before it biases the ratio. Run:
  * `sbt "runMain graft.HashKeyProfile /root/testdata/sf0.1 30"`.
  */
object HashKeyProfile {

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("30").split(",").map(_.trim.toInt)
    val outRoot = args.lift(2).getOrElse("/tmp/graft-hashkey-profile")
    val spark = Sessions.builder("graft-hashkey-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    factors.foreach { f =>
      val dir = s"$outRoot/f$f"
      val nDocs = ScaleProbe.buildFixture(spark, srcDir, dir, f)
      val timed = (1 to 2).flatMap { _ =>
        queries.Pipeline.hashKeyAbFrames(spark, dir).map { case (name, df) =>
          Sessions.isolateQueries(spark)
          val t = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          name -> math.round((System.nanoTime() - t) / 1e6) / 1e3
        }
      }
      val best = timed.groupBy(_._1).view.mapValues(_.map(_._2).min)
      val json = best.toSeq.sortBy(_._1)
        .map { case (n, s) => "\"" + n + "\":" + s }.mkString(",")
      println(s"""{"probe":"hashkey-ab","factor":$f,"docs":$nDocs,$json}""")
    }
    spark.stop()
  }
}

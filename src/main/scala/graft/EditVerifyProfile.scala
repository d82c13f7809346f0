package graft

/** One-JVM A/B of `x_edit_verify`'s Levenshtein kernel — the
  * measurement the banded-kernel adoption (round 14) owed: the shipped
  * 3-arg thresholded `levenshtein(ta, tb, cap)` (banded, O(cap·len)
  * cells per pair) against the full O(len²) lattice with the same
  * `least(dist, cap + 1)` output cap applied post-hoc. Both arms share
  * the candidate machinery and the verify projection
  * ([[queries.Pipeline.editVerifyKernel]]), produce identical rows,
  * and run INTERLEAVED in one JVM ([[EdgeProfile]] discipline — this
  * box's cross-run drift exceeds typical effect sizes), so the per-arm
  * minima are comparable. Run:
  * `sbt "runMain graft.EditVerifyProfile /root/testdata/sf0.1 30 3"`.
  */
object EditVerifyProfile {

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).getOrElse("30").toInt
    val rounds = args.lift(2).getOrElse("3").toInt
    val dir = args.lift(3).getOrElse("/tmp/graft-editverify-profile")
    val spark = Sessions.builder("graft-editverify-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    val nDocs = ScaleProbe.buildFixture(spark, srcDir, dir, factor)
    // one untimed warm-up of each arm: both kernels' codegen + JIT
    // compile outside the measured window (the cold/warm gap is
    // first-execution overhead, not kernel work)
    Seq(true, false).foreach { banded =>
      Sessions.isolateQueries(spark)
      queries.Pipeline.editVerifyKernel(spark, dir, banded)
        .write.format("noop").mode("overwrite").save()
    }
    val times = (1 to rounds).flatMap { r =>
      // alternate arm order per round so slow-drift (GC pressure,
      // thermal) cannot systematically favor one arm
      val arms = if (r % 2 == 1) Seq(true, false) else Seq(false, true)
      arms.map { banded =>
        Sessions.isolateQueries(spark)
        val t = System.nanoTime()
        queries.Pipeline.editVerifyKernel(spark, dir, banded)
          .write.format("noop").mode("overwrite").save()
        val sec = math.round((System.nanoTime() - t) / 1e6) / 1e3
        val name = if (banded) "banded" else "full"
        println(s"""{"probe":"edit-verify","arm":"$name","round":$r,"sec":$sec}""")
        name -> sec
      }
    }
    val byArm = times.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    println(
      s"""{"probe":"edit-verify-summary","factor":$factor,"docs":$nDocs,""" +
      s""""banded_min_sec":${byArm("banded")},"full_min_sec":${byArm("full")},""" +
      s""""speedup":${math.round(byArm("full") / byArm("banded") * 100) / 100.0}}""")
    spark.stop()
  }
}

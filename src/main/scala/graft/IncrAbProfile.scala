package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame

/** Per-JOB attribution profiler for the incremental-delta consumers
  * (`x_incr_clusters` / `x_incr_split_leakage`) — the r21 "Not yet
  * optimized" item: before touching the delta internals, measure
  * which phase owns the seconds. The delta's phases are eager
  * localCheckpoint jobs (demoted → jacTouch → fused plus/minus), the
  * label loop is checkpoint+count jobs per round, and the final
  * assembly is the noop write — so a job-end listener over ONE real
  * run of the declared query yields the attribution table without
  * touching the code under measurement.
  *
  * Emits one JSON line per drive: ordered [sec, stages, tasks] per
  * job plus the wall total. Interleaves the two queries rep times
  * (isolated between drives). Run:
  * `sbt "runMain graft.IncrAbProfile /root/testdata/sf0.1 2"`
  */
object IncrAbProfile {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).getOrElse("2").toInt
    val spark = Sessions.builder("graft-incr-ab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()

    val jobStart = TrieMap.empty[Int, Long]
    val jobSec = TrieMap.empty[Int, Double]
    val jobStages = TrieMap.empty[Int, Int]
    val jobTasks = TrieMap.empty[Int, Long]
    val stageJob = TrieMap.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobStart(j.jobId) = j.time
        j.stageIds.foreach(sid => stageJob(sid) = j.jobId)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobStart.get(j.jobId).foreach(t0 =>
          jobSec(j.jobId) = (j.time - t0) / 1e3)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stageJob.get(sc.stageInfo.stageId).foreach { jid =>
          jobStages(jid) = jobStages.getOrElse(jid, 0) + 1
          jobTasks(jid) = jobTasks.getOrElse(jid, 0L) +
            sc.stageInfo.numTasks.toLong
        }
    })

    val names = args.lift(2)
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("x_incr_clusters", "x_incr_split_leakage"))
    val arms: Seq[(String, () => DataFrame)] = names.map(n =>
      n -> (() => SparkEntry.queries(n)(spark, dir)))
    for (r <- 1 to reps; (name, fn) <- arms) {
      Sessions.isolateQueries(spark)
      jobStart.clear(); jobSec.clear(); jobStages.clear(); jobTasks.clear()
      stageJob.clear()
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      val wall = math.round((System.nanoTime() - t0) / 1e6) / 1e3
      Thread.sleep(300)
      val jobs = jobSec.keys.toSeq.sorted.map { jid =>
        val sec = math.round(jobSec(jid) * 1000) / 1e3
        s"[$sec,${jobStages.getOrElse(jid, 0)},${jobTasks.getOrElse(jid, 0L)}]"
      }
      println(s"""{"probe":"incr_ab","arm":"$name","rep":$r,""" +
        s""""wall":$wall,"jobs":[${jobs.mkString(",")}]}""")
    }
    spark.stop()
  }
}

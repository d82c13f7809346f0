package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame

/** One-JVM A/B for the `x_index_health` report shape — the accepted
  * interleaved protocol ([[StripAbProfile]] / [[RelAbProfile]]
  * pattern), with a scheduler listener because the thing under test
  * is SCHEDULING EXPOSURE, not per-task compute: the r21 driver bench
  * read the legacy five-pipeline report at 6.49 s on 32 cores vs
  * 2.45 s on 8 — the many-tiny-stages anti-scaling signature — while
  * builder-quiet wall clock sat at 1.7-2.5 s in both shapes.
  *
  * Arms: `legacy` (five independent famRow pipelines — 10 keyed-frame
  * passes, ~55 exchanges) vs `fused` (one normalized union, one
  * per-key count, one broadcast-semi carrier pass). Interleaved
  * legacy,fused,legacy,fused per rep, noop-write-driven, isolated
  * between drives; per drive the listener records Spark jobs, stages
  * and launched tasks — the contention surface a busy driver context
  * multiplies. fused ≡ legacy correctness is asserted after the
  * timings. Emits one JSON line. Run:
  * `sbt "runMain graft.IndexHealthAbProfile /root/testdata/sf0.1 3"`
  */
object IndexHealthAbProfile {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).getOrElse("3").toInt
    val spark = Sessions.builder("graft-idxhealth-ab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks.toLong)
      }
    })

    import graft.queries.Pipeline
    // fused_pregroup: collapse the union to (key, doc, multiplicity)
    // rows FIRST, so BOTH the per-key count (sum of c) and the carrier
    // pass hang off one exchange and the sources are derived once —
    // at the price of shuffling the narrow posting rows once
    def preGrouped(): DataFrame = {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val mm = graft.multimodal.Multimodal
      val kd = Pipeline.indexHealthUnion(spark, dir)
        .groupBy($"family", $"k1", $"k2", $"doc")
        .agg(count(lit(1)).as("c"))
      val capOf = when($"family" === "band", lit(100L))
        .when($"family" === "cell", lit(1000L))
        .when($"family" === "shingle", lit(100L))
        .otherwise(lit(mm.FRAME_DF_CAP.toLong))
      val cnt = kd.groupBy($"family", $"k1", $"k2")
        .agg(sum($"c").as("m")).withColumn("cap", capOf)
      val stats = cnt.groupBy($"family").agg(
        count(lit(1)).as("n_keys"),
        max($"m").as("max_members"),
        sum(when($"m" > $"cap", 1L).otherwise(0L)).as("n_over_cap"))
      val over = cnt.filter($"m" > $"cap").select($"family", $"k1", $"k2")
      val carriers = kd
        .join(broadcast(over), Seq("family", "k1", "k2"), "left_semi")
        .groupBy($"family").agg(countDistinct($"doc").as("n_carrier_docs"))
      val spine = Seq("band", "cell", "frame", "prefix", "shingle").toDF("family")
      spine.join(broadcast(stats), Seq("family"), "left")
        .join(broadcast(carriers), Seq("family"), "left")
        .select($"family",
          coalesce($"n_keys", lit(0L)).as("n_keys"),
          coalesce($"max_members", lit(0L)).as("max_members"),
          coalesce($"n_over_cap", lit(0L)).as("n_over_cap"),
          coalesce($"n_carrier_docs", lit(0L)).as("n_carrier_docs"))
        .orderBy($"family")
    }
    val arms: Seq[(String, () => DataFrame)] = Seq(
      "legacy" -> (() => Pipeline.indexHealthLegacy(spark, dir)),
      "fused" -> (() => Pipeline.indexHealthFusedNoCkpt(spark, dir)),
      "fused_pregroup" -> (() => preGrouped()),
      "ckpt_prune" -> (() => Pipeline.indexHealth(spark, dir)))

    val secs = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val sched = scala.collection.mutable.Map.empty[String, List[(Int, Int, Long)]]
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; (name, fn) <- arms) {
      Sessions.isolateQueries(spark)
      jobs.set(0); stages.set(0); tasks.set(0L)
      val t = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      val sec = math.round((System.nanoTime() - t) / 1e6) / 1e3
      // listener events are async — give the bus a beat to drain
      // before reading the counters (listenerBus is spark-private)
      Thread.sleep(300)
      secs(name) = secs(name) :+ sec
      sched(name) = sched(name) :+ ((jobs.get(), stages.get(), tasks.get()))
    }
    val a = arms.toMap.apply("legacy")().collect().map(_.toString).sorted
    for (v <- Seq("fused", "fused_pregroup", "ckpt_prune")) {
      val b = arms.toMap.apply(v)().collect().map(_.toString).sorted
      require(a.sameElements(b), s"legacy ≠ $v: ${a.mkString} vs ${b.mkString}")
    }
    val body = arms.map { case (name, _) =>
      val sch = sched(name).map { case (j, st, tk) => s"[$j,$st,$tk]" }
      s""""$name":{"sec":[${secs(name).mkString(",")}],""" +
        s""""jobs_stages_tasks":[${sch.mkString(",")}]}"""
    }.mkString(",")
    println(s"""{"probe":"index_health_ab","reps":$reps,$body}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-JVM A/B for the `x_rep_strip` native kernel — the accepted
  * interleaved protocol ([[RelAbProfile]] / [[EdgeProfile]] pattern).
  *
  * Two findings live here, and the first is a measurement in itself:
  * the NAIVE composed form (every intermediate — spans, flagged
  * positions — inlined into one Column expression, the way the
  * lexical helpers like `shingleCol` are written) is not merely slow
  * but catastrophically non-linear, because Catalyst re-evaluates a
  * higher-order function's argument tree PER ELEMENT of the outer
  * function: the flagged-positions subtree re-derives the span array
  * per position and the coverage filter re-derives the flagged set
  * per TOKEN — O(spans⁴) interpreted evaluations per row. On real
  * ~54-token corpus docs a 50-DOC slice did not finish inside 9
  * minutes (attempts at salted factor 10 / factor 1 / a 50-doc slice
  * all had to be killed). The A arm here is therefore the FAIR
  * built-ins form a careful engineer would write: spans and flagged
  * positions STAGED as projection columns (CollapseProject keeps
  * non-cheap multi-referenced aliases as real projections, so each is
  * computed once per row, O(spans²) total) — against the kernel's
  * one-pass O(tokens·K) hash-map. Both arms run the SAME optional
  * doc_id slice; the transform is row-local with no shuffle, so the
  * per-row ratio is scale-free, and the kernel also reports its
  * full-corpus drive (the number the Bench ceiling gates).
  *
  * Arms interleaved A,B,A,B per rep, noop-write-driven, isolated
  * between drives; hof ≡ kernel correctness on the slice is asserted
  * after the timings. Emits one JSON line. Run:
  * `sbt "runMain graft.RepStripProfile /root/testdata/sf0.1 0 2"`
  * (slice 0 = full corpus for both arms).
  */
object RepStripProfile {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val capArg = args.lift(1).getOrElse("0").toLong
    val cap = if (capArg <= 0) None else Some(capArg)
    val reps = args.lift(2).getOrElse("2").toInt
    val spark = Sessions.builder("graft-repstrip-ab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "repstrip_hof_staged" -> (() => hofForm(spark, dir, cap)),
      "repstrip_kernel" -> (() => kernelForm(spark, dir, cap)),
      "repstrip_kernel_full" -> (() => kernelForm(spark, dir, None)))

    val readings = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; (name, fn) <- arms) {
      Sessions.isolateQueries(spark)
      val t = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      readings(name) = readings(name) :+
        (math.round((System.nanoTime() - t) / 1e6) / 1e3)
    }
    val a = hofForm(spark, dir, cap).collect().map(_.toString).sorted
    val b = kernelForm(spark, dir, cap).collect().map(_.toString).sorted
    require(a.sameElements(b), "hof ≠ kernel on the slice")

    val body = arms.map { case (name, _) =>
      s""""$name":[${readings(name).mkString(",")}]""" }.mkString(",")
    println(s"""{"probe":"repstrip_ab","slice_docs":${capArg},"reps":$reps,$body}""")
    spark.stop()
  }

  private def sliceOf(
      s: SparkSession, dir: String, cap: Option[Long]): DataFrame = {
    val docs = Tables(s, dir, "documents")
    cap.fold(docs)(c => docs.filter(col("doc_id") < c))
  }

  /** The shipped kernel plan over an optional slice. */
  private def kernelForm(
      s: SparkSession, dir: String, cap: Option[Long]): DataFrame = {
    import s.implicits._
    sliceOf(s, dir, cap)
      .select($"doc_id", $"text",
        functions.RepStripFunctions.repStrip(s, queries.Pipeline.words($"text"))
          .as("kept"))
      .select($"doc_id",
        when(size($"kept") === size(queries.Pipeline.words($"text")), $"text")
          .otherwise(concat_ws(" ", $"kept")).as("clean_text"),
        (size(queries.Pipeline.words($"text")) - size($"kept"))
          .cast("long").as("n_removed"))
      .orderBy($"doc_id")
  }

  /** The staged composed-builtins form — identical semantics to the
    * kernel, intermediates as projection columns so each is computed
    * once per row (the fair built-ins arm; see the object doc for why
    * the single-expression form is not even measurable).
    */
  private def hofForm(
      s: SparkSession, dir: String, cap: Option[Long]): DataFrame = {
    import s.implicits._
    val cover = (fl: Column, w: Column) =>
      filter(w, (t, j) => !exists(fl,
        x => j.cast("long") >= x && j.cast("long") <= x + 2L))
    sliceOf(s, dir, cap)
      .select($"doc_id", $"text", queries.Pipeline.words($"text").as("w"))
      .select($"doc_id", $"text", $"w",
        when(size($"w") >= 3,
          transform(sequence(lit(0), size($"w") - 3),
            i => concat_ws(" ", slice($"w", i + 1, lit(3)))))
          .otherwise(array().cast("array<string>")).as("sps"))
      .select($"doc_id", $"text", $"w",
        // guard: sequence(0, -1) on an empty span array would step
        // DOWN to -1 and element_at(sps, 0) throws
        when(size($"sps") > 0,
          filter(sequence(lit(0), size($"sps") - 1),
            i => exists(slice($"sps", lit(1), i),
              x => x === element_at($"sps", i + 1))))
          .otherwise(array().cast("array<int>")).as("fl"))
      .select($"doc_id",
        when(size($"fl") === 0, $"text")
          .otherwise(concat_ws(" ", cover($"fl", $"w"))).as("clean_text"),
        when(size($"fl") === 0, lit(0L))
          .otherwise(size($"w").cast("long") -
            size(cover($"fl", $"w")).cast("long")).as("n_removed"))
      .orderBy($"doc_id")
  }
}

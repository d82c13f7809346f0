package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-JVM A/B for the span-coverage strip projection staging
  * (`x_contam_strip` / `x_span_strip`) — the accepted interleaved
  * protocol ([[RepStripProfile]] / [[RelAbProfile]] pattern).
  *
  * What is measured: the round-18 `x_contam_strip` shipped the
  * coverage rewrite with the filter+exists lambda INLINED into both
  * output columns — `filter(words(text), …exists(fl)…)` evaluated
  * twice per flagged row and `words(text)` three times — the exact
  * pattern BASELINE.md's HOF house rule warns about, one complexity
  * notch down (linear per evaluation, not quadratic). The staged form
  * ([[graft.queries.Pipeline.stripCoverageProjection]]) computes the
  * kept-token array ONCE as a projection column (CollapseProject
  * keeps non-cheap multi-referenced aliases) and derives both
  * `clean_text` and `n_removed` from it; a `when(fl.isNotNull, …)`
  * guard skips the lambda entirely on the unflagged majority.
  *
  * Arms run the FULL query (flagged-base derivation + projection,
  * the shape the Bench ceiling gates) interleaved
  * inline,staged,inline,staged per rep per family, noop-write-driven,
  * isolated between drives; staged ≡ inline correctness is asserted
  * after the timings. Emits one JSON line. Run:
  * `sbt "runMain graft.StripAbProfile /root/testdata/sf0.1 2"`
  */
object StripAbProfile {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).getOrElse("2").toInt
    // optional third arg: dense-contamination share in [0,1] — plant a
    // per-doc benchmark 3-gram into that fraction of training docs and
    // run the CONTAM arms over the dirty corpus (the round-19 A/B
    // honestly recorded a wash because the real fixture's flagged set
    // is sparse; the shipped claim — inline cost scales with
    // contamination density, staged caps the lambda at 1× — needs the
    // dense arm to be evidence, not assertion)
    val dirtyShare = args.lift(2).map(_.toDouble)
    val spark = Sessions.builder("graft-strip-ab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()

    import graft.queries.Pipeline
    val contamDir = dirtyShare.map(buildDirty(spark, dir, _)).getOrElse(dir)
    if (dirtyShare.isDefined) {
      val base = Pipeline.contamFlaggedBase(spark, contamDir)
      val n = base.count()
      val fl = base.filter(col("fl").isNotNull).count()
      println(s"""{"probe":"strip_ab_fixture","share":${dirtyShare.get},""" +
        s""""docs":$n,"flagged":$fl}""")
    }
    val arms: Seq[(String, () => DataFrame)] = Seq(
      "contam_inline" -> (() =>
        inlineProjection(Pipeline.contamFlaggedBase(spark, contamDir), 3)),
      "contam_staged" -> (() =>
        Pipeline.stripCoverageProjection(Pipeline.contamFlaggedBase(spark, contamDir), 3)),
      "span_inline" -> (() =>
        inlineProjection(Pipeline.spanFlaggedBase(spark, dir), 5)),
      "span_staged" -> (() =>
        Pipeline.stripCoverageProjection(Pipeline.spanFlaggedBase(spark, dir), 5)))

    val readings = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; (name, fn) <- arms) {
      Sessions.isolateQueries(spark)
      val t = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      readings(name) = readings(name) :+
        (math.round((System.nanoTime() - t) / 1e6) / 1e3)
    }
    for ((inl, stg) <- Seq("contam_inline" -> "contam_staged",
        "span_inline" -> "span_staged")) {
      val a = arms.toMap.apply(inl)().collect().map(_.toString).sorted
      val b = arms.toMap.apply(stg)().collect().map(_.toString).sorted
      require(a.sameElements(b), s"$inl ≠ $stg")
    }
    val body = arms.map { case (name, _) =>
      s""""$name":[${readings(name).mkString(",")}]""" }.mkString(",")
    println(s"""{"probe":"strip_ab","reps":$reps,$body}""")
    spark.stop()
  }

  /** Dense-contamination fixture: copy the corpus with a PER-DOC
    * benchmark 3-gram — the nearest benchmark doc's trigram at a
    * doc-keyed offset, so plants are (mostly) per-doc-distinct and
    * stay under SHINGLE_DF_CAP where one shared shingle would be
    * boilerplate-dropped — appended [[PLANT_REPEATS]] times to
    * `share` of the training docs. The sf0.1 corpus's FLAGGED-DOC
    * share is already ~98% natural (the fixture line reports it), so
    * the density lever the inline-vs-staged claim turns on is flagged
    * SPANS PER DOC (the coverage lambda is O(tokens × |fl|) per
    * evaluation), which the repeats raise directly. Measurement
    * artifact, not production code.
    */
  private val PLANT_REPEATS = 20

  private def buildDirty(spark: SparkSession, dir: String,
      share: Double): String = {
    val out = java.nio.file.Files.createTempDirectory("graft-dirty-corpus-")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bench3 = docs.filter(col("doc_id") % 50 === 0)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(expr("doc_id div 50").as("bkey"),
        expr("transform(sequence(0, size(split(text, ' ')) - 3), " +
          "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))")
          .as("tris"))
    val pct = math.round(share * 100).toInt
    docs.withColumn("bkey", expr("doc_id div 50"))
      .join(broadcast(bench3), Seq("bkey"), "left")
      .withColumn("plant", expr(
        "tris[CAST(pmod(xxhash64(CAST(doc_id AS STRING)), size(tris)) AS INT)]"))
      .withColumn("text",
        when(col("doc_id") % 50 =!= 0 &&
            pmod(xxhash64(col("doc_id")), lit(100)) < pct &&
            col("plant").isNotNull,
          concat(col("text"), lit(" "),
            expr(s"array_join(array_repeat(plant, $PLANT_REPEATS), ' ')")))
          .otherwise(col("text")))
      .drop("bkey", "tris", "plant")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    out.toString
  }

  /** The round-18 inline double-evaluation projection, kept here as
    * the A arm (measurement artifact, not production code).
    */
  private def inlineProjection(base: DataFrame, spanLen: Int): DataFrame = {
    val cover = spanLen - 1L
    def w(c: Column): Column = split(c, " ")
    def keptOf: Column = filter(w(col("text")),
      (t, j) => !exists(col("fl"), x => j.cast("long") >= x &&
        j.cast("long") <= x + cover))
    base.select(col("doc_id"),
      when(col("fl").isNull, col("text")).otherwise(
        concat_ws(" ", keptOf)).as("clean_text"),
      when(col("fl").isNull, lit(0L)).otherwise(
        size(w(col("text"))).cast("long") -
          size(keptOf).cast("long")).as("n_removed"))
  }
}

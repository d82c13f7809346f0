package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-JVM A/B for the export-base materialization
  * (`x_corpus_export`'s packed stream) — the accepted interleaved
  * protocol ([[RepStripProfile]]/[[StripAbProfile]] pattern).
  *
  * What is measured: the round-19 `exportPacked` first shipped with
  * the kept base UNmaterialized — the returned plan reads that base
  * in three branches (the prefix tree reads its input twice, the
  * text join once) and the manifest decision under it is itself a
  * multi-scan subtree, so the materialized plan carried 24 parquet
  * scans, 20 of them reading the corpus text column. The staged form
  * localCheckpoints the kept base once (one manifest pass + one text
  * pass), leaving every downstream branch a narrow read of
  * executor-stored rows. Arms time CONSTRUCTION + one noop-write
  * drive of the packed stream (for the staged arm that includes the
  * eager checkpoint — the honest total), interleaved
  * inline,staged,… per rep; inline ≡ staged row equality asserted
  * after the timings. Emits one JSON line. Run:
  * `sbt "runMain graft.ExportAbProfile /root/testdata/sf0.1 3"`
  */
object ExportAbProfile {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).getOrElse("3").toInt
    val spark = Sessions.builder("graft-export-ab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    // artifact setup outside every timing (the Bench/ShardProbe
    // amortization contract for the manifest's keep-map)
    graft.queries.Pipeline.ensureEdgeGraph(spark, dir)
    graft.queries.Pipeline.ensureSymEdges(spark, dir)
    graft.queries.Pipeline.ensureKeepMap(spark, dir)

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "export_inline" -> (() => inlineForm(spark, dir)),
      "export_staged" -> (() => graft.queries.Pipeline.exportPacked(spark, dir)))

    val readings = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; (name, fn) <- arms) {
      Sessions.isolateQueries(spark)
      val t = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      readings(name) = readings(name) :+
        (math.round((System.nanoTime() - t) / 1e6) / 1e3)
    }
    Sessions.isolateQueries(spark)
    val a = inlineForm(spark, dir).collect().map(_.toString).sorted
    val b = graft.queries.Pipeline.exportPacked(spark, dir)
      .collect().map(_.toString).sorted
    require(a.sameElements(b), "inline ≠ staged")

    val body = arms.map { case (name, _) =>
      s""""$name":[${readings(name).mkString(",")}]""" }.mkString(",")
    println(s"""{"probe":"export_ab","reps":$reps,$body}""")
    spark.stop()
  }

  /** The round-19 initial unmaterialized form, kept here as the A arm
    * (measurement artifact, not production code).
    */
  private def inlineForm(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.Pipeline
    val kept = Pipeline.manifestKeptIds(s, dir)
    val docs = Tables(s, dir, "documents").join(kept, Seq("doc_id"), "left_semi")
    val toks = docs.select(col("doc_id"),
      Pipeline.exportShuffleKey(col("doc_id")).as("shuffle_key"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val assign = Pipeline.exportPrefixSum(toks)
    docs.select(col("doc_id"), col("text")).join(assign, Seq("doc_id"))
      .select(col("doc_id"),
        Pipeline.exportShuffleKey(col("doc_id")).as("shuffle_key"),
        col("n_tokens"), col("cum_before"), col("shard_id"), col("text"))
  }
}

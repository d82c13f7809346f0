package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The capstone composition the individual operators exist for:
  * corpus → keep/drop manifest → curated corpus → token-budget shard
  * packing, with the fill audit agreeing with the plan. Each stage is
  * oracle-gated on its own (driver Verify); this proves they COMPOSE —
  * the manifest's kept set is exactly what packing consumes, the way a
  * production curation pipeline chains them.
  */
class CurationPipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // quality tokens with a periodic stopword: clears QUALITY_MIN
  // comfortably; per-salt vocabulary, length, AND stopword density all
  // differ, so the three kept docs are genuinely distinct documents —
  // not template variants a near-dup operator should link
  private def goodText(salt: Int): String = {
    val n = 60 + salt * 13
    val period = 3 + salt
    (0 until n).map(i =>
      if (i % period == 0) "the" else s"w$salt-$i-${(i * 7 + salt * 31) % 97}").mkString(" ")
  }

  // NOTE this corpus ships NO embeddings table, so it also pins the
  // v3 edge graph's lexical-only degradation path end-to-end
  test("manifest → curated corpus → shard plan compose; audit agrees with plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("curation-").toString
    val docs: Seq[(Long, String)] = Seq(
      0L -> goodText(0),
      1L -> goodText(1),
      2L -> goodText(0), // exact dup of 0 → dropped as duplicate
      3L -> "xx yy", // low quality → dropped
      4L -> goodText(2),
      5L -> goodText(1)) // exact dup of 1 → dropped as duplicate
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'synthetic' AS source",
        "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val manifest = Pipeline.corpusManifest(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(manifest(2L) === "duplicate")
    assert(manifest(5L) === "duplicate")
    assert(manifest(3L) === "low_quality")
    val keptIds = manifest.collect { case (id, "kept") => id }.toSet
    assert(keptIds === Set(0L, 1L, 4L))

    // materialize the curated corpus — the artifact boundary a real
    // pipeline writes between curation and sequence construction
    val curated = Files.createTempDirectory("curation-kept-").toString
    val keptDf = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id".isInCollection(keptIds))
    keptDf.coalesce(1).write.mode("overwrite")
      .parquet(s"$curated/documents.parquet")

    val plan = Pipeline.shardPlan(spark, curated)
      .select("doc_id", "n_tokens", "cum_before", "shard_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // exactly the kept docs, each packed once, in doc_id order
    assert(plan.map(_._1).toSeq === keptIds.toSeq.sorted)
    var acc = 0L
    plan.foreach { case (_, n, cum, shard) =>
      assert(cum === acc) // the running total IS the pack position
      assert(shard === cum / 4096L)
      acc += n
    }

    // the fill audit must agree with the plan it audits (non-empty
    // shards match exactly; any empty-shard rows carry explicit zeros)
    val stats = Pipeline.shardStats(spark, curated)
      .select("shard_id", "n_docs", "n_tokens")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val fromPlan = plan.groupBy(_._4).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    assert(stats.filter(_._2 > 0).map(s => s._1 -> ((s._2, s._3))).toMap === fromPlan)
    assert(stats.map(_._3).sum === plan.map(_._2).sum)
  }

  test("semantic stage composes: an embedding twin flips a kept doc to duplicate") {
    import spark.implicits._
    // the SAME corpus as the lexical test, PLUS row-aligned embeddings
    // where doc 4 is doc 0's semantic twin — the paraphrase case
    // (different tokens, same meaning) only the v3 embedding edges can
    // catch. Without the semantic stage doc 4 was kept (the lexical
    // test above asserts exactly that); with it, the manifest must
    // fold 4 into 0's cluster and the curated corpus shrinks by one.
    val dir = Files.createTempDirectory("curation-sem-").toString
    val docs: Seq[(Long, String)] = Seq(
      0L -> goodText(0),
      1L -> goodText(1),
      2L -> goodText(0), // exact dup of 0
      3L -> "xx yy", // low quality
      4L -> goodText(2), // lexically distinct — semantically identical to 0
      5L -> goodText(1)) // exact dup of 1
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'synthetic' AS source",
        "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def unit(axis: Int): Array[Float] =
      (0 until 64).map(i => if (i == axis) 1.0f else 0.0f).toArray
    // exact copies share their original's embedding (realistic: the
    // embedder is deterministic), doc 4 carries doc 0's meaning
    Seq((0L, unit(0), 0), (1L, unit(1), 0), (2L, unit(0), 0),
      (3L, unit(2), 0), (4L, unit(0), 0), (5L, unit(1), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val manifest = Pipeline.corpusManifest(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(manifest(4L) === "duplicate", "semantic twin must be dropped")
    assert(manifest.collect { case (id, "kept") => id }.toSet === Set(0L, 1L))
    // and the capstone keep decision points the twin at its survivor
    val full = Pipeline.dedupFull(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full(4L) === 0L)
  }
}

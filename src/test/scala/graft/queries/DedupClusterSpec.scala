package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Duplicate-cluster resolution: min-label connected components over
  * the near-dup pair graph, the step a dedup pipeline runs after pair
  * generation (keep `cluster_id`, drop the other members).
  */
class DedupClusterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("connectedComponents: chain + disjoint pair resolve to min labels") {
    import spark.implicits._
    // 1-2-3-4 chain (diameter 3 → several propagation rounds) plus an
    // unrelated pair; labels must converge to the component minimum
    val edges = Seq((2L, 3L), (1L, 2L), (3L, 4L), (10L, 11L)).toDF("a_id", "b_id")
    val got = Pipeline.connectedComponents(edges)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("connectedComponents: 400-node chain converges under the round cap") {
    import spark.implicits._
    // worst-case topology for plain label propagation (diameter 399
    // would blow the 50-round cap); pointer jumping must close it in
    // O(log n) rounds — non-convergence throws, so passing IS the
    // round-count assertion
    val edges = (0L until 399L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val labels = Pipeline.connectedComponents(edges).collect()
    assert(labels.length == 400)
    assert(labels.forall(_.getLong(1) == 0L))
  }

  test("dedupClusters: near-dup texts cluster under the smallest doc_id") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog today"
    val b = "the quick brown fox jumps over the lazy dog tonight"
    val dir = Files.createTempDirectory("dedup-cluster-").toString
    Seq((1L, a), (2L, b), (3L, "completely different text here now"),
      (4L, "unrelated words make another document entirely"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'synthetic' AS source",
        "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pipeline.dedupClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // docs 1 and 2 share 7 of 9 shingles → one cluster rooted at 1;
    // docs 3 and 4 have no near-dup edge → absent from the output
    assert(got === Seq((1L, 1L), (2L, 1L)))
  }
}

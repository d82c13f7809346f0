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

  test("dedupFull: keep_id is final even when a case-variant twin carries the near-dup edge") {
    import spark.implicits._
    // doc 2 is an exact twin of doc 1 under lower/trim but shares NO
    // raw-text shingles with it; doc 2 (not doc 1) near-dups doc 3.
    // A naive rep∘cluster composition would emit doc 3 → keep 2 while
    // doc 2 itself folds to 1 — keep_id pointing at a dropped doc.
    // The single-graph fixpoint must put all three in one component.
    val a = "Alpha Beta Gamma Delta Epsilon Zeta Eta Theta Iota Kappa"
    val dir = Files.createTempDirectory("dedup-full-").toString
    Seq((1L, a), (2L, a.toLowerCase), (3L, a.toLowerCase + " extra"),
      (4L, "wholly unrelated text with nothing shared here"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'synthetic' AS source",
        "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pipeline.dedupFull(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got === Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true)))
    // the invariant the composition bug violated: every keep_id points
    // at a row that is itself kept
    val kept = got.filter(_._3).map(_._1).toSet
    assert(got.forall(r => kept.contains(r._2)))
  }

  test("ensureEdgeGraph: built once, reused verbatim by later dedup queries") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog today"
    val b = "the quick brown fox jumps over the lazy dog tonight"
    val dir = Files.createTempDirectory("edge-cache-").toString
    Seq((1L, a), (2L, b), (3L, "completely different text here now"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'synthetic' AS source",
        "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val p1 = Pipeline.ensureEdgeGraph(spark, dir)
    val stamp = Files.getLastModifiedTime(p1.resolve("_SUCCESS"))
    // both graph consumers must reuse the artifact, not rebuild it
    Pipeline.dedupClusters(spark, dir).collect()
    Pipeline.dedupFull(spark, dir).collect()
    val p2 = Pipeline.ensureEdgeGraph(spark, dir)
    assert(p1 === p2)
    assert(Files.getLastModifiedTime(p2.resolve("_SUCCESS")) === stamp)
  }

  test("dedupFull: NULL-text documents share one exact-dup group (null-safe edge join)") {
    import spark.implicits._
    // the hash of NULL text is NULL; the groupBy-min and the oracle's
    // window both put every NULL in ONE group, so the edge join must
    // be null-safe — a plain inner join would silently keep both
    val dir = Files.createTempDirectory("dedup-null-").toString
    Seq((1L, "some perfectly ordinary document text right here"),
      (5L, null.asInstanceOf[String]), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'synthetic' AS source",
        "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pipeline.dedupFull(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got === Seq((1L, 1L, true), (5L, 5L, true), (6L, 5L, false)))
  }

  test("ensureEdgeGraph: a partial artifact (no _SUCCESS) is rebuilt, not poisoned") {
    import spark.implicits._
    val dir = Files.createTempDirectory("edge-partial-").toString
    Seq((1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'synthetic' AS source",
        "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val p1 = Pipeline.ensureEdgeGraph(spark, dir)
    // simulate a run killed mid-build: the dir remains, _SUCCESS gone —
    // the next ensure must clear and rebuild (the stage-and-rename
    // would otherwise fail on the existing dir forever)
    Files.delete(p1.resolve("_SUCCESS"))
    val p2 = Pipeline.ensureEdgeGraph(spark, dir)
    assert(p1 === p2)
    assert(Files.exists(p2.resolve("_SUCCESS")))
    // and no staging leftovers accumulate next to the artifact
    import scala.jdk.CollectionConverters._
    val siblings = Files.list(p2.getParent).iterator.asScala
      .map(_.getFileName.toString).toSeq
    assert(!siblings.exists(_.contains(".tmp-")), siblings.toString)
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

  // third-engine split oracle: the same md5-of-decimal-doc_id rule,
  // computed with java.security directly — independent of both
  // Spark's and DuckDB's expression stacks
  private def bucket(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    ((((d(0) & 0xff) << 8) | (d(1) & 0xff)) % 10).toLong
  }
  private def splitName(b: Long): String =
    if (b <= 7) "train" else if (b == 8) "val" else "test"

  // derive the fixture FROM the hash: pick ids so every category
  // exists by construction — a (train,val) and a (train,test) pair
  // (each leaks exactly its eval member), a (val,test) pair
  // (clustered but train-free: must NOT leak), plus one unclustered
  // singleton per split (a singleton cannot leak whatever its split)
  private def splitFixture(): (Seq[(Long, String)], Seq[(Long, Long)], Seq[Long]) = {
    val used = scala.collection.mutable.Set.empty[Long]
    def pick(b: Long): Long = {
      val id = (1L to 2000L).find(i => !used(i) && bucket(i) == b).get
      used += id; id
    }
    val pairs = Seq(pick(0L) -> pick(8L), pick(1L) -> pick(9L),
      pick(8L) -> pick(9L))
    val singles = Seq(pick(2L), pick(8L), pick(9L))
    val docs =
      pairs.zipWithIndex.flatMap { case ((a, b), k) =>
        val t = s"zq${k}a zq${k}b zq${k}c zq${k}d zq${k}e"
        Seq((a, t), (b, t))
      } ++ singles.zipWithIndex.map { case (id, k) =>
        (id, s"zs${k}a zs${k}b zs${k}c zs${k}d zs${k}e")
      }
    (docs, pairs, singles)
  }

  test("splitLeakage: train-touching clusters leak, eval-only clusters don't, singletons can't") {
    import spark.implicits._
    val (docs, _, _) = splitFixture()
    val dir = Files.createTempDirectory("split-leak-").toString
    try {
      docs.toDF("doc_id", "text")
        .selectExpr("doc_id", "text", "'en' AS lang", "'synthetic' AS source",
          "length(text) AS n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = Pipeline.splitLeakage(spark, dir).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      // val: members from the (train,val) and (val,test) pairs + the
      // singleton = 3 docs, 2 clustered, ONLY the train-paired one
      // leaks; test mirrors it via the (train,test) pair
      assert(got("val") == ((3L, 2L, 1L, 333333L)),
        s"val: (val,test) pair must not leak, singleton can't: ${got("val")}")
      assert(got("test") == ((3L, 2L, 1L, 333333L)),
        s"test: only the (train,test) member leaks: ${got("test")}")
    } finally Pipeline.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("splitRepair: clusters land whole on the min member's split, singletons and anchors never move") {
    import spark.implicits._
    val (docs, pairs, singles) = splitFixture()
    // first-principles expectation: a pair member moves iff its own
    // bucket's split differs from the MIN member's; singletons (and
    // the min member itself) stay put
    val perDoc =
      pairs.flatMap { case (a, b) =>
        val target = splitName(bucket(math.min(a, b)))
        Seq(splitName(bucket(a)) -> target, splitName(bucket(b)) -> target)
      } ++ singles.map(id => { val n = splitName(bucket(id)); n -> n })
    val exp = Seq("test", "train", "val").map { sp =>
      sp -> ((perDoc.count(_._1 == sp).toLong,
        perDoc.count(_._2 == sp).toLong,
        perDoc.count(d => d._1 == sp && d._2 != sp).toLong,
        perDoc.count(d => d._2 == sp && d._1 != sp).toLong))
    }.toMap
    assert(perDoc.exists(d => d._1 != d._2),
      "fixture must force at least one move or the test pins nothing")
    val dir = Files.createTempDirectory("split-repair-").toString
    try {
      docs.toDF("doc_id", "text")
        .selectExpr("doc_id", "text", "'en' AS lang", "'synthetic' AS source",
          "length(text) AS n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = Pipeline.splitRepair(spark, dir).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == exp, s"per-split flows must match first principles: " +
        s"got $got expected $exp")
      // conservation + the invariant the repair exists for: every
      // cluster now lives in exactly one split, so re-running the
      // leakage audit on the REPAIRED assignment must read zero —
      // checked here structurally (pairs share the min member's split)
      assert(got.values.map(_._1).sum == got.values.map(_._2).sum,
        "repair must conserve the corpus")
    } finally Pipeline.deleteTree(java.nio.file.Paths.get(dir))
  }
}

package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics of the round-5 pipeline additions on hand-built corpora:
  * incremental ingestion dedup, stratified sampling, and the int8
  * quantization audit. (End-to-end value parity vs DuckDB is the
  * driver's Verify gate; these pin the intended behavior on inputs
  * small enough to reason about by hand.)
  */
class PipelineOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("pipeline-ops-").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'synthetic' AS source",
        "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("incrementalDedup: batch keeps first-within-batch, drops corpus dups, passes novel") {
    // doc_id % 10 == 7 marks the incoming batch
    val dir = writeDocs(Seq(
      3L -> "already in the corpus", // corpus
      7L -> "already in the corpus", // batch: exact dup of corpus → dropped
      17L -> "fresh batch text", // batch: novel → kept
      27L -> "repeated inside the batch", // batch-internal dup: keep-first …
      37L -> "repeated inside the batch")) // … so 37 is dropped
    val got = Pipeline.incrementalDedup(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(17L, 27L))
  }

  test("stratifiedSample: every language capped at STRATUM_N, small strata intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pipeline-ops-").toString
    // 50 docs in 'en' (over the cap), 3 in 'fr' (under it)
    ((0L until 50L).map(i => (i, "english doc", "en")) ++
      (100L until 103L).map(i => (i, "french doc", "fr")))
      .toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'synthetic' AS source",
        "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pipeline.stratifiedSample(spark, dir).collect()
    val perLang = got.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(perLang === Map("en" -> Pipeline.STRATUM_N, "fr" -> 3))
    // ranks are contiguous from 1 within each stratum
    assert(got.filter(_.getString(1) == "fr").map(_.getLong(2)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("chunkWindows: chunk count, sizes, and tail behavior across length boundaries") {
    // doc_id n carries exactly n tokens; covers the window (32) and
    // stride (24) boundaries from both sides plus the degenerate 1
    val lengths = Seq(1, 3, 23, 24, 25, 32, 33, 56, 57, 100)
    val dir = writeDocs(lengths.map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" "))))
    val got = Pipeline.chunkWindows(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    for (n <- lengths) {
      val chunks = got(n.toLong)
      // starts are 0, 24, 48, … while start ≤ n-1
      assert(chunks.length == (n - 1) / 24 + 1, s"n=$n chunk count")
      for ((c, i) <- chunks.zipWithIndex) {
        assert(c.getLong(1) == i.toLong, s"n=$n contiguous chunk ids")
        assert(c.getLong(2) == math.min(32, n - 24 * i), s"n=$n chunk $i size")
      }
    }
    // a 33-token doc: chunk 1 covers tokens 25..33 — the 9-token tail
    // that a non-overlapping 32-token split would have orphaned
    assert(got(33L).map(_.getLong(2)).toSeq == Seq(32L, 9L))
  }

  test("chunkDedup: keep-first on chunk hash across and within documents") {
    // docs 1 and 2 are identical 56-token runs of one word: window 32 /
    // stride 24 gives starts 0/24/48, and chunk 1 (tokens 25..56) is
    // byte-identical to chunk 0 — a within-doc duplicate — while the
    // 8-token tail chunk 2 hashes differently. doc 2 duplicates all
    // three. doc 3 is unique. Keep-first = smallest (doc_id, chunk_id)
    // per hash.
    val run = Seq.fill(56)("w").mkString(" ")
    val dir = writeDocs(Seq(
      1L -> run, 2L -> run,
      3L -> (1 to 30).map(i => s"u$i").mkString(" ")))
    val got = Pipeline.chunkDedup(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getBoolean(3))).toMap
    assert(got === Map(
      (1L, 0L) -> true, (1L, 1L) -> false, (1L, 2L) -> true,
      (2L, 0L) -> false, (2L, 1L) -> false, (2L, 2L) -> false,
      (3L, 0L) -> true, (3L, 1L) -> true))
  }

  test("annLshMultiprobe: reaches hamming ≤ 2 buckets, not hamming 3") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pipeline-ops-").toString
    def v(flips: Int): Array[Float] =
      (0 until 8).map(i => if (i < flips) -1.0f else 1.0f).toArray
    Seq(
      (0L, v(0), 0), // query: bucket 0xFF
      (1L, v(0), 0), // same bucket — single-probe finds it
      (2L, v(1), 0), // hamming 1 — multiprobe only
      (3L, v(2), 0), // hamming 2 — multiprobe only
      (4L, v(3), 0)) // hamming 3 — out of the probe set for both
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val single = Pipeline.annLsh(spark, dir).collect().map(_.getLong(0)).toSet
    val multi = Pipeline.annLshMultiprobe(spark, dir).collect().map(_.getLong(0)).toSet
    assert(single === Set(1L))
    assert(multi === Set(1L, 2L, 3L))
  }

  test("pqCodes: equidistant centroids break ties to the smaller label") {
    import spark.implicits._
    // per-dim values constant across all 64 dims: label-0 centroid =
    // floor((0 + 200000)/2) = 100000 micro, label-1 centroid =
    // floor((200000 + 400000)/2) = 300000. The two 0.2 vectors are
    // exactly 100000 micro from BOTH centroids in every subspace — the
    // argmin must settle on label 0 deterministically (min struct
    // (dist2, label)), matching the oracle's ORDER BY dist2, label
    val dir = Files.createTempDirectory("pq-tie-").toString
    Seq((0L, Array.fill(64)(0.0f), 0), (1L, Array.fill(64)(0.2f), 0),
      (2L, Array.fill(64)(0.2f), 1), (3L, Array.fill(64)(0.4f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Pipeline.pqCodes(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val all0 = Seq.fill(8)("0").mkString("-")
    val all1 = Seq.fill(8)("1").mkString("-")
    assert(got === Seq((0L, all0), (1L, all0), (2L, all0), (3L, all1)))
  }

  test("incrementalNearDup: batch probes corpus only — batch-batch pairs never reported") {
    val near = "the quick brown fox jumps over the lazy dog"
    val dir = writeDocs(Seq(
      1L -> (near + " today"), // corpus
      3L -> "completely unrelated corpus text right here", // corpus
      7L -> (near + " tonight"), // batch
      17L -> (near + " tonight"))) // batch: exact copy of 7 — high Jaccard, wrong side
    val got = Pipeline.incrementalNearDup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // both batch docs match corpus doc 1; the 7↔17 batch pair is the
    // exact-dedup stage's job (x_incremental_dedup), not this probe's
    assert(got === Seq((7L, 1L), (17L, 1L)))
  }

  test("shingleNovelty: exact ppm against the corpus shingle universe") {
    val dir = writeDocs(Seq(
      1L -> "a b c d e", // corpus shingles: abc, bcd, cde
      7L -> "a b c x y", // batch: abc seen, bcx/cxy novel → 2/3
      17L -> "p q r s")) // batch: pqr, qrs both novel → 2/2
    val got = Pipeline.shingleNovelty(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (7L, 3L, 2L, 666666L),
      (17L, 2L, 2L, 1000000L)))
  }

  test("chunkClean: cross-doc and within-doc duplicate spans removed, text rebuilt exactly") {
    import spark.implicits._
    val span = (0 until 32).map(i => s"w$i").mkString(" ") // exactly one 32-token chunk
    val dir = writeDocs(Seq(
      1L -> "a b", // unique short doc: single chunk, survives intact
      2L -> s"$span $span", // within-doc duplication: chunk 1 repeats chunk 0
      3L -> "a b")) // exact cross-doc dup of 1: whole text cleaned away
    val got = Pipeline.chunkClean(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === Seq(
      (1L, 1L, 0L, "a b", 0L),
      (2L, 2L, 1L, span, (span.length + 1).toLong), // dropped span + its separator
      (3L, 1L, 1L, "", 3L)))
  }

  test("dedupRecall: planted variant scored against its source; no embeddings → 3 families") {
    import spark.implicits._
    // doc 2 is the one plant source: rep, doc_id % 5 == 2, 16 tokens
    // (≥ 8), rate class 8 (2 % 4 = 2), mutations at i = 6 and 14 →
    // 5 of 14 shingles change, Jaccard 9/19 ≈ 0.47 → the jaccard
    // family must catch exactly this pair
    val dir = writeDocs(Seq(
      2L -> (0 until 16).map(i => s"t$i").mkString(" "),
      3L -> "completely unrelated words in this other document here now",
      9L -> "another filler document with its own distinct token stream"))
    val got = Pipeline.dedupRecall(spark, dir).collect()
    // text-only corpus: the semantic family degrades away; the
    // shipped-composition row remains (jaccard ∪ simhash here)
    assert(got.map(_.getString(0)).toSeq.sorted ===
      Seq("jaccard", "minhash", "pipeline", "simhash"))
    val jac = got.find(_.getString(0) == "jaccard").get
    assert(jac.getLong(1) === 8L) // rate class of doc 2
    assert(jac.getLong(2) === 1L && jac.getLong(3) === 1L && jac.getLong(4) === 0L)
    assert(jac.getLong(5) === 1000000L && jac.getLong(6) === 1000000L)
  }

  test("dedupSemantic: flags only the pairs the lexical graph could not link") {
    import spark.implicits._
    // docs 1,2 lexically near-dup (shared shingles); docs 3,4 lexically
    // unrelated BUT semantically identical (equal embeddings)
    val dir = writeDocs(Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog tonight",
      3L -> "completely different text here now",
      4L -> "unrelated words make another document entirely"))
    def unit(axis: Int): Array[Float] =
      (0 until 64).map(i => if (i == axis) 1.0f else 0.0f).toArray
    Seq((1L, unit(0), 0), (2L, unit(0), 0), (3L, unit(1), 0), (4L, unit(1), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Pipeline.dedupSemantic(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSeq
    // (1,2): already one lexical cluster → not a new link; (3,4): the
    // semantic stage's genuine contribution. Cross-axis pairs have
    // cos 0 and never reach the report.
    assert(got === Seq((1L, 2L, false), (3L, 4L, true)))
  }

  test("kmeansConverge: a mislabeled vector moves in round 1, then the run is stable") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kmeans-conv-").toString
    val a = Array.fill(64)(0.0f)
    val b = Array.fill(64)(1.0f)
    // vec 3 sits at cluster 0's location but carries label 1: round 1
    // must reassign it (1 move), after which centroids are exact and
    // rounds 2-3 are fixpoints
    Seq((0L, a, 0), (1L, a, 0), (2L, b, 1), (3L, a, 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Pipeline.kmeansConverge(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1, 1L, 4L), (2, 0L, 4L), (3, 0L, 4L)))
  }

  test("embedQuantize: on-grid vectors have zero error, zero vectors are excluded") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pipeline-ops-").toString
    Seq(
      // max|x| = 127 → scale 1.0, every component already on the int8 grid
      (1L, Array(127.0f, -127.0f, 3.0f, 0.0f), 0),
      // zero vector: scale 0 → undefined quantization, must be filtered out
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f), 0),
      // max|x| = 254 → scale 2.0; 3.0 sits mid-grid, error 1.0 = 1e6 micro
      (3L, Array(254.0f, 3.0f, 0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Pipeline.embedQuantize(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3))).toSeq
    // floor(3.0/2.0 + 0.5) = 2 → reconstruction 4.0, |3-4| = 1.0
    assert(got === Seq((1L, 1.0, 0L), (3L, 2.0, 1000000L)))
  }

  test("qualityCalibration: hand bands — agree/disagree/no-direction/no-embedding all placed exactly") {
    import spark.implicits._
    // qm by the shared formula: doc1 "the the the the" = 625000
    // (band 6, the only seed at the 400000 floor → centroid (1e6, 0));
    // doc2 "zz yy" = 81250 (band 0), embedding (-1,0) → cos −1e6,
    // disagree; doc3 = 84375 (band 0), NO embedding; doc4 "the aa" =
    // 350000 (band 3), zero vector → embedded but directionless
    val dir = writeDocs(Seq(
      (1L, "the the the the"), (2L, "zz yy"),
      (3L, "aa bb cc"), (4L, "the aa")))
    Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(-1.0f, 0.0f), 0),
        (4L, Seq(0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Pipeline.qualityCalibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got.length == 10, s"all bands anchored: ${got.toSeq}")
    val byBand = got.map(t => t._1 -> t).toMap
    assert(byBand(0L) == ((0L, 2L, 1L, 1L, Some(-1000000L), Some(0L))),
      s"band 0: ${byBand(0L)}")
    assert(byBand(3L) == ((3L, 1L, 1L, 0L, None, None)),
      s"band 3 (zero-norm): ${byBand(3L)}")
    assert(byBand(6L) == ((6L, 1L, 1L, 1L, Some(1000000L), Some(1000000L))),
      s"band 6 (seed): ${byBand(6L)}")
    for (b <- Seq(1L, 2L, 4L, 5L, 7L, 8L, 9L))
      assert(byBand(b) == ((b, 0L, 0L, 0L, None, None)), s"band $b: ${byBand(b)}")
  }
}

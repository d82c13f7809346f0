package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Content-defined chunking (x_cdc_*): the chunks partition the text
  * exactly, exact-duplicate content dedups at chunk granularity, and —
  * the property the scheme exists for — chunk boundaries resynchronize
  * after an insertion while fixed-size blocks all shift.
  */
class CdcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Deterministic pseudo-random ASCII text (no spaces needed — CDC is
    * character-level). */
  private def ptext(n: Int, seed: Int): String = {
    var x = seed.toLong * 2654435761L + 1013904223L
    val sb = new StringBuilder
    for (_ <- 0 until n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb += ('a' + ((x >>> 33) % 26).toInt).toChar
    }
    sb.toString
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("cdc-spec-").toString
    rows.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("cdcChunks: chunks partition each text exactly (incl. empty and short docs)") {
    val docs = Seq(
      (1L, ptext(400, 1), "a"),
      (2L, ptext(300, 2), "a"),
      (3L, "", "a"),           // one empty chunk
      (4L, "tiny", "a"))       // shorter than the window → single chunk
    val dir = writeDocs(docs)
    val rows = Pipeline.cdcChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet === docs.map(_._1).toSet)
    for ((id, text, _) <- docs) {
      val cs = byDoc(id).sortBy(_._2)
      // contiguity: starts at 1, each chunk ends where the next begins,
      // lengths sum to the text length
      assert(cs.head._3 == 1L, s"doc $id first chunk must start at 1")
      for (w <- cs.sliding(2) if w.length == 2)
        assert(w(1)._3 == w(0)._3 + w(0)._4,
          s"doc $id chunks not contiguous at ${w(1)._2}")
      assert(cs.map(_._4).sum == text.length.toLong, s"doc $id lengths must sum")
      // each hash is the md5 of exactly that substring
      for ((_, _, st, len, h) <- cs)
        assert(h == md5hex(text.substring(st.toInt - 1, st.toInt - 1 + len.toInt)),
          s"doc $id chunk at $st hash mismatch")
    }
    // the long docs must actually exercise multi-chunk paths
    assert(byDoc(1L).length >= 3 && byDoc(2L).length >= 3,
      "fixture must produce multi-chunk docs")
    assert(byDoc(3L).toSeq === Seq((3L, 0L, 1L, 0L, md5hex(""))))
    assert(byDoc(4L).length == 1)
  }

  test("cdcDedup: an exact duplicate doc dedups chunk-for-chunk; unique text not at all") {
    val t = ptext(420, 5)
    val dir = writeDocs(Seq(
      (1L, t, "a"),            // canonical (smallest doc_id)
      (2L, t, "b"),            // every chunk a repeat of doc 1's
      (3L, ptext(380, 9), "b"))) // unique
    val got = Pipeline.cdcDedup(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val a = got(0); val b = got(1)
    assert(a._1 == "a" && a._4 == 0L && a._5 == 0L, s"canonical source dedups nothing: $a")
    assert(b._1 == "b", s"$b")
    // source b = one full duplicate of t (all its chunks and chars dup)
    // plus one unique doc (none)
    assert(b._4 == a._2 && b._5 == t.length.toLong,
      s"duplicate doc must dedup chunk-for-chunk: $b vs $a")
  }

  test("CdcStarts kernel ≡ composed builtins (multibyte, empty, short, NULL, corpus text)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // hand cases exercise the codepoint accounting (2-, 3-, 4-byte
    // UTF-8), the single-chunk floor, the empty text, and NULL
    // propagation; the corpus rows exercise real boundary density
    val hand = Seq("", "tiny", "héllo wörld çafé ünïcode strîng hère okay",
      "日本語のテキストで境界条件を確認する十分に長い文字列です",
      "emoji 😀 inside 🚀 a long enough string to cross the window size",
      ptext(300, 42), null)
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").as[String].collect().toSeq
    val df = (hand ++ corpus).toDF("t")
    val both = df.select(col("t").isNull.as("isnull"),
      graft.functions.CdcFunctions.cdcStarts(spark, col("t")).as("k"),
      Pipeline.cdcStartsRef(col("t")).as("r"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    assert(rows.count(_.getBoolean(0)) == 1, "the NULL row must survive to the check")
    for (r <- rows) {
      if (r.getBoolean(0)) {
        // kernel is a UnaryExpression (null-safe eval) → NULL in, NULL
        // out; the composed reference must agree, not emit [1]
        assert(r.isNullAt(1) && r.isNullAt(2),
          s"NULL text must propagate in both forms: ${r.get(1)} vs ${r.get(2)}")
      } else {
        assert(r.getSeq[Int](1) === r.getSeq[Int](2),
          s"kernel/builtins divergence: ${r.getSeq[Int](1)} vs ${r.getSeq[Int](2)}")
      }
    }
  }

  test("cdcResync: boundaries resynchronize after a 1-char insertion; fixed blocks do not") {
    val dir = writeDocs((1L to 6L).map(i => (i, ptext(400 + 13 * i.toInt, i.toInt), "a")))
    val r = Pipeline.cdcResync(spark, dir).collect().head
    val (nDocs, cdcChunks, cdcShared, fixChunks, fixShared) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(nDocs == 6L)
    // each doc loses AT MOST its first chunk (the one before the first
    // surviving boundary); everything after re-aligns exactly
    assert(cdcShared >= cdcChunks - nDocs,
      s"CDC must preserve all but ≤1 chunk per doc: $cdcShared of $cdcChunks")
    assert(cdcShared < cdcChunks, "the first chunk's content did shift")
    // fixed-size blocks all shift by one char — nothing re-aligns
    assert(fixShared == 0L, s"fixed blocks cannot survive a front insertion: $fixShared of $fixChunks")
    val cdcPpm = r.getLong(6); val fixPpm = r.getLong(7)
    assert(cdcPpm > 600000L && fixPpm == 0L, s"ppm contrast: $cdcPpm vs $fixPpm")
  }
}

package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The per-source share cap's contracts, pinned on a hand corpus with
  * a third-engine (java MD5) coin derivation: exact keep-rate
  * arithmetic at the cap boundary, under-cap pass-through, the
  * transform/eval keep-set agreement (one shared coin definition),
  * and conservation.
  */
class SourceCapSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Third-engine twin of the cap coin: first 8 hex chars of
    * md5("srccap|" ‖ id) mod 1e6 via java.security — independent of
    * both SQL engines, the DedupClusterSpec discipline.
    */
  private def coin(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"srccap|$id".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % 1000000L
  }

  /** Hand corpus: `big` carries 60 of 100 total tokens (600000 ppm —
    * far over the 50000 ppm cap), `mid` 30 (300000 ppm — also over),
    * `small` 10 (100000 ppm — over too, the uniform fixture exercises
    * the under-cap path; here every rate is a hand-checkable exact
    * integer). Doc lengths are exact so keep_ppm = floor(50000 · 100 /
    * n_tok) per source: big → 83333, mid → 166666, small → 500000.
    */
  private def writeCorpus(dir: String): Map[Long, (String, Long)] = {
    import spark.implicits._
    val docs =
      (1 to 6).map(i => (i.toLong, "big", 10)) ++
        (11 to 16).map(i => (i.toLong, "mid", 5)) ++
        (21 to 25).map(i => (i.toLong, "small", 2))
    val rows = docs.map { case (id, src, n) =>
      (id, src, Seq.fill(n)(s"w$id").mkString(" "))
    }
    rows.toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    docs.map { case (id, src, n) => id -> ((src, n.toLong)) }.toMap
  }

  test("keep rates are exact integer ppm; the coin decides per doc; eval agrees with the transform") {
    val dir = Files.createTempDirectory("srccap-").toString
    val docs = writeCorpus(dir)
    val totalTok = docs.values.map(_._2).sum // 100
    val perSrc = docs.values.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def keepPpm(src: String): Long =
      math.min(1000000L, 50000L * totalTok / perSrc(src))
    assert(keepPpm("big") == 83333L && keepPpm("mid") == 166666L &&
      keepPpm("small") == 500000L)

    val cap = Pipeline.sourceCap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(cap.map(_._1).toSet == docs.keySet, "every doc gets a decision row")
    cap.foreach { case (id, src, kp, cp, kept) =>
      assert(src == docs(id)._1)
      assert(kp == keepPpm(src), s"doc $id keep_ppm $kp != ${keepPpm(src)}")
      assert(cp == coin(id), s"doc $id coin $cp != third-engine ${coin(id)}")
      assert(kept == (cp < kp), s"doc $id verdict")
    }
    // real signal: the cap must actually drop something AND keep something
    assert(cap.exists(_._5) && cap.exists(!_._5))

    val eval = Pipeline.capRealized(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(eval.keySet == Set("big", "mid", "small"))
    val keptTokTotal = cap.filter(_._5).map(c => docs(c._1)._2).sum
    eval.foreach { case (src, (nDocs, nTok, sharePpm, kp, nKept, keptTok, realized)) =>
      val srcDocs = docs.filter(_._2._1 == src)
      assert(nDocs == srcDocs.size && nTok == perSrc(src))
      assert(sharePpm == nTok * 1000000L / totalTok)
      assert(kp == keepPpm(src))
      val keptHere = cap.filter(c => c._2 == src && c._5)
      assert(nKept == keptHere.length, s"$src n_kept")
      assert(keptTok == keptHere.map(c => docs(c._1)._2).sum, s"$src kept_tok")
      assert(realized == keptTok * 1000000L / keptTokTotal, s"$src realized")
    }
  }

  test("under-cap source keeps everything at keep_ppm = 1e6") {
    import spark.implicits._
    val dir = Files.createTempDirectory("srccap-under-").toString
    // two equal sources at 500000 ppm each — both 10× over a 50000
    // cap... so make them straddle: tiny (1 token, 9091 ppm) vs the
    // rest (109 tokens): tiny's keep rate saturates at 1e6
    val rows = Seq((1L, "tiny", "only")) ++
      (2 to 12).map(i => (i.toLong, "bulk",
        Seq.fill(9)(s"t$i").mkString(" ") + " x"))
    rows.toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val cap = Pipeline.sourceCap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(4)))
    val tiny = cap.filter(_._2 == "tiny")
    assert(tiny.length == 1 && tiny.head._3 == 1000000L && tiny.head._4,
      s"under-cap source must pass everything: ${tiny.toSeq}")
  }
}

package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-fixture semantics for the incremental split-leakage audit
  * (`x_incr_split_leakage`): the bridge scenario the nightly regime
  * exists to catch — an arriving doc near-dups BOTH a train doc and a
  * previously CLEAN published eval doc, so the merge leaks the
  * published doc after its audit already passed. Buckets are computed
  * with a THIRD engine (java.security MD5 in the test) and the doc
  * ids are derived FROM the buckets, so every category (train base,
  * clean eval base, arriving eval bridge, novel arrival, untouched
  * leaked pair) exists by construction.
  */
class SplitIncrSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** The split bucket rule, re-derived independently of both engines:
    * first 4 hex digits of md5(doc_id as string), base 16, mod 10.
    */
  private def bucket(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .take(2).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % 10
  }
  private def splitName(b: Long): String = if (b == 8) "val" else "test"

  test("incrSplitLeakage: an arriving bridge leaks a published eval doc; untouched leakage is not re-reported") {
    import spark.implicits._
    val dir = Files.createTempDirectory("incr-split-").toString

    // ids derived from the bucket rule so the categories exist by
    // construction (base = id % 10 ≠ 7, batch = ≡ 7)
    val baseIds = Iterator.from(1).map(_.toLong).filter(_ % 10 != 7)
      .take(4000).toSeq
    val aId = baseIds.find(bucket(_) <= 7).get // train base
    val bId = baseIds.find(i => i != aId && bucket(i) >= 8).get // clean eval base
    val fId = baseIds.find(i => i != aId && i != bId && bucket(i) <= 7).get
    val eId = baseIds
      .find(i => !Set(aId, bId, fId)(i) && bucket(i) >= 8).get // already-leaked eval
    val batchIds = Iterator.from(1).map(_.toLong).filter(_ % 10 == 7)
      .take(4000).toSeq
    val cId = batchIds.find(bucket(_) >= 8).get // arriving eval bridge
    val dId = batchIds.find(_ != cId).get       // arriving novel doc

    def toks(p: String) = (0 until 20).map(i => s"$p$i")
    val aTxt = toks("a").mkString(" ")
    val bTxt = toks("b").mkString(" ")
    // the bridge: half of A's tokens + half of B's — Jaccard ≈ 0.29
    // against each (≥ the 0.10 family cut), while A–B share nothing
    val cTxt = (toks("a").take(10) ++ toks("b").take(10)).mkString(" ")
    val dTxt = toks("d").mkString(" ")
    // the untouched ALREADY-leaked pair: eval doc E near-dups train
    // doc F yesterday AND today; the batch never touches them, so the
    // audit must not re-report E as newly leaked (or even touched)
    val eTxt = toks("e").mkString(" ")
    val fTxt = (toks("e").take(18) ++ Seq("fx", "fy")).mkString(" ")

    Seq((aId, aTxt), (bId, bTxt), (cId, cTxt), (dId, dTxt),
        (eId, eTxt), (fId, fTxt))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Pipeline.incrSplitLeakage(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.keySet == Set("val", "test"), s"2 anchored rows: $got")

    // expected, derived from the same bucket rule: arrivals C (leaked
    // — its post-merge cluster {A,B,C} holds train doc A) and D if
    // D's bucket is an eval one (clean — unclustered)
    val expArr = Map("val" -> 0L, "test" -> 0L) ++
      Seq(cId, dId).filter(bucket(_) >= 8).groupBy(i => splitName(bucket(i)))
        .map { case (spl, is) => spl -> is.size.toLong }
    val expArrLeaked =
      Map("val" -> 0L, "test" -> 0L) + (splitName(bucket(cId)) -> 1L)
    for (spl <- Seq("val", "test")) {
      val (nArr, nArrLeaked, ppm, nTouched, nNewLeaked) = got(spl)
      assert(nArr == expArr(spl), s"$spl n_arriving: $got")
      assert(nArrLeaked == expArrLeaked(spl), s"$spl n_arriving_leaked: $got")
      val expPpm =
        if (expArr(spl) == 0) -1L else expArrLeaked(spl) * 1000000L / expArr(spl)
      assert(ppm == expPpm, s"$spl arr_leak_ppm: $got")
      // published: exactly B is touched AND newly leaked, in B's
      // split; the already-leaked untouched E must appear in neither
      val expPub = if (spl == splitName(bucket(bId))) 1L else 0L
      assert(nTouched == expPub, s"$spl n_published_touched: $got")
      assert(nNewLeaked == expPub, s"$spl n_published_newly_leaked: $got")
    }
  }
}

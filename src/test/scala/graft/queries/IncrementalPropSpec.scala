package graft.queries

import java.nio.file.Files

import scala.util.Random

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Randomized incremental ≡ full-rebuild identity: for seeded random
  * corpora — small token vocabulary (forced jaccard/simhash
  * collisions), injected exact duplicates (rep-stealing and demotion
  * paths), and a random embedded subset (sem edges overlapping lex
  * pairs) — [[Pipeline.incrEdges]] must equal the from-scratch edge
  * graph and [[Pipeline.incrClusters]] the from-scratch clusters,
  * pair for pair. The engineered fixtures in IncrementalGraphSpec pin
  * the corners we THOUGHT of; this sweep hunts the ones we didn't
  * (the demotion × sem-family interaction was exactly such a corner).
  * Corpus sizes stay far under every structural cap
  * (SHINGLE_DF_CAP/BAND_CAP/EMBED_CELL_CAP), keeping each sample
  * inside the documented exactness boundary.
  */
class IncrementalPropSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def writeCorpus(dir: String, seed: Int): Unit = {
    import spark.implicits._
    val rnd = new Random(seed)
    val vocab = (0 until 25).map(i => s"w$i")
    val nDocs = 40 + rnd.nextInt(40) // ≤ 80 docs: every cap unreachable
    val ids = rnd.shuffle((1 to 200).toList).take(nDocs).map(_.toLong).sorted
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    val docs = ids.map { id =>
      val text =
        if (texts.nonEmpty && rnd.nextDouble() < 0.25)
          texts(rnd.nextInt(texts.size)) // exact duplicate: dedup/demotion paths
        else
          Seq.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      texts += text
      (id, text)
    }
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    if (seed % 2 == 0) { // half the samples carry embeddings
      val emb = ids.filter(_ => rnd.nextDouble() < 0.6).map { id =>
        // coarse 4-dim vectors from a tiny value set: cosine collisions
        // (≥ 0.40 within a label cell) occur by construction
        val v = Array.fill(4)((1 + rnd.nextInt(3)).toFloat)
        (id, v, rnd.nextInt(2))
      }
      if (emb.nonEmpty)
        emb.toDF("vec_id", "embedding", "label")
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
  }

  (1 to 8).foreach { seed =>
    test(s"incremental ≡ full rebuild on random corpus (seed $seed)") {
      val dir = Files.createTempDirectory(s"incr-prop-$seed-").toString
      writeCorpus(dir, seed)
      val full = pairs(
        spark.read.parquet(Pipeline.ensureEdgeGraph(spark, dir).toString)
          .select("a_id", "b_id").distinct())
      val incr = pairs(Pipeline.incrEdges(spark, dir))
      assert(incr == full,
        s"seed $seed: incr ∖ full: ${incr -- full}; full ∖ incr: ${full -- incr}")
      val fullCl = Pipeline.dedupClusters(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val incrCl = Pipeline.incrClusters(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(incrCl == fullCl,
        s"seed $seed: incrCl ∖ fullCl: ${incrCl -- fullCl}; " +
          s"fullCl ∖ incrCl: ${fullCl -- incrCl}")
    }
  }

  /** The audit composed on top: [[Pipeline.incrSplitLeakage]] must
    * equal a from-first-principles full-rebuild twin (full clusters
    * via [[Pipeline.dedupClusters]], touched set from the edge-set
    * diff, buckets via a THIRD-engine java MD5) on the same random
    * corpora — hunting interaction corners (dissolved clusters,
    * demotions, batch-bridged merges) the hand fixture in
    * SplitIncrSpec doesn't enumerate.
    */
  private def bucket(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .take(2).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % 10
  }

  private val splitSignal = new java.util.concurrent.atomic.AtomicLong(0L)
  // which seeds actually contributed — the sweep-wide zero-signal
  // assertion is only meaningful when every seed ran (a test-name
  // filter running seed 4 alone would otherwise evaluate the "all
  // four seeds" claim over one seed's contribution)
  private val splitSeedsRan =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  (1 to 4).foreach { seed =>
    test(s"incrSplitLeakage ≡ full-rebuild audit on random corpus (seed $seed)") {
      val dir = Files.createTempDirectory(s"incr-split-prop-$seed-").toString
      writeCorpus(dir, seed)
      val fullCl = Pipeline.dedupClusters(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val fullEdges = pairs(
        spark.read.parquet(Pipeline.ensureEdgeGraph(spark, dir).toString)
          .select("a_id", "b_id").distinct())
      val baseEdges = pairs(
        spark.read.parquet(Pipeline.ensureEdgeGraph(spark,
            Pipeline.ensureBaseCorpus(spark, dir).toString).toString)
          .select("a_id", "b_id").distinct())
      val baseLabels = spark.read
        .parquet(Pipeline.ensureBaseLabels(spark, dir).toString)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val docIds = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").collect().map(_.getLong(0)).toSeq

      // the oracle's touched derivation: plus = full edges with a
      // batch endpoint, minus = base ∖ full; touched clusters = full
      // labels of touched ids that are clustered today
      val plus = fullEdges.filter(e => e._1 % 10 == 7 || e._2 % 10 == 7)
      val minus = baseEdges -- fullEdges
      val touched = (plus ++ minus).flatMap(e => Seq(e._1, e._2))
      val tcl = touched.flatMap(fullCl.get)
      val trainToday = docIds.filter(bucket(_) <= 7).flatMap(fullCl.get).toSet
      val trainYest = baseLabels.collect {
        case (id, l) if bucket(id) <= 7 => l }.toSet

      def expected(sp: Long): (Long, Long, Long, Long, Long) = {
        val arr = docIds.filter(id => id % 10 == 7 && bucket(id) == sp)
        val arrLeaked =
          arr.count(id => fullCl.get(id).exists(trainToday)).toLong
        val ppm = if (arr.isEmpty) -1L else arrLeaked * 1000000L / arr.size
        val pub = docIds.filter(id => id % 10 != 7 && bucket(id) == sp &&
          fullCl.get(id).exists(tcl))
        val newly = pub.count { id =>
          fullCl.get(id).exists(trainToday) &&
            !baseLabels.get(id).exists(trainYest) }.toLong
        (arr.size.toLong, arrLeaked, ppm, pub.size.toLong, newly)
      }
      val got = Pipeline.incrSplitLeakage(spark, dir).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) -1L else r.getLong(3),
            r.getLong(4), r.getLong(5)))).toMap
      assert(got.keySet == Set("val", "test"))
      assert(got("val") == expected(8L),
        s"seed $seed val: ${got("val")} vs ${expected(8L)}")
      assert(got("test") == expected(9L),
        s"seed $seed test: ${got("test")} vs ${expected(9L)}")
      splitSignal.addAndGet(
        got("val")._2 + got("val")._5 + got("test")._2 + got("test")._5)
      splitSeedsRan.add(seed)
      // the fixed seeds are deterministic: the sweep as a whole must
      // exercise real leakage, not four all-zero corpora — asserted
      // only when all four seeds contributed (isolated runs skip it)
      if (splitSeedsRan.size == 4)
        assert(splitSignal.get() > 0L,
          "all four seeds produced zero leak signal — regenerate seeds")
    }
  }
}

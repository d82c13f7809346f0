package graft.queries

import java.nio.file.Files

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized incremental ≡ full-recompute identity for the keep-best
  * policy layer — the IncrementalPropSpec seeded-corpus discipline
  * applied to [[Pipeline.keepBestIncr]] (round-17 verdict item 6):
  * on seeded random corpora (small vocab forcing near-dup clusters,
  * injected exact duplicates, batch ids by the ≡7 mod 10 convention),
  * the incremental decision must equal [[Pipeline.keepBest]]'s full
  * recompute row-for-row, with `recomputed` matching the
  * from-first-principles map-diff derivation (changed = batch ∨
  * new-in-map ∨ moved id; touched = changed ids' today-clusters ∪
  * departed base-clusters). MaintenanceOpsSpec pins the engineered
  * keeper-flip fixture; this sweep hunts the interaction corners.
  */
class KeepBestIncrPropSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def writeCorpus(dir: String, seed: Int): Unit = {
    import spark.implicits._
    val rnd = new Random(seed)
    val vocab = (0 until 25).map(i => s"w$i")
    val nDocs = 40 + rnd.nextInt(40)
    val ids = rnd.shuffle((1 to 200).toList).take(nDocs).map(_.toLong).sorted
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    val docs = ids.map { id =>
      val text =
        if (texts.nonEmpty && rnd.nextDouble() < 0.25)
          texts(rnd.nextInt(texts.size)) // exact duplicate
        else
          Seq.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      texts += text
      (id, text)
    }
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    if (seed % 2 == 1) { // some samples carry embeddings → sem edges in the map
      val emb = ids.filter(_ => rnd.nextDouble() < 0.6).map { id =>
        (id, Array.fill(4)((1 + rnd.nextInt(3)).toFloat), rnd.nextInt(2))
      }
      if (emb.nonEmpty)
        emb.toDF("vec_id", "embedding", "label")
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
  }

  private val flipSignal = new java.util.concurrent.atomic.AtomicLong(0L)
  private val seedsRan =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  (1 to 3).foreach { seed =>
    test(s"keepBestIncr ≡ full recompute + map-diff recomputed on random corpus (seed $seed)") {
      val dir = Files.createTempDirectory(s"kbi-prop-$seed-").toString
      writeCorpus(dir, seed)
      val baseDir = Pipeline.ensureBaseCorpus(spark, dir).toString
      val todayMap = Pipeline.dedupFull(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val baseMap = Pipeline.dedupFull(spark, baseDir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the from-first-principles touched derivation (the operator's
      // declared map-diff semantics, re-derived independently)
      val changed = todayMap.keys.filter { id =>
        id % 10 == 7 || !baseMap.contains(id) ||
          baseMap(id) != todayMap(id)
      }.toSeq
      val touched = (changed.map(todayMap) ++
        changed.flatMap(baseMap.get)).toSet
      val expectedDecision = Pipeline.keepBest(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

      val got = Pipeline.keepBestIncr(spark, dir).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getBoolean(2), r.getBoolean(3)))).toMap
      assert(got.keySet == expectedDecision.keySet,
        s"seed $seed: row population diverged")
      got.foreach { case (id, (keepId, isKept, recomputed)) =>
        assert((keepId, isKept) == expectedDecision(id),
          s"seed $seed doc $id: ($keepId, $isKept) != ${expectedDecision(id)}")
        assert(recomputed == touched(todayMap(id)),
          s"seed $seed doc $id: recomputed flag diverged from the map diff")
      }
      // signal: both paths must exist in each sample, and across the
      // sweep at least one NON-TRIVIAL cluster (≥2 members) recomputed
      assert(got.values.exists(_._3) && got.values.exists(!_._3),
        s"seed $seed: need both recomputed and passthrough docs")
      flipSignal.addAndGet(
        got.values.count(v => v._3 && !v._2).toLong)
      seedsRan.add(seed)
      if (seedsRan.size == 3)
        assert(flipSignal.get() > 0L,
          "no seed recomputed a non-trivial cluster — regenerate seeds")
    }
  }
}

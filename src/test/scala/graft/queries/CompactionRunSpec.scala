package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The compaction-repair contract on a corpus where the incremental
  * path is provably WRONG: [[Pipeline.ensureCrossedCorpus]] plants a
  * shingle whose document frequency the batch pushes across
  * SHINGLE_DF_CAP (95 → 105), so the maintained graph carries the
  * C(85,2) shared-trigram edges the base build derived under the cap
  * while the full rebuild drops them — and five partner-trigram edges
  * must SURVIVE the repair (retract + regenerate, not blanket
  * deletion). compactionRun must land exactly on the from-scratch
  * rebuild.
  */
class CompactionRunSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val OFF = 2000000L

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("planted cap crossing: maintained graph diverges, repair ≡ full rebuild") {
    val adir = Pipeline.ensureCrossedCorpus(spark, dir).toString
    val full = pairSet(
      Pipeline.ngramJaccard(spark, adir).select("a_id", "b_id")
        .union(Pipeline.simhashPairs(spark, adir).select("a_id", "b_id"))
        .union(Pipeline.embedNearDup(spark, adir).select("a_id", "b_id"))
        .distinct())
    val maintained = pairSet(Pipeline.incrEdges(spark, adir))
    val stale = maintained -- full
    assert(stale.nonEmpty, "the crossing must invalidate maintained edges")
    assert(stale.size >= 3000,
      s"the shared-trigram clique (C(85,2) edges) must be stale, got ${stale.size}")
    assert(stale.forall { case (a, b) => a >= OFF && b >= OFF },
      "divergence must be confined to the planted crossing")

    val out = Pipeline.compactionRun(spark, dir)
    assert(pairSet(out) == full, "repair must reproduce the full rebuild exactly")
    // the five partner pairs survive on their pair trigrams — they go
    // through the rebuild stage (affected endpoints), flagged repaired
    val repairedTrue = out.filter(out("repaired")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val partners = (0 until 5).map(k =>
      (OFF + 10 * (2 * k) + 1, OFF + 10 * (2 * k + 1) + 1)).toSet
    assert(partners.subsetOf(repairedTrue),
      s"partner edges must be re-added by the repair: ${repairedTrue.take(10)}")
    // nothing planted survives as 'kept' — every planted edge sits in
    // the crossing's blast radius
    val keptRows = out.filter(!out("repaired")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(keptRows.forall { case (a, b) => a < OFF && b < OFF },
      "kept rows must never touch an affected doc")
  }
}

package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental shard append's contracts on the real fixture:
  * the first arrival fills the base layout's open partial shard, the
  * global running total conserves tokens exactly, the batch-internal
  * prefix matches a first-principles local rebuild — and the
  * alternative (re-packing the grown corpus) would genuinely MOVE
  * already-written assignments, which is the instability the append
  * operator exists to avoid.
  */
class ShardAppendSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("append continues the open shard, conserves tokens, matches the local rebuild") {
    val full = Pipeline.shardPlan(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val baseTotal = full.filter(_._1 % 10 != 7).map(_._2).sum
    val app = Pipeline.shardAppend(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(app.nonEmpty && app.forall(_._1 % 10 == 7),
      "append covers exactly the arriving batch")
    // first-principles rebuild: batch docs in doc_id order, offsets
    // continuing at yesterday's corpus mass
    var cum = baseTotal
    app.sortBy(_._1).foreach { case (id, nt, cb, sid) =>
      assert(cb == cum, s"doc $id: cum_before $cb != local $cum")
      assert(sid == cum / 4096L, s"doc $id: shard_id")
      cum += nt
    }
    // conservation: the appended stream ends at the full corpus mass
    assert(cum == full.map(_._2).sum)
    // the first arrival fills the base's OPEN shard (append never
    // skips it, never rewrites a sealed one)
    assert(app.map(_._4).min == baseTotal / 4096L,
      s"first arrival must land in the open shard ${baseTotal / 4096L}")
  }

  test("re-packing the grown corpus would move sealed assignments — the instability append avoids") {
    // base-only packing = yesterday's sealed layout (the operator
    // never reads it; this derives it for the comparison)
    val baseOnly = {
      val toks = Pipeline.shardPlan(spark, dir).collect()
        .filter(_.getLong(0) % 10 != 7)
        .map(r => (r.getLong(0), r.getLong(1)))
      var cum = 0L
      toks.sortBy(_._1).map { case (id, nt) =>
        val sid = cum / 4096L; cum += nt; (id, sid)
      }.toMap
    }
    // the full re-pack (x_shard_plan over base+batch) interleaves
    // batch ids into the running total and renumbers downstream docs
    val repack = Pipeline.shardPlan(spark, dir).collect()
      .filter(_.getLong(0) % 10 != 7)
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    val moved = baseOnly.count { case (id, sid) => repack(id) != sid }
    assert(moved > 0,
      "fixture must demonstrate the re-pack instability (no base doc moved)")
  }
}

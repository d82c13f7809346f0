package graft.multimodal

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental media-dedup contract: linking the arriving batch
  * against the persisted frame index yields EXACTLY the pairs a full
  * from-scratch rebuild produces for the batch's slice — and the
  * incremental plan actually consumes the bucketed index layout
  * instead of re-shuffling the corpus-scale posting table.
  */
class MediaIncrSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet

  test("incremental pairs ≡ full rebuild restricted to batch; bucketed index plan") {
    val adir = Multimodal.ensureMediaPlanted(spark, dir).toString
    val full = rows(Multimodal.mediaNearDup(spark, adir)
      .filter(col("a_id") % 10 === 7 || col("b_id") % 10 === 7))
    val inc = Multimodal.incrMedia(spark, dir)
    val got = rows(inc)
    assert(got.nonEmpty,
      "planted corpus must give the batch genuine links (vacuous otherwise)")
    assert(got == full,
      s"incremental must equal the rebuild's batch slice: " +
        s"extra=${(got -- full).take(5)} missing=${(full -- got).take(5)}")
    // the posting side arrives bucketed on frame_md5: the group
    // aggregation must consume the layout, not re-exchange the index
    val p = inc.queryExecution.executedPlan.toString
    assert(p.contains("Bucketed: true"),
      "the frame index scan must be bucket-aware:\n" + p.take(2000))
    assert(!p.contains("Exchange hashpartitioning(frame_md5"),
      "the posting table must never re-shuffle on its bucket key:\n" + p.take(3000))
  }
}

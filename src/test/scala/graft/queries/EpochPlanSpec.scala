package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The epoch planner's arithmetic on a hand corpus where every number
  * is checkable by eye: even per-source targets, the exact
  * milli-epoch floor, the repeat ceiling binding on the scarce source
  * (and only there), and realized/deficit accounting.
  */
class EpochPlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("hand corpus: ceiling binds on the scarce source, exact milli-epochs elsewhere") {
    import spark.implicits._
    val dir = Files.createTempDirectory("epoch-").toString
    // masses 10 (scarce) and 90 (rich); T = 100, MULT = 4, even split
    // → target 200 per source. scarce: min(4000, 200·1000/10 = 20000)
    // = 4000 capped, realized 10·4000/1000 = 40, deficit 160.
    // rich: min(4000, 200000/90 = 2222) = 2222, realized
    // 90·2222/1000 = 199, deficit 1.
    val docs =
      (1 to 2).map(i => (i.toLong, "scarce", Seq.fill(5)(s"s$i").mkString(" "))) ++
        (11 to 19).map(i => (i.toLong, "rich", Seq.fill(10)(s"r$i").mkString(" ")))
    docs.toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = Pipeline.epochPlan(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got.keySet == Set("scarce", "rich"))
    //                    n_docs n_tok share   target epochs realized deficit
    assert(got("scarce") == ((2L, 10L, 100000L, 200L, 4000L, 40L, 160L)),
      got("scarce"))
    assert(got("rich") == ((9L, 90L, 900000L, 200L, 2222L, 199L, 1L)),
      got("rich"))
  }

  test("real fixture: both arms of the ceiling min are exercised") {
    val got = Pipeline.epochPlan(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(5)))
    assert(got.exists(_._2 == 4000L) && got.exists(_._2 < 4000L),
      s"cap must bind on some sources and not others: ${got.toSeq}")
  }
}

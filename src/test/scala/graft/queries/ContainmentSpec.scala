package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Directional containment (x_containment): a short doc embedded in a
  * much larger one is caught src→dst with full containment, is NOT
  * reported in the reverse direction, and pairs already above the
  * Jaccard near-dup cut (or below the min-evidence floor) stay out.
  */
class ContainmentSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** n distinct pseudo-random tokens (LCG — no accidental repeats of
    * the 3-gram shingle space across calls with different seeds). */
  private def toks(n: Int, seed: Int): Seq[String] = {
    var x = seed.toLong * 2654435761L + 1013904223L
    (0 until n).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      "w" + (x >>> 20).toHexString
    }
  }

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("containment-spec-").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'synthetic' AS source",
        "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("containmentPairs: embedded quote caught src→dst only; near-dups and tiny docs excluded") {
    val quote = toks(17, 1)                  // 15 shingles ≥ the floor
    val filler = toks(170, 2)                // host large enough that jaccard < 0.10
    val host = (quote ++ filler).mkString(" ")
    val docs = Seq(
      1L -> quote.mkString(" "),             // fully contained in 2
      2L -> host,
      3L -> toks(40, 3).mkString(" "),       // unrelated
      // 4 ≈ 2 (one word appended): a symmetric NEAR-DUP pair — shares
      // nearly all shingles with 2 but jaccard ≥ 0.10 keeps it out
      4L -> (host + " " + toks(1, 4).mkString),
      // 5: tiny (2 shingles) embedded in 3 — below the evidence floor
      5L -> toks(40, 3).take(4).mkString(" "))
    val dir = writeDocs(docs)
    val got = Pipeline.containmentPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // quote→host in BOTH hosts (2 and its near-twin 4), and nothing else:
    // no reverse direction, no near-dup pair (2,4), no under-floor doc 5
    assert(got.map(t => (t._1, t._2)).toSet === Set((1L, 2L), (1L, 4L)),
      s"unexpected pair set: ${got.toSeq}")
    for ((src, _, nSrc, nShared, contPpm, jacPpm) <- got) {
      assert(src == 1L && nSrc == 15L && nShared == 15L,
        s"quote must be fully contained: $nShared/$nSrc")
      assert(contPpm == 1000000L, s"containment must be exact 1.0: $contPpm")
      assert(jacPpm < 100000L, s"reported pair must be under the jaccard cut: $jacPpm")
    }
  }
}

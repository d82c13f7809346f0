package graft.queries

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.RepStripFunctions

/** The within-document repeated-span strip's contracts: the native
  * kernel ([[graft.functions.RepStripTokens]]) must equal the
  * composed higher-order-function form it replaces (the CdcSpec
  * kernel-parity discipline) on seeded random corpora and multibyte
  * text, and the query-level shapes — first-occurrence-keeps,
  * coverage overlap, pass-through, sub-span docs — are pinned on hand
  * fixtures a human can verify.
  */
class RepStripSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** The composed-builtins reference: flagged positions by pairwise
    * earlier-span comparison (O(spans²) — the form the kernel exists
    * to replace), coverage by membership test. Semantics must match
    * the kernel EXACTLY.
    */
  private def composedKept(w: Column): Column = {
    val sps = transform(sequence(lit(0), size(w) - 3),
      i => concat_ws(" ", slice(w, i + 1, lit(3))))
    val flagged = filter(sequence(lit(0), size(sps) - 1),
      i => exists(slice(sps, lit(1), i), x => x === element_at(sps, i + 1)))
    when(size(w) < 3, w).otherwise(
      filter(w, (t, j) => !exists(flagged,
        x => j.cast("long") >= x && j.cast("long") <= x + 2L)))
  }

  private def kernelKept(w: Column): Column =
    RepStripFunctions.repStrip(spark, w)

  test("kernel ≡ composed HOF form on seeded random corpora (repeats forced)") {
    import spark.implicits._
    val rnd = new Random(18)
    // tiny vocab → dense within-doc 3-gram repeats; lengths straddle
    // the sub-span boundary
    val vocab = Seq("a", "b", "c", "d")
    val docs = (1 to 300).map { id =>
      val n = rnd.nextInt(12) // 0..11 tokens incl. sub-span docs
      (id.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("w"))
      .select($"doc_id", kernelKept($"w").as("k"), composedKept($"w").as("c"))
      .filter(not($"k" <=> $"c"))
    assert(df.count() == 0, "kernel diverged from the composed form: " +
      df.take(5).mkString("; "))
  }

  test("kernel ≡ composed on multibyte text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "日本 語 の 日本 語 の 日本 語 の"),
      (2L, "ü ü ü ü ü ü"),
      (3L, "α β γ α β γ δ"))
    val df = docs.toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("w"))
      .select($"doc_id", kernelKept($"w").as("k"), composedKept($"w").as("c"))
      .filter(not($"k" <=> $"c"))
    assert(df.count() == 0)
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (String, Long)] = {
    import spark.implicits._
    val dir = Files.createTempDirectory("repstrip-").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    Pipeline.repStrip(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
  }

  test("hand shapes: first occurrence keeps, repeats cut, overlap covered") {
    val got = run(Seq(
      // repeat at the tail: spans p0..p5 of 9 tokens; p6="a b c"
      // repeats p0 → tokens 6..8 cut
      (1L, "a b c d e f a b c"),
      // all-same: every span repeats span 0 → tokens 1..5 covered,
      // only token 0 survives
      (2L, "a a a a a a"),
      // overlap: "x y z x y z x y z" — p3 and p6 repeat p0, p4/p7
      // repeat p1, p5 repeat p2 → everything from 3 on covered
      (3L, "x y z x y z x y z"),
      // no repeats → ORIGINAL text through (double space preserved:
      // pass-through must not round-trip through split/join)
      (4L, "p q  r s"),
      // sub-span: under 3 tokens, no spans
      (5L, "t u"),
      (6L, "")))
    assert(got(1L) == (("a b c d e f", 3L)), got(1L))
    assert(got(2L) == (("a", 5L)), got(2L))
    assert(got(3L) == (("x y z", 6L)), got(3L))
    assert(got(4L) == (("p q  r s", 0L)), got(4L))
    assert(got(5L) == (("t u", 0L)), got(5L))
    assert(got(6L) == (("", 0L)), got(6L))
  }

  test("within-doc only: cross-document duplicates are untouched (spanStrip's domain)") {
    val got = run(Seq(
      (1L, "m n o p q"),
      (2L, "m n o p q"))) // exact cross-doc copy, no WITHIN-doc repeat
    assert(got(1L) == (("m n o p q", 0L)))
    assert(got(2L) == (("m n o p q", 0L)))
  }

  test("null token elements participate as empty strings, never crash") {
    import spark.implicits._
    val out = Seq(1L).toDF("doc_id")
      .select(kernelKept(
        expr("array('a', CAST(NULL AS STRING), 'b', 'a', NULL, 'b')")).as("k"))
      .head().getSeq[String](0)
    // spans: p0="a  b" (null→empty), p3 would need 6 tokens: p0..p3;
    // p3="a  b" repeats p0 → tokens 3..5 cut
    assert(out == Seq("a", "", "b"), out)
  }
}

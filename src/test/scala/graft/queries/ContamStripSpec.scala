package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The decontamination strip's contracts: the quoted benchmark window
  * is cut with its flanks kept, clean docs pass their original text
  * through, BOILERPLATE (over-df-cap) shingles strip nothing (the
  * audit's kept-universe semantics), benchmark docs are never
  * rewritten, and on a real corpus the strip touches EXACTLY the
  * audit's contaminated doc set (transform ≡ audit scope, by
  * construction of the shared kept-shingle universe).
  */
class ContamStripSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("quoted benchmark window cut, flanks kept; clean doc untouched; benchmark doc not rewritten") {
    import spark.implicits._
    val dir = Files.createTempDirectory("contam-strip-").toString
    val docs = Seq(
      // benchmark doc (id % 50 == 0): the protected sentence
      (50L, "the secret eval answer here"),
      // training doc quoting a benchmark 3-gram ("secret eval answer"
      // at positions 2-4): flagged positions 2,3 → wait: spans
      // "secret eval answer" (p2) and "eval answer here" (p3) both
      // occur in the benchmark → tokens 2..5 cut, flanks kept
      (1L, "intro words secret eval answer here outro"),
      // clean training doc — original text through (double space kept)
      (2L, "totally unrelated  content words"),
      // another clean one under 3 tokens
      (3L, "too short"))
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = Pipeline.contamStrip(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // benchmark doc is NOT in the output
    assert(!got.contains(50L))
    // doc 1: spans p2="secret eval answer", p3="eval answer here" are
    // benchmark shingles → coverage 2..5; "intro words" + "outro" kept
    assert(got(1L) == (("intro words outro", 4L)), got(1L))
    assert(got(2L) == (("totally unrelated  content words", 0L)))
    assert(got(3L) == (("too short", 0L)))
  }

  test("boilerplate (over-cap) shingles strip nothing — the audit's kept universe") {
    import spark.implicits._
    val dir = Files.createTempDirectory("contam-boiler-").toString
    // one shingle ("cookie banner text") carried by 101 training docs
    // (> SHINGLE_DF_CAP = 100) AND present in the benchmark doc: the
    // df cap removes it from the kept universe, so no carrier loses it
    val carriers = (1 to 101).map { i =>
      val id = if (i * 7 % 50 == 0) i * 7 + 1 else i * 7 // avoid % 50 == 0
      (id.toLong, s"cookie banner text filler$i")
    }
    val docs = Seq((100L, "cookie banner text plus eval")) ++ carriers
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = Pipeline.contamStrip(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.values.sum == 0L,
      s"over-cap boilerplate must never be stripped: removed ${got.filter(_._2 > 0)}")
  }

  test("on the real corpus the strip touches exactly the audit's contaminated docs") {
    val dir = "/root/testdata/sf0.001"
    val audited = Pipeline.contamination(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val stripped = Pipeline.contamStrip(spark, dir).collect()
      .filter(_.getLong(2) > 0L).map(_.getLong(0)).toSet
    assert(audited.nonEmpty, "fixture must carry real contamination signal")
    assert(stripped == audited,
      s"transform scope must equal audit scope: strip-only=${(stripped -- audited).take(5)} audit-only=${(audited -- stripped).take(5)}")
  }
}

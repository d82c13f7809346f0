package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** The per-row [[graft.functions.SimHash64]] expression and the batch
  * `x_simhash` aggregation (explode + 64 vote sums) must be ONE
  * fingerprint definition: the streaming near-dup gate keys on the
  * per-row form, the batch dedup family on the aggregate form, and a
  * bit of divergence would let a document pass the stream and then
  * near-dup-match in the nightly batch (or vice versa). Checked over
  * every fixture document with shingles, plus the hand-checkable
  * edge shapes.
  */
class SimHashParitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-row SimHash64 equals the batch x_simhash aggregation on the fixture") {
    import spark.implicits._
    val batch = graft.SparkEntry.queries("x_simhash")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sh = Pipeline.shingleCol(Pipeline.words($"text"))
    val perRow = graft.Tables(spark, dir, "documents")
      .select($"doc_id", sh.as("shingles"))
      .filter(size($"shingles") >= 1)
      .select($"doc_id",
        graft.functions.VectorFunctions.simhash64(spark, $"shingles").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow.keySet === batch.keySet,
      "both forms must fingerprint exactly the docs that have shingles")
    val diff = perRow.collect { case (id, fp) if batch(id) != fp => id }
    assert(diff.isEmpty, s"fingerprints diverge for doc_ids: ${diff.take(5)}")
    assert(perRow.nonEmpty)
  }

  test("SimHash64 edge shapes: empty array is 0, null element is null, SQL-callable") {
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_simhash64(CAST(array() AS ARRAY<STRING>)) AS empty,
        |  graft_simhash64(array('a b c', CAST(NULL AS STRING))) AS withnull,
        |  graft_simhash64(array('a b c')) AS one
        |""".stripMargin).head()
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1))
    // a single shingle votes its own md5 bits: fingerprint = lo | hi<<32
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c".getBytes("UTF-8"))
    val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val lo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    assert(r.getLong(2) === (lo | (hi << 32)))
  }
}

package graft.queries

import java.nio.file.Files

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** [[Tables.events]] must read the SAME instants from every timestamp
  * encoding the fixture has shipped with — the unit changed between
  * fixture generations (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)) and the
  * loader keying on an assumed unit silently shifted every event by
  * 1000× once. One fixture per encoding, same wall-clock instants,
  * loader output compared value-for-value.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // three instants with sub-second parts, as microseconds since epoch
  private val micros = Seq(
    1704067432824425L, // 2024-01-01 00:03:52.824425
    1704117098789038L, // 2024-01-01 13:51:38.789038
    1704153599000001L) // 2024-01-01 23:59:59.000001

  private def writeFixture(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, 100L + i, "click", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadedMicros(dir: String): Seq[Long] =
    Tables(spark, dir, "events")
      .orderBy(col("event_id"))
      .select(unix_micros(col("ts").cast(TimestampType)))
      .collect().map(_.getLong(0)).toSeq

  test("micros-encoded fixture (current generation) reads exact instants") {
    val dir = Files.createTempDirectory("graft-events-us").toString
    writeFixture(dir, timestamp_micros(col("us")))
    assert(loadedMicros(dir) == micros)
  }

  test("ntz-encoded fixture (tz-naive writer) reads exact instants under UTC") {
    val dir = Files.createTempDirectory("graft-events-ntz").toString
    writeFixture(dir, timestamp_micros(col("us")).cast(TimestampNTZType))
    assert(loadedMicros(dir) == micros)
  }

  test("raw-int64 nanos fixture (legacy generation) engages the div-1000 fallback") {
    val dir = Files.createTempDirectory("graft-events-ns").toString
    // plain long column named ts: schema inference yields LongType, the
    // loader's non-timestamp branch — exactly how the NANOS-logical
    // fixtures read through the explicit long schema
    writeFixture(dir, (col("us") * 1000L).as("ts"))
    assert(loadedMicros(dir) == micros)
  }

  test("TIMESTAMP(NANOS)-annotated fixture (checked-in pyarrow file) reads exact instants") {
    // a genuine ns-logical-type footer — Spark cannot write one, so the
    // resource was generated with pyarrow; inference rejects it with
    // [PARQUET_TYPE_ILLEGAL] and the loader must take the long-schema
    // fallback, not swallow an unrelated error
    val dir = getClass.getResource("/events-ns").getPath
    assert(loadedMicros(dir) == micros)
  }

  test("micros/NTZ fixtures read the same instants under a non-UTC session timezone") {
    // the loader promises to work from any caller's session: a naive
    // NTZ→Timestamp cast would shift instants by the session offset,
    // so pin the read against a deliberately non-UTC zone
    val dir = Files.createTempDirectory("graft-events-tz").toString
    writeFixture(dir, timestamp_micros(col("us")).cast(TimestampNTZType))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(loadedMicros(dir) == micros)
      assert(loadedMicros(getClass.getResource("/events-ns").getPath) == micros)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}

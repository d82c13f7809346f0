package graft.sink

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamingShardSink

/** Regressions from the sink/streaming review pass: writeRows' slow
  * path must actually widen (the doc's promise), the two size
  * estimators must agree on container types with null elements, and
  * the streaming sink's resume path must refuse the configuration
  * that would silently delete an existing dataset.
  */
class SinkHardeningSpec extends AnyFunSuite with BeforeAndAfterEach {

  private lazy val spark = TestSpark.spark

  private var tmp: Path = _
  override def beforeEach(): Unit = { tmp = Files.createTempDirectory("graft-hard-spec") }
  override def afterEach(): Unit = {
    import java.util.Comparator
    if (Files.exists(tmp)) {
      val s = Files.walk(tmp)
      val paths = try s.sorted(Comparator.reverseOrder[Path]())
        .iterator.asScala.toSeq finally s.close()
      paths.foreach(Files.deleteIfExists(_))
    }
  }

  private val idVal = StructType(Seq(
    StructField("id", LongType), StructField("value", StringType)))

  test("writeRows widens narrower JVM numerics through the cast path") {
    val out = tmp.resolve("widen.parquet")
    val sink = new ParquetStreamSink(spark, out, idVal)
    // Integer where LongType is declared — conformance fails, and the
    // old slow path (createDataFrame with the TARGET schema) died with
    // a ClassCastException instead of widening as documented
    sink.writeRows(Seq(Row(java.lang.Integer.valueOf(1), "a"),
      Row(java.lang.Long.valueOf(2L), "b"), // mixed widths in one column
      Row(null, "c")))
    sink.close()
    val got = spark.read.parquet(out.toString)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (-1L, "c")))
  }

  test("writeRows casts parseable strings and raises on invalid ones") {
    val out = tmp.resolve("cast.parquet")
    val sink = new ParquetStreamSink(spark, out, idVal)
    sink.writeRows(Seq(Row("123", "a"))) // StringType source → ANSI cast to long
    sink.close()
    assert(spark.read.parquet(out.toString).collect().map(_.getLong(0)).toSeq == Seq(123L))
    val sink2 = new ParquetStreamSink(spark, tmp.resolve("bad.parquet"), idVal)
    intercept[Exception] { sink2.writeRows(Seq(Row("not-a-number", "x"))); sink2.close() }
  }

  /** The lockstep invariant, on the container shapes that diverged:
    * null elements inside arrays (a single null once nulled the whole
    * aggregate → 4-byte arrays → oversized shards), binary-element
    * arrays, and maps (both previously priced at a constant).
    */
  test("ColumnarSizeExpr matches ColumnarSize on containers with nulls") {
    val schema = StructType(Seq(
      StructField("tags", ArrayType(StringType, containsNull = true)),
      StructField("nums", ArrayType(LongType, containsNull = true)),
      StructField("blobs", ArrayType(BinaryType, containsNull = true)),
      StructField("attrs", MapType(StringType, StringType, valueContainsNull = true))))
    val row = Row(
      Seq("hello", null, "world"),
      Seq(1L, null, 3L),
      Seq(Array[Byte](1, 2, 3), null),
      Map("k1" -> "v1", "k2" -> null))
    val expected = ColumnarSize.ofRow(row, schema)
    val df = spark.createDataFrame(
      java.util.List.of(row), schema)
    val got = df.select(ColumnarSizeExpr.rowBytes(schema).as("b"))
      .head().getLong(0)
    assert(got == expected,
      s"expression estimate $got != driver estimate $expected")
    assert(got > 4 * 4, "container bytes must reflect element data, not stubs")
  }

  test("streaming resume refuses a shard-bearing dir with no commit log") {
    val out = tmp.resolve("lost-log")
    Files.createDirectory(out)
    Files.write(out.resolve("lost-log-0.parquet"), Array[Byte](1))
    val e = intercept[IllegalStateException] {
      new StreamingShardSink(out, idVal, shardSizeBytes = 1024, resume = true)
    }
    assert(e.getMessage.contains("refusing to resume"))
  }

  test("streaming restore drops a torn trailing commit-log line") {
    import spark.implicits._
    val out = tmp.resolve("torn")
    Files.createDirectory(out)
    // batch 0 committed (2 files); batch 1's append was torn mid-line
    Files.write(out.resolve("_graft_commits.tsv"),
      "0\t0\t2\n1\t2\t".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.write(out.resolve("torn-0.parquet"), Array[Byte](1))
    Files.write(out.resolve("torn-1.parquet"), Array[Byte](1))
    val sink = new StreamingShardSink(out, idVal, shardSizeBytes = 1024, resume = true)
    // the torn batch was never acknowledged: its replay must WRITE
    val df = Seq((10L, "x")).toDF("id", "value")
    sink.addBatch(df.withColumn("value", lit("x")), batchId = 1L)
    assert(sink.writtenFiles.size > 2, "torn batch must replay, not be skipped")
    // and batch 0 stays committed: replaying it is a no-op
    val before = sink.writtenFiles.size
    sink.addBatch(df, batchId = 0L)
    assert(sink.writtenFiles.size == before)
  }

  /** Restore must TRUNCATE a torn fragment on disk, not just skip it
    * in memory: appendCommit O_APPENDs, so a surviving fragment merges
    * with the next record into one line — and the restart AFTER that
    * either throws on the malformed line or silently restores a bogus
    * (batchId, startIndex) pair, skipping an uncommitted batch.
    */
  test("second restart after a torn-line replay restores cleanly") {
    import spark.implicits._
    val out = tmp.resolve("torn2")
    Files.createDirectory(out)
    Files.write(out.resolve("_graft_commits.tsv"),
      "0\t0\t2\n1\t2\t".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.write(out.resolve("torn2-0.parquet"), Array[Byte](1))
    Files.write(out.resolve("torn2-1.parquet"), Array[Byte](1))
    val sink = new StreamingShardSink(out, idVal, shardSizeBytes = 1024, resume = true)
    val df = Seq((10L, "x")).toDF("id", "value")
    sink.addBatch(df, batchId = 1L) // appends onto wherever the log ends
    val filesAfterReplay = sink.writtenFiles.size
    // the crash-restart after the replay: every committed record must
    // parse, batch 1 must now be committed, and the counter must match
    val sink2 = new StreamingShardSink(out, idVal, shardSizeBytes = 1024, resume = true)
    assert(sink2.writtenFiles.size == filesAfterReplay,
      s"restored ${sink2.writtenFiles.size} shards, wrote $filesAfterReplay")
    val before = sink2.writtenFiles.size
    sink2.addBatch(df, batchId = 1L) // committed → no-op
    assert(sink2.writtenFiles.size == before, "batch 1 must stay committed")
  }
}

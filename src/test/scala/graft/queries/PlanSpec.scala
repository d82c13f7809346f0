package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-shape regression checks: the properties that make these
  * queries survive a 100× scale-up are visible in the physical plan —
  * pin them so a refactor can't silently lose pushdown, pruning, or a
  * broadcast. (Spark version is pinned by the build, so plan strings
  * are stable.)
  */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("q_pricing_summary: filter pushed into the parquet scan") {
    val p = plan("q_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      "expected l_shipdate pushdown in:\n" + p.take(2000))
  }

  test("q_pricing_summary: scan is column-pruned (no l_orderkey read)") {
    val p = plan("q_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"),
      "pricing summary must not read join keys: " + readSchema)
  }

  test("q_join_orders: dimension joins broadcast, not shuffled") {
    val p = plan("q_join_orders")
    assert(p.contains("BroadcastHashJoin"), "expected BHJ in:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "dimension joins must not sort-merge at this scale")
  }

  test("x_sim_search: 1-row query side broadcast + top-k without global sort") {
    val p = plan("x_sim_search")
    assert(p.contains("BroadcastExchange"))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be TakeOrderedAndProject, not Sort+Limit:\n" + p.take(2000))
  }

  test("x_ann_ivf: learned-cell assignment is a projection — no assignment shuffle joins") {
    val p = plan("x_ann_ivf")
    // the per-row cell comes from the collected codebook (a plan
    // constant), so the only join is the broadcast 1-row query probe —
    // a SortMergeJoin here means the assignment regressed to a
    // corpus-keyed join against a cells table
    assert(p.contains("BroadcastExchange"),
      "query probe must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "learned-cell assignment must not shuffle the corpus:\n" + p.take(2000))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be TakeOrderedAndProject:\n" + p.take(2000))
  }

  test("x_edit_verify: candidates broadcast into the text probes — no corpus shuffle join") {
    val p = plan("x_edit_verify")
    assert(p.contains("BroadcastHashJoin"),
      "bounded candidate set must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "text lookups must stay map-side probes:\n" + p.take(2000))
  }

  test("x_bpe_segment: bounded vocab broadcasts into the corpus token pass") {
    val p = plan("x_bpe_segment")
    assert(p.contains("BroadcastHashJoin"),
      "the post-merge vocab must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "segmentation must not shuffle the corpus:\n" + p.take(2000))
  }

  test("x_ann_ivf_pruned: partition pruning reaches the scan") {
    val p = plan("x_ann_ivf_pruned")
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("cell"),
      "expected PartitionFilters on the learned cell, got: " + scanLine)
  }

  test("x_bm25_batch: corpus consumed once — scoring plan reads the posting checkpoint") {
    val p = plan("x_bm25_batch")
    // the documents scan happens exactly once, INTO the posting
    // checkpoint; a corpus file scan in the scoring plan means the
    // df/scoring consumers each replayed it (2× the dominant cost)
    assert(!p.contains("documents"),
      "scoring plan must not rescan the corpus:\n" + p.take(2000))
    assert(p.contains("WindowGroupLimit"),
      "per-query top-10 must apply map-side:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "index-metadata joins must broadcast, not sort-merge")
  }

  test("x_chunk_clean: no window over the hot chunk hash") {
    val p = plan("x_chunk_clean")
    // keep-first must stay groupBy-min + join: a window partitioned by
    // chunk_hash sorts every copy of a billion-repeat boilerplate
    // chunk in one task (the chunkDedup rationale, pinned here too)
    assert(!p.contains("Window"),
      "chunk keep-first must not be a window over chunk_hash:\n" + p.take(2000))
  }

  test("x_media_neardup: no exchange carries a binary payload") {
    // payloads are consumed inside the scans (hash pass + slice
    // pass); only (asset_id, checksum) projections may shuffle — a
    // payload crossing an exchange re-ships the whole corpus per join
    val fmt = graft.SparkEntry.queries("x_media_neardup")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val sections = fmt.split("\n\n")
    val exchanges = sections.filter(_.matches("(?s).*\\(\\d+\\) Exchange\\b.*"))
    assert(exchanges.nonEmpty, "expected Exchange nodes in:\n" + fmt.take(2000))
    val offending = exchanges.filter(sec =>
      sec.linesIterator.exists(l =>
        l.startsWith("Input") && "\\bpayload#".r.findFirstIn(l).isDefined))
    assert(offending.isEmpty,
      "an exchange ships a binary payload:\n" + offending.mkString("\n\n"))
  }

  test("x_chunk_clean: no exchange carries the document text") {
    // carrying `text` through the chunk explode/join/rebuild ships
    // n_chunks copies of every document (O(n_chunks × doc_len) shuffle
    // amplification — a 100k-token doc would ship ~3k copies of
    // itself); only its LENGTH may ride. Formatted explain lists each
    // Exchange node's Input attributes — none may be the bare `text`
    // column (kept_text / ctext / cleaned_text are chunk-bounded and
    // allowed; \btext# cannot match inside those names).
    val fmt = graft.SparkEntry.queries("x_chunk_clean")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val sections = fmt.split("\n\n")
    val exchanges = sections.filter(_.matches("(?s).*\\(\\d+\\) Exchange\\b.*"))
    assert(exchanges.nonEmpty, "expected Exchange nodes in:\n" + fmt.take(2000))
    val offending = exchanges.filter(sec =>
      sec.linesIterator.exists(l =>
        l.startsWith("Input") && "\\btext#".r.findFirstIn(l).isDefined))
    assert(offending.isEmpty,
      "an exchange ships the full document text:\n" + offending.mkString("\n\n"))
  }

  test("x_cdc_dedup: no exchange carries the document text; window runs on the aggregate") {
    // CDC chunking is per-row map-side work; only (doc_id, source,
    // chunk_id, n_chars, chunk_hash) may reach the hash groupBy —
    // text crossing an exchange would ship n_chunks copies of every
    // document. The canonical-instance window must consume the
    // (chunk_hash, source) AGGREGATE (partitions bounded by the source
    // domain), never raw chunk instances — a billion-repeat
    // boilerplate chunk must collapse map-side before any window sort.
    val fmt = graft.SparkEntry.queries("x_cdc_dedup")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val sections = fmt.split("\n\n")
    val exchanges = sections.filter(_.matches("(?s).*\\(\\d+\\) Exchange\\b.*"))
    assert(exchanges.nonEmpty, "expected Exchange nodes in:\n" + fmt.take(2000))
    val offending = exchanges.filter(sec =>
      sec.linesIterator.exists(l =>
        l.startsWith("Input") && "\\btext#".r.findFirstIn(l).isDefined))
    assert(offending.isEmpty,
      "an exchange ships the full document text:\n" + offending.mkString("\n\n"))
    val windows = sections.filter(_.matches("(?s).*\\(\\d+\\) Window\\b.*"))
    assert(windows.nonEmpty, "expected the canonical-instance Window in:\n" + fmt.take(2000))
    assert(windows.forall(sec => sec.linesIterator.exists(l =>
      l.startsWith("Input") && "\\bcnt#".r.findFirstIn(l).isDefined)),
      "the window must run on the (chunk_hash, source) aggregate, not instances:\n" +
        windows.mkString("\n\n"))
  }

  test("x_kmeans_converge: every round is a broadcast E-step, never a corpus sort-merge") {
    val p = plan("x_kmeans_converge")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj >= 3, s"expected ≥3 broadcast E-steps (one per round), got $bnlj")
    assert(!p.contains("SortMergeJoin"),
      "centroids are cells×1 metadata and must broadcast:\n" + p.take(2000))
  }

  test("x_ann_ivf_nprobe: the nprobe cell filter prunes partitions") {
    val p = plan("x_ann_ivf_nprobe")
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    // the IN (cell1, cell2, cell3) probe list must reach the scan as a
    // partition filter — at 100 TB this is the difference between a
    // 3-directory listing and a full-corpus file walk
    assert(scanLine.contains("cell") && scanLine.contains("IN"),
      "expected PartitionFilters cell IN (probed cells), got: " + scanLine)
  }

  test("q_local_supplier: one fact-fact shuffle join, all dims broadcast") {
    val p = plan("q_local_supplier")
    // lineitem ⋈ orders may shuffle (SMJ/shuffled-hash); the four
    // dimension joins must all be broadcast
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 4, s"expected ≥4 broadcast joins, got $bhj in:\n" + p.take(1500))
  }

  test("x_embed_outliers: centroid side broadcast, top-k without global sort") {
    val p = plan("x_embed_outliers")
    assert(p.contains("BroadcastHashJoin"), "expected BHJ in:\n" + p.take(2000))
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must be TakeOrderedAndProject:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "cells × 1 centroid rows must broadcast:\n" + p.take(2000))
  }

  test("LSH band cap: applied map-side (WindowGroupLimit) with exchange reuse") {
    for (name <- Seq("x_minhash_lsh", "x_simhash_pairs", "x_minhash_est")) {
      val p = plan(name)
      // the BAND_CAP row_number filter must compile to WindowGroupLimit
      // with a PARTIAL pass BEFORE the band shuffle — each map task
      // keeps only its own top-cap per band group, so a degenerate band
      // never shuffles more than cap × tasks rows
      assert(p.contains("WindowGroupLimit"),
        s"$name: band cap must plan as WindowGroupLimit:\n" + p.take(2000))
      assert("WindowGroupLimit \\[band_idx.*row_number\\(\\), 100, Partial".r
        .findFirstIn(p).isDefined,
        s"$name: expected a map-side (Partial) WindowGroupLimit at 100")
      // the band-group collect_list must reuse the window's
      // (band_idx, band) partitioning — exactly one band exchange
      val bandExchanges = "Exchange hashpartitioning\\(band_idx".r.findAllIn(p).length
      assert(bandExchanges == 1,
        s"$name: expected 1 band exchange (window+groupBy fused), got $bandExchanges")
    }
  }

  test("x_stratified_sample: per-stratum top-k applied map-side, text never read") {
    val p = plan("x_stratified_sample")
    // rank ≤ k must run as a Partial WindowGroupLimit before the lang
    // shuffle: a billion-document stratum ships k × tasks rows, not
    // its full population
    assert("WindowGroupLimit \\[lang.*row_number\\(\\), 20, Partial".r
      .findFirstIn(p).isDefined,
      "expected map-side WindowGroupLimit at 20 in:\n" + p.take(2000))
    // the sample is (doc_id, lang)-only: the wide text column must be
    // pruned out of the scan entirely
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"),
      "stratified sample must not read document text: " + readSchema)
  }

  test("q_lateral_topn: decorrelates to broadcast join + WindowGroupLimit") {
    val p = plan("q_lateral_topn")
    // the LIMIT-ed lateral subquery must decorrelate — not re-execute
    // per outer row — into a broadcast of the dimension side and a
    // map-side-bounded per-key top-k
    assert(p.contains("BroadcastHashJoin"),
      "expected broadcast dimension join in:\n" + p.take(2000))
    assert("WindowGroupLimit .*row_number\\(\\), 2".r.findFirstIn(p).isDefined,
      "expected WindowGroupLimit at 2 in:\n" + p.take(2000))
  }

  test("x_top_ngrams: global top-k runs as TakeOrderedAndProject, not a full sort") {
    val p = plan("x_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"),
      "expected TakeOrderedAndProject in:\n" + p.take(2000))
  }

  test("x_chunk_windows: pure per-row explode — no shuffle before the output sort") {
    val p = plan("x_chunk_windows")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 0,
      s"chunking must not shuffle (got $hashExchanges hash exchanges):\n" + p.take(2000))
  }

  test("x_token_rarity: one linear pass — map-side df cap, single token exchange") {
    val p = plan("x_token_rarity")
    // the df cap must run as a Partial WindowGroupLimit at cap+1: a
    // stopword's occurrences are cut to cap+1 per task BEFORE the
    // shuffle, so its true population never crosses the wire
    assert("WindowGroupLimit \\[t.*row_number\\(\\), 101, Partial".r
      .findFirstIn(p).isDefined,
      "expected map-side WindowGroupLimit at 101 in:\n" + p.take(2000))
    // the df aggregate must reuse the window's hash partitioning on t —
    // exactly one token exchange, and no second corpus-token scan (the
    // old formulation's shared subtrees scanned the tokens twice)
    val tokExchanges = "Exchange hashpartitioning\\(t#".r.findAllIn(p).length
    assert(tokExchanges == 1,
      s"expected 1 token exchange (window+groupBy fused), got $tokExchanges")
    val docScans = "documents\\.parquet".r.findAllIn(p).length
    assert(docScans <= 2,
      s"expected ≤2 documents scans (token pipeline + doc_id join side), got $docScans")
  }

  test("x_tfidf_terms: linear token pass — map-side df cap and map-side top-k") {
    val p = plan("x_tfidf_terms")
    // same bound as x_token_rarity: the df cap cuts each token to
    // cap+1 rows per task BEFORE the token shuffle
    assert("WindowGroupLimit \\[t.*row_number\\(\\), 101, Partial".r
      .findFirstIn(p).isDefined,
      "expected map-side WindowGroupLimit at 101 in:\n" + p.take(2000))
    // the per-doc top-3 must also bound map-side — a doc with a
    // million rare terms ships 3 × tasks rows, not a million
    assert("WindowGroupLimit \\[doc_id.*row_number\\(\\), 3".r
      .findFirstIn(p).isDefined,
      "expected WindowGroupLimit at 3 in:\n" + p.take(2000))
    // one linear pipeline: the corpus tokens are scanned exactly once
    val docScans = "documents\\.parquet".r.findAllIn(p).length
    assert(docScans == 1, s"expected 1 documents scan, got $docScans")
  }

  test("x_pq_codes: codebook joins broadcast, corpus never sort-merges") {
    val p = plan("x_pq_codes")
    assert(p.contains("BroadcastHashJoin"),
      "expected broadcast codebook join in:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "cells × M codebook rows must broadcast, not shuffle the corpus")
  }

  test("x_ann_pq: one corpus scan, broadcast lookups, top-k without global sort") {
    val p = plan("x_ann_pq")
    assert(p.contains("TakeOrderedAndProject"),
      "expected TakeOrderedAndProject in:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"))
    // codebook + query table are driver-built index metadata; the
    // executed plan touches the embeddings exactly once
    val scans = "embeddings\\.parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 embeddings scan, got $scans")
  }

  test("x_corpus_manifest: consumes the edge-graph artifact, never re-derives it") {
    val p = plan("x_corpus_manifest")
    // the near-dup edges come from the ensureEdgeGraph parquet (read
    // behind connectedComponents' checkpoints) — none of the PAIR
    // pipelines' banded machinery may appear in the manifest's own
    // plan. (The novelty stage's shingle anti-join is fine: that is a
    // batch-sized ingest stage of the manifest itself, not a pair
    // pipeline — its cost scales with the batch slice, not corpus².)
    assert(!p.contains("band_idx"),
      "manifest must not re-derive the pair pipelines:\n" + p.take(2000))
  }

  test("x_ann_recall: 10-row audit joins all broadcast") {
    val p = plan("x_ann_recall")
    assert(!p.contains("SortMergeJoin"),
      "top-10 result joins must broadcast:\n" + p.take(2000))
  }

  test("x_kmeans_iter: centroids broadcast into the corpus scan, argmin partial-aggs") {
    val p = plan("x_kmeans_iter")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "E-step must broadcast the cells-sized centroid table:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "the corpus must never sort-merge against centroids:\n" + p.take(2000))
    // partial_min before the vec_id exchange collapses the ×cells
    // fan-out map-side
    assert(p.contains("partial_min") || p.contains("partial min"),
      "argmin must partial-aggregate map-side:\n" + p.take(4000))
  }

  test("x_hash_sample: deterministic sampling filter evaluates scan-side") {
    val p = plan("x_hash_sample")
    // the filter sits directly over the scan — no shuffle before it
    val filterIdx = p.indexOf("Filter")
    val exchangeIdx = p.indexOf("Exchange")
    assert(filterIdx >= 0)
    assert(exchangeIdx < 0 || filterIdx > exchangeIdx,
      "sample filter must run before any exchange")
  }

  test("q_range_join: non-equi band lookup broadcasts, fact side never shuffles pre-join") {
    val p = plan("q_range_join")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "interval lookup against k bands must be a broadcast NLJ:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "band join must not plan as a cartesian product:\n" + p.take(2000))
  }

  test("x_shard_plan: global running total never serializes corpus rows through one task") {
    val p = plan("x_shard_plan")
    // the scan tree's whole point: corpus rows meet only b1-partitioned
    // windows; exactly ONE SinglePartition exchange exists — the top
    // level over the per-super-bucket totals (N / FANOUT² rows)
    val single = "Exchange SinglePartition".r.findAllIn(p).length
    assert(single == 1,
      s"expected exactly 1 tiny top-level SinglePartition exchange, got $single:\n" + p.take(3000))
    // row-level windows are partitioned by the scan-tree bucket
    assert("Window .*windowspecdefinition\\(b1#".r.findFirstIn(p).isDefined,
      "row-level running sum must partition by b1:\n" + p.take(3000))
  }

  test("x_rep_strip: row-local transform — one documents scan, no join, only the output sort exchanges") {
    val p = plan("x_rep_strip")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 documents scan, got $scans:\n" + p.take(2000))
    assert(!p.contains("Join"), "the strip must not join:\n" + p.take(2000))
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 1,
      s"only the presentation range sort may exchange, got $exchanges:\n" + p.take(2000))
  }

  test("x_source_cap: bounded per-source rates broadcast into a map-side verdict") {
    val p = plan("x_source_cap")
    assert(p.contains("BroadcastHashJoin"),
      "the source-rate table must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "the verdict must never shuffle the corpus on source:\n" + p.take(2000))
    // the one text pass happened at the checkpointed narrow frame —
    // the final plan reads no documents scan (the x_quality_calibration
    // one-pass discipline)
    assert(!p.contains("Scan parquet"),
      "final plan must ride the checkpointed narrow frame:\n" + p.take(2000))
  }

  test("x_epoch_schedule: broadcast plan join + uniform-key tree — the expanded stream never meets a single-task window") {
    val p = plan("x_epoch_schedule")
    // every SinglePartition exchange in this plan is BOUNDED: the
    // epoch plan's source-domain OVER() windows (≤ n_src rows, once
    // per tree branch — the prefix tree reads its input twice) and
    // the tree's global super-bucket window (≤ 1024 totals). The
    // corpus-scale expanded stream itself only ever meets the
    // b1-partitioned running sum. Pin the exact census so a new
    // unbounded global window cannot hide among the known tiny ones.
    val single = "Exchange SinglePartition".r.findAllIn(p).length
    assert(single == 4,
      s"expected the 4 known bounded SinglePartition exchanges, got $single:\n" + p.take(3000))
    assert("Window .*windowspecdefinition\\(b1#".r.findFirstIn(p).isDefined,
      "per-copy running sum must partition by b1:\n" + p.take(3000))
    assert(p.contains("BroadcastHashJoin"),
      "the source-domain plan must broadcast onto the text pass:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "nothing corpus-scale may shuffle-join:\n" + p.take(2000))
  }

  test("x_shard_shuffle: uniform-key scan tree — corpus rows never meet a single-task window") {
    val p = plan("x_shard_shuffle")
    val single = "Exchange SinglePartition".r.findAllIn(p).length
    assert(single == 1,
      s"expected exactly 1 tiny top-level SinglePartition exchange, got $single:\n" + p.take(3000))
    assert("Window .*windowspecdefinition\\(b1#".r.findFirstIn(p).isDefined,
      "row-level running sum must partition by b1:\n" + p.take(3000))
  }

  test("x_ann_ivfpq: pruned probe scan, broadcast index metadata, top-k without global sorts") {
    val p = plan("x_ann_ivfpq")
    assert(p.contains("PartitionFilters: [cell"),
      "the candidate scan must prune to the probed cells:\n" + p.take(3000))
    assert(p.contains("BroadcastExchange"),
      "codebook/query-table/pool must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "nothing corpus-scale may shuffle-join:\n" + p.take(2000))
    assert(p.contains("TakeOrderedAndProject"),
      "pool cut and final top-k must be TakeOrderedAndProject:\n" + p.take(2000))
  }

  test("x_cap_gate: stale rates are a plan-constant map — the replay audit joins NOTHING") {
    val p = plan("x_cap_gate")
    assert(!p.contains("Join"),
      "bounded rates must ride as a literal, never a join:\n" + p.take(2000))
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 1,
      s"only the presentation sort may exchange, got $exchanges:\n" + p.take(2000))
  }

  test("x_contam_strip: benchmark hashes broadcast — the training corpus never shuffle-joins") {
    val p = plan("x_contam_strip")
    assert(p.contains("BroadcastHashJoin"),
      "the benchmark hash set must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "the training side must never shuffle against the bench set:\n" + p.take(2000))
  }

  test("q_skew_join: salt spreads the hot key — join keys are (lang, salt), shuffled not broadcast") {
    val p = plan("q_skew_join")
    // the mitigation IS the join key: a SortMergeJoin keyed on
    // (lang, salt) means the hot lang's rows hash to SALT_N reducers;
    // losing the salt from the keys (or collapsing to a broadcast,
    // which AQE would love to do with a fixture-sized dim) silently
    // reverts the demo to the unmitigated single-reducer shape
    val smj = p.linesIterator.find(_.contains("SortMergeJoin")).getOrElse("")
    assert(smj.nonEmpty, "expected a SortMergeJoin in:\n" + p.take(2000))
    assert(smj.contains("lang#") && smj.contains("salt#"),
      "salted join must key on (lang, salt): " + smj)
    assert(!p.contains("BroadcastHashJoin"),
      "the salted demo must not broadcast the dim:\n" + p.take(2000))
  }

  /** The three lexical pair cores generate candidates ONE-SIDED: each
    * group member pairs with the strict tail slice after its position
    * (n(n-1)/2 explode rows), never the full g×g product filtered in
    * half — these explodes feed the hottest shuffles in the dedup
    * family, so the 2× row constant is wall-clock at any corpus size.
    * The estimator's slot agreement must also stay a codegen'd
    * equality sum, not an interpreted higher-order function.
    */
  test("pair cores are one-sided (tail slice), estimator eq is codegen'd") {
    for (q <- Seq("x_ngram_jaccard", "x_simhash_pairs", "x_minhash_lsh", "x_minhash_est")) {
      val p = plan(q)
      assert(p.contains("slice("),
        s"$q must pair via the one-sided tail slice:\n" + p.take(2000))
      assert(p.contains("posexplode"),
        s"$q must posexplode to index the tail slice:\n" + p.take(2000))
    }
    val est = plan("x_minhash_est")
    assert(!est.contains("zip_with") && !est.contains("aggregate(lambda"),
      "slot agreement must be a codegen'd 8-term sum, not an interpreted HOF:\n" +
        est.take(2000))
  }

  test("x_dup_spans: pruned scan, linear posting join — no pairwise expansion anywhere") {
    val p = plan("x_dup_spans")
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!readSchemas.contains("lang") && !readSchemas.contains("source"),
      "span audit must read only doc_id/text: " + readSchemas)
    // the df flag rides back on the span key as a LINEAR join — a
    // nested-loop or cartesian here means someone reintroduced a
    // pairwise candidate generator into the substring audit
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "span-df join must stay linear:\n" + p.take(2000))
  }

  test("x_ivf_recluster: flagged set broadcasts; repair adds no shuffle join") {
    val p = plan("x_ivf_recluster")
    assert(p.contains("BroadcastHashJoin"),
      "flagged-cell set must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "the repair is a map pass behind a broadcast — no shuffle join:\n" +
        p.take(2000))
  }

  test("x_index_health: carrier counts via broadcast semi, never a shuffle join") {
    val p = plan("x_index_health")
    assert(!p.contains("SortMergeJoin"),
      "over-cap keys are few by construction — carrier joins must broadcast:\n" +
        p.take(2000))
  }

  test("x_keep_best: cluster argmax via partial-aggregated max(struct), never a window") {
    // a window over the cluster partition would serialize a
    // billion-copy hot cluster through one reducer; the groupBy
    // argmax collapses it map-side
    val p = plan("x_keep_best")
    assert(!p.contains("Window"),
      "cluster argmax must be a groupBy max(struct), not a window:\n" +
        p.take(2000))
    assert(p.contains("partial_max") || p.contains("HashAggregate"),
      "expected partial aggregation in:\n" + p.take(2000))
  }

  test("x_ann_incr: stale centroids broadcast into the batch scan, top-k without global sort") {
    val p = plan("x_ann_incr")
    // the assignment E-step is cells×1 metadata against the batch —
    // a shuffle there would re-key the corpus per maintenance batch
    assert(p.contains("BroadcastNestedLoopJoin"),
      "batch assignment must be a broadcast E-step:\n" + p.take(2000))
    assert(p.contains("TakeOrderedAndProject"),
      "probe top-k must be TakeOrderedAndProject, not Sort+Limit:\n" +
        p.take(2000))
  }

  test("x_keep_best_incr: touched-cluster argmax partial-aggregated, corpus scan behind broadcast semi") {
    val p = plan("x_keep_best_incr")
    // same de-skew discipline as x_keep_best: no window over the
    // cluster partition anywhere in the incremental path
    assert(!p.contains("Window"),
      "cluster argmax must be a groupBy max(struct), not a window:\n" +
        p.take(2000))
    // the quality scan touches only touched members — a broadcast
    // semi into the document scan, never a corpus shuffle join
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "touched-member quality scan must be a broadcast semi:\n" + p.take(2000))
  }

  test("x_hybrid_rank: both arms are distributed top-k pools, query vector broadcast") {
    val p = plan("x_hybrid_rank")
    // each arm cuts to its HYBRID_POOL with per-partition heaps (the
    // corpus never globally sorts); the rank windows then see only
    // the bounded pools. The fused tail is a third top-k.
    assert("TakeOrderedAndProject".r.findAllIn(p).length >= 3,
      "arm pools + fused tail must be TakeOrderedAndProject, not global sorts:\n" +
        p.take(2000))
    assert(p.contains("BroadcastExchange"),
      "the 1-row query vector must broadcast into the cell probe:\n" + p.take(2000))
  }

  test("x_heuristic_filters: no exchange carries the document text") {
    // all four rule statistics derive from `text` INSIDE the scans
    // (per-row lengths/counts, exploded tokens); only doc-keyed
    // integers may shuffle — text riding the doc_id join would ship
    // the corpus through the exchange twice. Asserted on attribute
    // IDs, not explain-format strings: the text attribute is resolved
    // from the analyzed plan's leaves and followed through
    // pass-through aliases, so a rename/projection before the
    // exchange can't make the check pass vacuously. (Derived columns
    // — length(text), exploded tokens — get fresh non-alias
    // expressions and rightly don't count as carrying the text.)
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.Exchange

    val qe = graft.SparkEntry.queries("x_heuristic_filters")(spark, dir)
      .queryExecution
    val seed = qe.analyzed.collectLeaves().flatMap(_.output)
      .filter(_.name == "text").map(_.exprId).toSet
    assert(seed.nonEmpty, "documents relation must expose a text column")

    val phys: SparkPlan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    var ids = seed
    var grew = true
    while (grew) {
      grew = false
      phys.foreach { node =>
        node.expressions.foreach(_.foreach {
          case a @ Alias(ar: AttributeReference, _)
              if ids.contains(ar.exprId) && !ids.contains(a.exprId) =>
            ids += a.exprId; grew = true
          case _ => ()
        })
      }
    }
    val exchanges = phys.collect { case e: Exchange => e }
    assert(exchanges.nonEmpty,
      "expected Exchange nodes in:\n" + phys.toString.take(2000))
    val offending =
      exchanges.filter(_.child.output.exists(o => ids.contains(o.exprId)))
    assert(offending.isEmpty,
      "an exchange ships the full document text:\n" + offending.mkString("\n\n"))
  }

  test("x_band_gate: no exchange carries the document text") {
    // both sides of the gate audit reduce text to hashes map-side
    // (shingle/signature projections on the arrival side, the
    // stored-index build on the base side) — a text attribute crossing
    // any exchange would re-ship the corpus per band slot
    val fmt = graft.SparkEntry.queries("x_band_gate")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val sections = fmt.split("\n\n")
    val exchanges = sections.filter(_.matches("(?s).*\\(\\d+\\) Exchange\\b.*"))
    assert(exchanges.nonEmpty, "expected Exchange nodes in:\n" + fmt.take(2000))
    val offending = exchanges.filter(sec =>
      sec.linesIterator.exists(l =>
        l.startsWith("Input") && "\\btext#".r.findFirstIn(l).isDefined))
    assert(offending.isEmpty,
      "an exchange ships the full document text:\n" + offending.mkString("\n\n"))
  }

  test("x_prefix_gate: no exchange carries a binary payload") {
    // the ladder probe hashes the payload map-side (n_bytes is derived
    // BEFORE the index join for exactly this reason) — only
    // fixed-width (l, ph) rows and the verdict columns may shuffle
    val fmt = graft.SparkEntry.queries("x_prefix_gate")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val sections = fmt.split("\n\n")
    val exchanges = sections.filter(_.matches("(?s).*\\(\\d+\\) Exchange\\b.*"))
    assert(exchanges.nonEmpty, "expected Exchange nodes in:\n" + fmt.take(2000))
    val offending = exchanges.filter(sec =>
      sec.linesIterator.exists(l =>
        l.startsWith("Input") && "\\bpayload#".r.findFirstIn(l).isDefined))
    assert(offending.isEmpty,
      "an exchange ships a binary payload:\n" + offending.mkString("\n\n"))
  }

  test("q_retention_cohorts: retention window runs over the aggregate, never events") {
    // the only Window in the plan must sit ABOVE the cohort×offset
    // aggregate (weeks² rows); a window partitioned over raw events
    // would serialize the stream through per-cohort sort tasks
    val p = plan("q_retention_cohorts")
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0, "expected the retention window in:\n" + p.take(2000))
    val belowWindow = p.substring(winIdx)
    assert(belowWindow.contains("HashAggregate"),
      "the window must consume the cohort×offset aggregate, not raw events:\n" +
        p.take(3000))
  }

  test("q_retention_cohorts: one events scan, no join, exactly 4 exchanges") {
    // the whole per-user story (cohort AND deduped activity weeks)
    // rides ONE user-keyed exchange over a SINGLE events scan — the
    // two-pass firsts⋈activity form scans the fact table twice and
    // re-shuffles for the join. At 100 TB the second scan IS the
    // query's cost, so pin: 1 events FileScan, zero joins, and only
    // the four exchanges the story needs (user, cohort×offset,
    // cohort window, output range sort).
    val p = plan("q_retention_cohorts")
    val scans = p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("events.parquet"))
    assert(scans == 1, s"expected 1 events scan, got $scans:\n" + p.take(3000))
    assert(!p.contains("Join"), "the explode form must not join:\n" + p.take(3000))
    val exchanges = p.linesIterator.count(_.contains("Exchange "))
    assert(exchanges == 4, s"expected 4 exchanges, got $exchanges:\n" + p.take(3000))
  }

  test("q_correlated_agg: single shared per-partkey aggregate, ≤2 lineitem scans") {
    // the correlated-subquery oracle form decorrelates to TWO
    // per-partkey lineitem aggregates (three fact scans — verified,
    // Spark 4.1's MergeScalarSubqueries does not merge them); the
    // shipped explicit form computes COUNT and SUM in ONE pass, so a
    // regression back to the duplicated aggregate shows up here as a
    // third scan
    val p = plan("q_correlated_agg")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the aggregate join must stay an equi-join:\n" + p.take(2000))
    val scans = p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("lineitem.parquet"))
    assert(scans <= 2, s"expected ≤2 lineitem scans, got $scans:\n" + p.take(3000))
    // the aggregate-side scan must stay pruned to the two columns the
    // per-partkey pass needs — reading more re-ships the fact table
    val aggScans = p.linesIterator.filter(l =>
      l.contains("ReadSchema") && l.contains("lineitem") &&
        !l.contains("l_extendedprice")).toSeq
    assert(aggScans.nonEmpty &&
        aggScans.forall(!_.contains("l_shipdate")),
      "aggregate-side lineitem scan must stay narrow:\n" + aggScans.mkString("\n"))
  }

  test("x_gate_chain: no exchange carries the document text") {
    // the funnel composes every content gate's scorer over one
    // arrivals pass — text must stay map-side everywhere (shingles
    // hash before the novelty anti-join, bigram tokens are the only
    // string keys that legitimately shuffle, the CDC kernel chunks
    // before its probe joins); a text column on any exchange means a
    // scorer regressed to shuffling the corpus payload
    val fmt = graft.SparkEntry.queries("x_gate_chain")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val sections = fmt.split("\n\n")
    val exchanges = sections.filter(_.matches("(?s).*\\(\\d+\\) Exchange\\b.*"))
    assert(exchanges.nonEmpty, "expected Exchange nodes in:\n" + fmt.take(2000))
    val offending = exchanges.filter(sec =>
      sec.linesIterator.exists(l =>
        l.startsWith("Input") && "\\btext#".r.findFirstIn(l).isDefined))
    assert(offending.isEmpty,
      "an exchange ships the document text:\n" + offending.mkString("\n\n"))
  }

  test("x_incr_split_leakage: documents scanned once, and only for ids") {
    // the audit's whole corpus contact is the arrivals id scan: labels
    // ride the checkpointed incremental frame, the train-cluster sets
    // are cluster-count-bounded broadcasts, and the published diff
    // lives inside the recomputed clusters — so exactly ONE documents
    // FileScan, reading doc_id alone (never text)
    val p = plan("x_incr_split_leakage")
    val docScans = p.linesIterator.filter(l =>
      l.contains("FileScan") && l.contains("documents.parquet")).toSeq
    assert(docScans.size == 1,
      s"expected 1 documents scan, got ${docScans.size}:\n" + p.take(3000))
    val readSchema = docScans.head
      .split("ReadSchema: ").last
    assert(readSchema.contains("doc_id") && !readSchema.contains("text"),
      "the audit must read ids only: " + readSchema)
  }

  test("x_quality_calibration: one text pass — no documents scan in the final plan") {
    // the narrow (doc_id, qm) frame is checkpointed once and reused
    // by band counts, centroid, and score join; a documents FileScan
    // here means the reuse regressed to re-reading the fat text
    // column per consumer
    val p = plan("x_quality_calibration")
    val docScans = p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("documents.parquet"))
    assert(docScans == 0,
      s"expected the checkpointed score frame, got $docScans documents scans:\n" +
        p.take(3000))
  }

  test("x_cdc_gate_recall: no exchange carries text or the chunk-hash array") {
    // variant texts (incl. the doubled `stitch` string) and the
    // sorted chunk-hash array exist only map-side: the probe slots
    // are derived and the array dropped BEFORE the first store join,
    // so at corpus scale — where the store side is too big to
    // broadcast and the probes shuffle — only fixed-width
    // (doc_id, cls, np, p0..p3) rows cross any exchange
    val fmt = graft.SparkEntry.queries("x_cdc_gate_recall")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val sections = fmt.split("\n\n")
    val exchanges = sections.filter(_.matches("(?s).*\\(\\d+\\) Exchange\\b.*"))
    assert(exchanges.nonEmpty, "expected Exchange nodes in:\n" + fmt.take(2000))
    val offending = exchanges.filter(sec =>
      sec.linesIterator.exists(l =>
        l.startsWith("Input") &&
          ("\\b(text|vtext|gate_ch)#".r.findFirstIn(l).isDefined)))
    assert(offending.isEmpty,
      "an exchange ships a variant text or the hash array:\n" +
        offending.mkString("\n\n"))
  }
}

package graft

import org.apache.spark.sql.DataFrame

/** Fleet-wide plan lint: every registered query that can be PLANNED
  * without side effects gets its physical plan swept for the
  * anti-patterns that kill a 100 TB run no matter how correct the
  * answer is. Individual suites assert per-query plan properties; this
  * spec guarantees the REGISTRY never regresses into:
  *
  *  - `CartesianProduct` — an unconditioned join; at fact scale this
  *    is |R|×|S| work. The only legitimate uses here are broadcasting
  *    a SINGLETON (a global aggregate row) across a frame, which Spark
  *    plans as BroadcastNestedLoopJoin, never CartesianProduct.
  *  - `BroadcastNestedLoopJoin` over two NON-singleton sides — the
  *    silent fallback when a join has no equi-condition. Queries that
  *    deliberately broadcast a one-row frame (global totals, sketch
  *    singletons, probe vectors) are allowlisted by construction:
  *    their build side is an Aggregate with no grouping keys or a
  *    literal range, bounded by definition.
  *  - A partition-less `Window` — `Exchange SinglePartition` feeding a
  *    Window means one task sorts the world. The allowlist carries the
  *    queries whose window input is METADATA-scale by construction
  *    (≤ bins/buckets rows, documented per entry).
  *
  * Streaming queries and store-building queries execute work at
  * construction (AvailableNow runs, index/layout writes), so they are
  * excluded here — each has its own suite asserting state semantics —
  * as are the driver-bounded lookup queries whose construction runs
  * bounded metadata collects (documented at their call sites). */
class PlanGuardSpec extends SparkSpec {

  /** Queries whose CONSTRUCTION is eager (streams run, stores commit,
    * bounded metadata collects) — planned side effects, not lintable
    * as pure plans. Kept in sync with the registry by the completeness
    * check below: every skip must name its reason. */
  private val eager: Map[String, String] = Map(
    "q30_stream_tumbling" -> "runs an AvailableNow stream",
    "q31_stream_dedup_merge" -> "runs an AvailableNow stream",
    "q37_stream_user_stats" -> "runs an AvailableNow stream",
    "q45_stream_sessionize" -> "runs an AvailableNow stream",
    "q52_stream_interval_join" -> "runs an AvailableNow stream",
    "q53_stream_dedup" -> "runs an AvailableNow stream",
    "q56_session_window" -> "builds a one-off session fixture",
    "q60_stream_outer_interval_join" -> "runs an AvailableNow stream",
    "q68_stream_session_window" -> "runs an AvailableNow stream",
    "q71_stream_static_join" -> "runs an AvailableNow stream",
    "q73_stream_sliding_window" -> "runs an AvailableNow stream",
    "q81_stream_semi_join" -> "runs an AvailableNow stream",
    "q90_stream_full_outer_join" -> "runs an AvailableNow stream",
    "q94_chained_windows" -> "runs an AvailableNow stream",
    "q102_stream_cdc_apply" -> "runs an AvailableNow stream",
    "q119_statestore_read" -> "runs a stream, then reads its state store",
    "q120_transform_with_state" -> "runs an AvailableNow stream",
    "q40_universe_csv" -> "reads the committed CSV fixture eagerly (schema probe)",
    "q41_price_sink_roundtrip" -> "writes the month-partitioned sink",
    "q42_latest_fallback" -> "writes its fallback fixture",
    "q44_bucketed_join" -> "writes bucketed tables (saveAsTable)",
    "q50_merge_upsert" -> "commits a MERGE target table",
    "q54_json_source" -> "writes a JSON-lines fixture",
    "q58_variant_json" -> "writes a JSON fixture",
    "q61_range_join_bucketed" -> "writes bucketed tables",
    "q62_shard_write" -> "dynamic-partition-overwrite shard write",
    "q75_ivf_trained" -> "trains + persists the IVF index",
    "q76_zorder_layout" -> "writes the z-ordered layout",
    "q77_scd2_history" -> "builds the SCD2 store",
    "q80_orc_source" -> "writes the ORC fixture",
    "q85_table_diff" -> "writes the two table generations",
    "q87_schema_evolution" -> "writes both schema generations",
    "q89_dpp_join" -> "writes the partitioned layout",
    "q96_cdc_apply" -> "applies the CDC log to a store",
    "q97_compaction" -> "rewrites small files",
    "q98_manifest_skipping" -> "builds layout + manifest, collects file list",
    "q99_incremental_agg" -> "maintains the incremental aggregate store",
    "q103_inverted_index" -> "persists the posting lists",
    "q104_bm25_topk" -> "persists + probes the index",
    "q105_dq_audit" -> "writes audit fixtures",
    "q106_fuzzy_join" -> "writes resolution fixtures",
    "q110_ttl_cache" -> "exercises the snapshot cache (two reads)",
    "q124_incremental_dedup" -> "commits two batches to the signature index",
    "q125_ivf_persisted" -> "builds the cid-partitioned bucket store",
    "q135_phrase_search" -> "persists posting lists",
    "q137_topk_per_group" -> "collects the k-heap boundary (bounded)",
    "q142_train_eval_split" -> "writes both split sides",
    "q143_bloom_skipping" -> "builds the bloom index, collects file paths",
    "q147_sketch_rollup" -> "writes the daily sketch mart",
    "q151_targeted_delete" -> "commits the delete to the store",
    "q155_late_dim_repair" -> "parks + repairs through a store",
    "q157_evolved_store" -> "commits two schema generations",
    "q158_store_vacuum" -> "commits + vacuums the store",
    "q161_runtime_filter_join" -> "clones the session (linted in RuntimeFilterSpec)",
    "q162_global_rank" -> "lineage cut materializes the sort eagerly",
    "q109_sql_bridge" -> "registers temp views at construction",
    "q148_set_ops" -> "registers temp views at construction",
    "q121_correlated_subquery" -> "registers temp views (linted in CorrelatedSubquerySpec)",
    "q129_nested_decorrelation" -> "registers temp views",
    "q130_dormant_segments" -> "registers temp views",
    "q131_filtered_agg" -> "registers temp views",
    "q133_approx_percentile_contract" -> "registers temp views",
    "q21_dedup_ngram_jaccard" -> "uncapped-path guard pre-flight runs sampled estimate jobs at construction",
    "q36_stats_envelope" -> "collects the envelope bounds (bounded)",
    "q49_stratified_sample" -> "collects per-stratum counts (bounded)",
    "q82_weighted_sample" -> "collects stratum weights (bounded)",
    "q114_retention_cohorts" -> "collects the cohort spine (bounded)",
    "q115_pagerank" -> "iterates with lineage cuts (eager rounds)",
    "q116_market_basket" -> "collects the basket support floor (bounded)",
    "q126_global_threshold" -> "collects the global total (bounded)",
    "q139_triangle_count" -> "builds the oriented adjacency eagerly",
    "q144_growth_accounting" -> "collects the month spine (bounded)",
    "q146_skyline" -> "collects bucket maxima (bounded)",
    "q149_equi_depth" -> "two-phase prefix sum collects bin offsets (bounded)",
    "q152_regional_revenue" -> "collects dim stats for the hint check",
    "q153_market_share" -> "collects dim stats",
    "q159_min_cost_supplier" -> "collects the qualifying-part floor (bounded)",
  )

  /** Windows legitimately fed by a SinglePartition exchange because
    * their input is metadata-scale BY CONSTRUCTION. */
  private val singlePartitionWindowOk: Map[String, String] = Map(
    "q08_price_panel" -> "date spine: one row per calendar day",
    "q11_twr_index" -> "one row per day after the per-day rollup",
    "q12_benchmark_rebase" -> "index-aligned daily series",
    "q128_rank_distribution" -> "percent_rank partitions by segment; tiny tail",
    "q145_islands_gaps" -> "global streak rank over per-user runs",
  )

  /** Unconditioned joins that are the QUERY, not an accident — every
    * entry names the bound that keeps the product metadata-scale at
    * any data volume (the fact side never multiplies against another
    * fact side). */
  private val unconditionedJoinOk: Map[String, String] = Map(
    "q08_price_panel" -> "calendar-day spine × ticker list: days × |tickers| rows",
    "q09_position_series" -> "calendar-day spine × ticker list grid",
    "q10_cash_series" -> "calendar-day spine (one row per day)",
    "q11_twr_index" -> "calendar-day spine against per-day aggregates",
    "q12_benchmark_rebase" -> "calendar-day spine alignment",
    "q24_ann_bruteforce" -> "3 probe vectors × corpus: the documented brute-force baseline; |probes| is the bound",
    "q25_ann_ivf" -> "3 probe vectors × their IVF buckets only",
    "q46_embedding_neardup" -> "bounded anchor set × banded candidates",
  )

  private def planOf(name: String,
                     fn: (org.apache.spark.sql.SparkSession, String) => DataFrame): String = {
    val df = fn(spark, sf())
    df.queryExecution.sparkPlan.toString
  }

  test("every lintable query plans without unexplained Cartesian products") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if eager.contains(name) ||
        unconditionedJoinOk.contains(name) => None
      case (name, fn) =>
        val plan = planOf(name, fn)
        if (plan.contains("CartesianProduct")) Some(name -> plan) else None
    }
    assert(bad.isEmpty,
      s"Cartesian products in: ${bad.map(_._1).mkString(", ")}\n${bad.headOption.map(_._2).getOrElse("")}")
  }

  test("broadcast nested loops carry singleton or documented-bounded build sides") {
    // a BNLJ is legal here ONLY as 'broadcast a bounded frame across
    // another': either its build subtree is structurally a singleton
    // (global aggregate, literal) or the query documents its bound in
    // unconditionedJoinOk (date spines, probe vectors)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if eager.contains(name) ||
        unconditionedJoinOk.contains(name) => None
      case (name, fn) =>
        val df = fn(spark, sf())
        val plans = df.queryExecution.sparkPlan.collect {
          case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
        }
        val nonSingleton = plans.filterNot { j =>
          val build = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
          }
          val s = build.toString
          // a global aggregate (no grouping keys) or literal singleton
          s.contains("Aggregate []") || s.contains("HashAggregate(keys=[]") ||
            s.contains("LocalTableScan") || s.contains("Range (0, 1,")
        }
        if (nonSingleton.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"non-singleton broadcast nested loops in: ${offenders.mkString(", ")}")
  }

  test("no fact-scale window runs on a single partition") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if eager.contains(name) ||
        singlePartitionWindowOk.contains(name) => None
      case (name, fn) =>
        val plan = planOf(name, fn)
        // a Window whose required child distribution collapsed to one
        // partition shows as SinglePartition in the exchange above it
        val hasGlobalWindow = plan.split("\n").sliding(6).exists(w =>
          w.head.trim.startsWith("Window ") &&
            w.exists(_.contains("Exchange SinglePartition")))
        if (hasGlobalWindow) Some(name) else None
    }
    assert(bad.isEmpty, s"single-partition windows in: ${bad.mkString(", ")}")
  }

  /** Lintable queries where count() provably prunes WHOLE operators
    * (joins/generates/windows vanish from the optimized count plan)
    * but the honest-vs-pruned timing ratio is MEASURED small, so the
    * count sink stays: the pruned work is cheap value-attachment, not
    * the query's payload. Ratios from the round-13 full noop audit
    * (bench/probe_r13_noop_audit_sf01.json vs bench/last_bench.json).
    * A query that can't honestly carry such a bound belongs in
    * SparkEntry.noopSink instead. */
  private val countPruningOk: Map[String, String] = Map(
    "q08_price_panel" -> "interpolation windows prune; noop/count 1.1x",
    "q09_position_series" -> "ffill value-attach prunes; noop/count 1.2x",
    "q10_cash_series" -> "flow-sum value-attach prunes; noop/count 1.0x",
    "q11_twr_index" -> "per-day weighting joins prune; noop/count 1.2x",
    "q12_benchmark_rebase" -> "rebase value-attach prunes; noop/count 0.6x",
    "q16_pricing_summary" -> "agg exprs prune to group count; noop/count 2.4x, 0.98 s absolute — nearest annotation candidate (PERF_r13)",
    "q19_json_extract" -> "extracted cols prune; noop/count 1.3x, sub-second",
    "q23_dedup_simhash" -> "bit-sum projection prunes; noop/count 2.3x, sub-second",
    "q27_doc_fingerprint" -> "fingerprint hash prunes; noop/count 1.0x",
    "q34_histogram" -> "bin math prunes; noop/count 0.7x (bins are metadata-scale)",
    "q35_window_funcs" -> "rank/lag columns prune; noop/count 1.2x, 0.2 s absolute",
    "q43_salted_sum" -> "final unsalt projection prunes; noop/count 1.5x, sub-second",
    "q47_asof_native" -> "native as-of exec keeps the merge; value cols prune; noop/count 0.8x",
    "q55_vocabulary" -> "token stats prune; noop/count 1.0x",
    "q57_cms_event_counts" -> "sketch estimate projection prunes; noop/count 1.1x (sketch agg itself is cardinality-bearing)",
    "q63_chunk_windows" -> "chunk boundary exprs prune; noop/count 1.7x, sub-second",
    "q64_token_packing" -> "pack-assignment exprs prune; noop/count 0.5x",
    "q65_simhash_pairs" -> "hamming verify prunes only the distance col; noop/count 0.6x",
    "q66_repetition_stats" -> "repetition ratios prune; noop/count 1.1x",
    "q72_bitmap_distinct" -> "popcount projection prunes; noop/count 1.3x, sub-second",
    "q79_hist_quantiles" -> "quantile interpolation prunes; noop/count 1.0x",
    "q84_funnel" -> "step timestamps prune; noop/count 0.5x",
    "q88_rolling_window" -> "rolling aggregates prune; noop/count 0.6x",
    "q112_feature_matrix" -> "feature exprs prune; noop/count 1.6x, sub-second",
    "q117_decontamination" -> "overlap detail prunes; noop/count 1.0x",
    "q118_trend_slope" -> "slope closing expr prunes; noop/count 1.4x, sub-second",
    "q123_pcm_decode" -> "sample stats prune; noop/count 0.8x, 0.17 s absolute",
    "q127_hll_contract" -> "estimate projection prunes; noop/count 0.9x",
    "q128_rank_distribution" -> "percent_rank/cume_dist prune; noop/count 1.1x",
    "q132_recursive_spine" -> "spine value-attach prunes; noop/count 1.3x, sub-second",
    "q134_oov_rate" -> "rate exprs prune; noop/count 1.3x, sub-second",
    "q136_rolling_distinct" -> "rolling distinct window prunes; noop/count 0.5x",
    "q138_scd2_apply" -> "SCD2 attribute columns prune; noop/count 0.9x",
    "q140_audience_overlap" -> "popcounts prune; noop/count 0.8x",
    "q141_dead_letter" -> "parse-error detail prunes; noop/count 0.9x",
    "q145_islands_gaps" -> "streak windows prune; noop/count 0.8x",
    "q150_interval_overlap" -> "overlap arithmetic prunes; noop/count 0.7x",
    "q154_k_anonymity" -> "suppression detail prunes; noop/count 0.7x",
    "q156_time_weighted_avg" -> "weight exprs prune; noop/count 0.6x",
    "q163_trade_validation" -> "rejection reasons prune; noop/count 0.9x",
    "q164_adaptive_read" -> "reconciled cols prune; noop/count 0.9x",
    "q165_substring_dedup" -> "span detail prunes; stats agg is cardinality-bearing; noop/count 1.1x",
  )

  test("whole-operator count-pruning is annotated or measured-harmless") {
    // The q166 trap, made structural: if Catalyst's optimized COUNT
    // plan of a registry query contains FEWER heavy operators
    // (joins/generates/windows/aggregates) than the query's own
    // optimized plan, count() is not timing that work — the query must
    // either run through the noop sink in the bench
    // (SparkEntry.noopSink) or carry a measured small noop/count ratio
    // here. Catches the whole-operator pruning class for every future
    // registry addition; expression-level pruning (agg exprs folding
    // to a bare group count) still needs the periodic NoopBench audit.
    // Eager queries are excluded (their construction runs side
    // effects); they are covered by the audit artifact instead.
    import org.apache.spark.sql.catalyst.plans.logical._
    def heavyOps(p: LogicalPlan): Int = p.collect {
      case _: Join => 1
      case _: Generate => 1
      case _: Window => 1
      case _: Aggregate => 1
      case _: Expand => 1
    }.sum
    val unexplained = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if eager.contains(name) ||
        SparkEntry.noopSink.contains(name) ||
        countPruningOk.contains(name) => None
      case (name, fn) =>
        val df = fn(spark, sf())
        val full = heavyOps(df.queryExecution.optimizedPlan)
        val counted = heavyOps(
          df.groupBy().count().queryExecution.optimizedPlan) - 1 // its own count agg
        if (counted < full) Some(s"$name (count plan $counted < full $full)")
        else None
    }
    assert(unexplained.isEmpty,
      "count() prunes whole operators in unannotated queries — add to " +
        "SparkEntry.noopSink (honest bench sink) or, with a measured " +
        s"ratio, to countPruningOk: ${unexplained.mkString(", ")}")
    // the allowlist itself must stay real: no dead entries
    val stale = countPruningOk.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"countPruningOk names unknown queries: $stale")
  }

  test("the noop-sink annotation names real registry queries, no streaming members") {
    val names = SparkEntry.queries.keySet
    val unknown = SparkEntry.noopSink -- names
    assert(unknown.isEmpty, s"noopSink annotates unknown queries: $unknown")
    // the noop sink is a batch writer; a streaming query routed through
    // it would fail at bench time, not compile time — keep the
    // annotation honest here
    val streaming = SparkEntry.noopSink.filter(_.contains("stream"))
    assert(streaming.isEmpty, s"noopSink annotates streaming queries: $streaming")
  }

  test("the eager/lint split covers the whole registry (no silent skips)") {
    val names = SparkEntry.queries.keySet
    val unknown = eager.keySet -- names
    assert(unknown.isEmpty, s"eager allowlist names unknown queries: $unknown")
    val linted = names -- eager.keySet
    assert(linted.size + eager.size == names.size)
    assert(linted.size >= 80,
      s"lint coverage collapsed: only ${linted.size} queries planned")
  }
}

package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-exchange budget per gate query (VERDICT r6 #4): the number of
  * ShuffleExchange nodes each query's physical plan is ALLOWED to contain,
  * recorded from the audited plans. Broadcast and reused exchanges don't
  * count — broadcasts are the cheap/deliberate distribution path and a
  * ReusedExchange is exactly the shuffle NOT happening twice. The assert is
  * two-sided: a future edit that adds an avoidable shuffle fails the suite
  * immediately (not the next round's bench), and one that removes a shuffle
  * fails too so the budget table stays the single source of truth — tighten
  * the entry when that happens.
  */
class ExchangeBudgetSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private val budget: Map[String, Int] = Map(
    "ann_ivf_coarse" -> 4,
    "ann_ivf_trained" -> 4,
    "ann_ivfpq_adc" -> 8,
    "ann_ivfpq_rerank" -> 9,
    "ann_ivfpq_append" -> 8, // k-means train (corpus-side agg per iter) +
                             // the ADC sum + tiny codebook/window aggs —
                             // same shape as ann_ivfpq_adc; both encodes
                             // (corpus + fresh append) are map-only and
                             // contribute ZERO (VectorIndexSpec)
    "ann_ivfpq_upsert" -> 0, // returns a localCheckpoint (the scratch index
                             // dir is deleted before return) — the public
                             // plan is a checkpoint scan; the maintenance
                             // pipeline's own shape is pinned by
                             // VectorIndexSpec (touched-cells-only rewrite)
    "ann_index_occupancy" -> 4, // k-means train aggs + per-cell count +
                                // the 1-row report reduction; encode itself
                                // is map-only (VectorIndexSpec)
    "ann_hot_split" -> 0, // returns a localCheckpoint (scratch index deleted
                          // before return), the ann_ivfpq_upsert device; the
                          // split pipeline's own shape is pinned by
                          // VectorIndexSpec (touched-cells-only rewrite)
    "ann_filtered_search" -> 6, // ann_ivfpq_adc minus the probe-side
                                // aggregates: the pruned serve computes its
                                // probed-cell set EAGERLY (bounded collect,
                                // its own job), so only the ADC scoring
                                // pipeline remains in the public plan; the
                                // label predicate rides the codes scan —
                                // filtering itself adds ZERO exchanges
    "ann_filtered_selective" -> 6, // ann_filtered_search at ~1% selectivity:
                                   // identical plan shape, the rarer
                                   // predicate changes row counts only
    "ann_filtered_widen" -> 6, // the PUBLIC plan is the widened re-run —
                               // identical shape to ann_filtered_search
                               // (the <topK-match predicate guarantees the
                               // narrow attempt starves, so the widening
                               // always fires; the starved attempt ran
                               // eagerly at build time, checkpoint freed)
    "ann_reindex" -> 0, // returns a localCheckpoint (scratch index deleted
                        // before return) — the ann_ivfpq_upsert device; the
                        // reindex pipeline's staged-build/swap shape is
                        // pinned by VectorIndexLifecycleSpec
    "ann_pq_adc" -> 4,
    "ann_recall_at_5" -> 19,
    "ann_rhp_lsh" -> 3,
    "dedup_clusters" -> 1,
    "dedup_keep_best" -> 2, // label join agg + output sort; edge pipeline
                            // materializes eagerly like dedup_clusters
    "dedup_embedding_cosine" -> 3,
    "dedup_exact" -> 2,
    "dedup_incremental" -> 1,
    "dedup_keep_first" -> 2,
    "dedup_minhash_lsh" -> 1,
    "dedup_ngram_jaccard" -> 6,
    "dedup_semantic" -> 3,
    "dedup_simhash" -> 4,
    "dedup_span_runs" -> 4,
    "dedup_span_remove" -> 5, // the span-run derivation's 4 + ONE extra:
                              // the per-doc span-list agg reuses the run
                              // agg's partitioning, so only the sparse
                              // join back onto the corpus adds an exchange
                              // (the scaladoc's declared shape)
    "dedup_span_windows" -> 4,
    "emb_covariance" -> 1, // single 1-row moments reduction
    "text_zipf_slope" -> 1, // term-count agg; regression on 100 bounded rows
    "emb_kmeans" -> 3,
    "emb_label_centroids" -> 2,
    "emb_outliers" -> 4,
    "emb_quantize_int8" -> 1,
    "emb_stats" -> 1,
    "knn_cosine_brute" -> 2,
    "mm_byte_features" -> 1,
    "mm_decode_features" -> 1,
    "mm_decode_real" -> 1,
    "mm_frame_energy" -> 1,
    "mm_phash" -> 1,
    "mm_resample_fixed" -> 1, // pure map + output sort
    "mm_stride_sample" -> 1,
    "pipeline_chunk_docs" -> 1,
    "pipeline_class_weights" -> 2,
    "pipeline_cluster_split" -> 3,
    "pipeline_contamination" -> 3,
    "pipeline_contamination_fuzzy" -> 2,
    "pipeline_curriculum" -> 2,
    "pipeline_dsir" -> 4,
    "pipeline_hard_negatives" -> 2,
    "pipeline_mixture_sample" -> 4,
    "pipeline_mixture_upsample" -> 4,
    "pipeline_pack_batches" -> 2,
    "pipeline_pack_tokens" -> 4, // per-bucket window partition, the
                                 // seq_id distinct-agg pair (n_docs is a
                                 // count distinct), and the output sort;
                                 // the global offset is driver-broadcast,
                                 // never a global window

    "pipeline_pii_scrub" -> 1,
    "pipeline_soft_sample" -> 2,
    "pipeline_source_cap" -> 2,
    "pipeline_split" -> 2,
    "pipeline_stratified_sample" -> 2,
    "pipeline_temperature_mix" -> 4, // lang-count agg appears twice pre-AQE
                                     // (runtime stage reuse collapses it);
                                     // all 4 exchanges move ≤ n_lang rows
    "pipeline_training_set" -> 2,
    "q10_returned_items" -> 1,
    "retrieval_rrf_fusion" -> 5, // bm25 sub-plan's 5; dense ranker and the
                                 // 100∪100-row fuse join add none
    "dedup_bloom_probe" -> 2,    // 1-row bitmap agg + output sort; the
                                 // fresh-side probe itself is map-only
    "text_bm25_topk" -> 5,       // postings tf agg + tiny df/stats aggs
                                 // (df agg appears twice pre-AQE) + doc agg
    "pipeline_weighted_reservoir" -> 0, // pure map + TakeOrdered
    "q_funnel_steps" -> 2,  // per-user conditional-min agg + 1-row rollup
    "q_event_transitions" -> 2, // per-user path window + pair-count agg;
                                // ranking is TakeOrdered
    "q_histogram" -> 2,     // bucket-key agg + output sort (≤ #buckets rows)
    "q_ab_test" -> 1,       // single 1-row moments reduction
    "q_profile_documents" -> 7, // 1-row profile agg merge + 2 tiny mode
                                // groupBys (lang/source key space) + 2×2
                                // exact HLL validators (fingerprint-long
                                // shuffle + 1-row merge each); no Expand
    "q_profile_columns" -> 5, // hybrid profiler (r10): 1-row profile agg
                              // merge + 2×2 for the two single-distinct
                              // HLL validators (value shuffle + 1-row
                              // merge each). No Expand anywhere — the old
                              // plan's 2 exchanges carried a 5× Expand of
                              // the fact table; these 5 move ~nd(key)
                              // rows total. Validators are gate-only; the
                              // profiler itself costs exchange #1 alone.
    "q11_important_stock" -> 4,
    "q12_priority" -> 2,
    "q13_order_dist" -> 3,
    "q14_promo" -> 1,
    "q15_top_supplier" -> 4,
    "q16_supplier_count" -> 3,
    "q17_small_qty" -> 2,
    "q18_large_orders" -> 1,
    "q19_disjunctive" -> 1,
    "q1_pricing_summary" -> 2,
    "q20_excess_supply" -> 7,
    "q21_waiting_suppliers" -> 3, // r14 fused single-pass rewrite: ONE
                                  // F-orders join + a two-level
                                  // (orderkey,suppkey)->orderkey agg
                                  // replace the two separate distinct
                                  // aggs + their join (was 5 exchanges /
                                  // 17 s at 100x; now 3 / 5.3 s)
    "q22_inactive" -> 3,
    "q2_min_cost" -> 5,
    "q3_top_revenue" -> 1,
    "q4_late_exists" -> 2,
    "q5_local_supplier" -> 2,
    "q6_forecast_revenue" -> 1,
    "q7_nation_volume" -> 4,
    "q8_market_share" -> 4,
    "q9_product_profit" -> 2,
    "q_anti_join" -> 1,
    "q_approx_distinct_bound" -> 4,
    "q_approx_quantile_bound" -> 2,
    "q_asof_join" -> 2,
    "q_broadcast_part_agg" -> 2,
    "q_case_when" -> 2,
    "q_cohort_retention" -> 4,
    "q_cube" -> 2,
    "q_distinct_agg" -> 3,
    "q_exists_subquery" -> 2,
    "q_grouping_sets" -> 2,
    "q_heavy_hitters_bound" -> 3,
    "q_incremental_cursor" -> 1,
    "q_json_extract" -> 2,
    "q_outer_join_count" -> 2,
    "q_percentiles" -> 2,
    "q_pivot" -> 3,
    "q_range_join" -> 2,
    "q_rollup" -> 2,
    "q_salted_join" -> 1,
    "q_scalar_array" -> 1,
    "q_scalar_date" -> 1,
    "q_scalar_map" -> 1,
    "q_scalar_math" -> 1,
    "q_scalar_string" -> 1,
    "q_semi_join" -> 1,
    "q_session_count" -> 2,
    "q_session_stats" -> 2,
    "q_set_except" -> 2,
    "q_set_intersect" -> 2,
    "q_set_union" -> 2,
    "q_sliding_window" -> 2,
    "q_sort_limit" -> 0,
    "q_string_agg" -> 3,
    "q_topk_agg" -> 2,
    "q_topk_per_group" -> 2,
    "q_tumbling_hourly" -> 2,
    "q_upsert_cdc" -> 3, // was 5: mergeLargeBase now localCheckpoints the
                         // change-key distinct at build time (one shared
                         // materialization for guard + broadcast, ADVICE
                         // r14), so its two exchanges left the public plan
    "q_weighted_avg" -> 2,
    "q_window_first_last" -> 2,
    "q_window_lag" -> 2,
    "q_window_moving_avg" -> 2,
    "q_window_ranks" -> 2,
    "q_window_running" -> 2,
    "q_zorder_value" -> 1,
    "sink_airbyte_envelope" -> 1,
    "sink_singer_envelope" -> 1,
    "text_bigrams" -> 1,
    "text_bpe_count" -> 1,
    "text_bpe_encode" -> 1, // map-side codegen encode; the output sort
    "text_bpe_train" -> 0,  // returns the learned 6-row local table; each
                            // training round's pair-count aggregate runs
                            // eagerly inside Bpe.train (one tiny shuffle
                            // per round, BpeSpec covers the trainer)
    "text_bpe_train_batched" -> 0, // same device: the batched trainer runs
                                   // eagerly (one pair-count shuffle per
                                   // ROUND, ~M× fewer rounds); the gate
                                   // returns the local learned table
    "text_ccnet_buckets" -> 6,
    "text_fingerprint" -> 1,
    "text_hashing_tf" -> 1,
    "text_lang_id" -> 1,
    "text_quality" -> 1,
    "text_quality_gate" -> 1,
    "text_quality_model" -> 1,
    "text_repetition" -> 1,
    "text_rolling_fp" -> 1,
    "text_surprisal" -> 5,
    "text_term_freq" -> 1,
    "text_tfidf_topk" -> 7,
    "text_token_stats" -> 1,
    "text_unigram_kl" -> 8)

  private def shuffleExchanges(plan: String): Int = {
    val all = "Exchange".r.findAllIn(plan).size
    val broadcast = "BroadcastExchange".r.findAllIn(plan).size
    val reused = "ReusedExchange".r.findAllIn(plan).size
    all - broadcast - reused
  }

  test("every gate query has a budget entry and plans exactly its budgeted shuffle count") {
    val qs = graft.SparkEntry.queries
    val unbudgeted = qs.keySet -- budget.keySet
    assert(unbudgeted.isEmpty, s"queries without a shuffle budget: $unbudgeted")
    val stale = budget.keySet -- qs.keySet
    assert(stale.isEmpty, s"budget entries for removed queries: $stale")
    val offenders = qs.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = shuffleExchanges(fn(spark, dir).queryExecution.executedPlan.toString)
      if (n == budget(name)) None
      else Some(s"$name: plans $n shuffle exchanges, budget is ${budget(name)}")
    }
    assert(offenders.isEmpty,
      s"shuffle-budget violations (update the table only for DELIBERATE plan changes):\n" +
        offenders.mkString("\n"))
  }
}

"""Central query registry.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an equivalent DuckDB oracle SQL string. The driver's
correctness gate runs both and hash-compares values, so:

- Column names must match exactly between the Spark result and the oracle.
- Result values must be bit-deterministic across engines. House rules:
  * no raw float aggregation — money/qty sums go through DECIMAL casts
    (exact, order-independent) then CAST(... AS DOUBLE);
  * float vectors are quantized via floor(x * 1e6) to BIGINT before
    dot-products (IEEE multiply + floor is engine-deterministic; BIGINT
    sums are order-independent);
  * every window/top-k has a total-order tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver runs a weaker rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


# Names that already have a triple-green row in a prior round's driver
# correctness gate (CORRECTNESS_r01.json / CORRECTNESS_r02.json).  The
# driver checks exactly the first 50 queries it is handed per round, so
# all_queries() orders not-yet-driver-verified queries FIRST and these
# already-verified names LAST.  Local oracle tests still sweep everything
# regardless of order.
DRIVER_VERIFIED_R01: frozenset[str] = frozenset({
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "filter_like_prefix", "explode_with_ordinality",
    "latest_event_agg_join", "latest_event_window", "composite_key_self_join",
    "union_all_literals", "order_by_case_precedence", "monthly_event_stats",
    "array_agg_sorted_lines", "window_lag_transitions",
    "anti_join_customers_without_orders", "semi_join_customers_with_open_orders",
    "rollup_region_nation_customers", "pivot_returnflag_by_status",
    "json_prop_extraction", "cte_chain_order_items", "top3_items_per_supplier",
    "sessionize_events", "tumbling_window_hourly", "distinct_parts_per_supplier",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_minhash_lsh_dfcap", "dedup_components", "simhash_signature",
    "simhash_near_dup", "dedup_boilerplate_chunks", "ann_topk_bruteforce",
    "embedding_near_dup_pairs", "ann_topk_batch", "ann_ivf_kmeans",
    "embedding_near_dup_lsh", "ann_ivf_probe", "embedding_int8_quantize",
    "ann_topk_int8", "ann_pq_adc", "text_token_stats", "text_quality_scores",
    "lang_id_heuristic", "lang_id_char_ngrams", "doc_winnowing_fingerprints",
    "dataset_split_assign", "doc_fingerprint", "text_tfidf_topk",
    "text_repetition_scores",
})

# Triple-green rows added by the round-2 gate (CORRECTNESS_r02.json).
DRIVER_VERIFIED_R02: frozenset[str] = frozenset({
    "osm_ways_reassembly", "osm_tag_usage_by_month", "osm_latest_versions",
    "osm_latest_versions_window", "osm_deleted_count",
    "osm_changesets_with_comment", "osm_changesets_josm",
    "osm_changesets_liberty_island", "osm_tag_additions_window",
    "osm_snapshot_at",
    "q4_order_priority_check", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "q10_returned_item_losers", "q12_priority_shipping_mix",
    "q13_customer_distribution", "q14_promo_revenue_share", "q15_top_supplier",
    "q17_small_quantity_revenue", "q18_large_volume_orders",
    "q19_discounted_revenue", "q22_global_sales_opportunity",
    "stream_segment_rollup",
    "curation_canonical_docs", "curation_decontaminate",
    "curation_stratified_sample", "curation_pack_sequences",
    "curation_source_cap", "curation_quality_filter",
    "curation_temperature_mix", "curation_training_mix",
    "text_bm25_topk",
})

# Triple-green rows added by the round-3 gate (CORRECTNESS_r03.json):
# 50/50 green, zero failures, zero errors.
DRIVER_VERIFIED_R03: frozenset[str] = frozenset({
    "text_pii_redact", "zorder_key_events", "funnel_view_click_purchase",
    "cohort_monthly_retention", "rolling_hour_user_activity",
    "asof_join_last_purchase", "range_join_value_bands", "salted_hot_key_agg",
    "percentiles_value_by_type", "stream_hourly_rollup",
    "stream_session_windows", "stream_purchase_attribution",
    "stream_user_totals", "histogram_event_values", "window_rank_suite",
    "unpivot_order_measures", "grouping_sets_orders",
    "cube_orders_priority_status", "intersect_except_nations",
    "bag_setops_nations", "full_outer_nation_presence",
    "correlated_min_price_parts", "scalar_function_corpus",
    "stream_dedup_events", "stream_ohlc_bars", "multimodal_decode_meta",
    "multimodal_resize", "dedup_ppjoin", "fuzzy_name_match",
    "dedup_duplicate_spans", "dedup_containment_pairs", "dedup_spans_clean",
    "dedup_minhash_calibration", "ann_matryoshka_rerank", "ann_ivf_recall",
    "ann_ivf_index_stats", "dedup_semantic_kmeans", "text_ngram_vocab",
    "text_bigram_coverage", "lang_confusion_matrix", "corpus_shuffle_shards",
    "curation_dedup_report", "pagerank_trade_graph", "dupgraph_triangle_stats",
    "customer_rfm_segments", "part_abc_pareto", "order_fulfillment_lag",
    "order_backlog_curve", "osm_way_bbox", "osm_relation_members",
})

# Triple-green rows added by the round-4 gate (CORRECTNESS_r04.json):
# 48/50 green; the 2 non-green rows were the rows-only approx sketches
# (err: no_oracle — they ran but had nothing to hash against; r5 gives
# them bounded-invariant oracles and re-gates them below).
DRIVER_VERIFIED_R04: frozenset[str] = frozenset({
    "event_transitions", "ohlc_hourly_bars", "event_run_islands",
    "asof_join_next_event", "anomaly_zscore_events", "hourly_spine_fill",
    "event_cooccurrence_pmi", "weekly_activity_profile", "stream_transitions",
    "multimodal_frame_sample", "multimodal_audio_chunks",
    "dedup_containment_ppjoin", "embedding_lsh_calibration",
    "embedding_dim_stats", "ann_ivfpq_probe", "ann_ivfpq_recall",
    "embedding_prototype_prune", "ann_topk_hamming", "ann_hamming_recall",
    "text_quality_classifier", "curation_mix_report", "curation_dsir_select",
    "curation_epoch_mix", "curation_contamination_report",
    "asof_join_tolerance", "scd2_user_value_bands", "stream_scd2_intervals",
})

# Triple-green rows from the round-5 gate (CORRECTNESS_r05.json): 50/50
# green, zero failures, zero errors — including the 13 contract-changed
# re-gates and the first-ever oracle rows for the two approx sketches.
DRIVER_VERIFIED_R05: frozenset[str] = frozenset({
    "approx_distinct_users_by_type", "approx_percentiles_value_by_type",
    "ann_ivfpq_recall", "ann_ivf_kmeans", "ann_pq_adc", "ann_ivfpq_probe",
    "dedup_semantic_kmeans", "embedding_dim_stats", "dedup_duplicate_spans",
    "dedup_spans_clean", "dedup_ppjoin", "dedup_containment_ppjoin",
    "curation_mix_report", "stream_transitions", "stream_scd2_intervals",
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "filter_like_prefix", "explode_with_ordinality",
    "latest_event_agg_join", "latest_event_window", "composite_key_self_join",
    "union_all_literals", "order_by_case_precedence", "monthly_event_stats",
    "array_agg_sorted_lines", "window_lag_transitions",
    "anti_join_customers_without_orders",
    "semi_join_customers_with_open_orders", "rollup_region_nation_customers",
    "pivot_returnflag_by_status", "json_prop_extraction",
    "cte_chain_order_items", "top3_items_per_supplier", "sessionize_events",
    "tumbling_window_hourly", "distinct_parts_per_supplier", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_minhash_lsh_dfcap",
    "dedup_components", "simhash_signature", "simhash_near_dup",
    "dedup_boilerplate_chunks", "fuzzy_name_match", "dedup_containment_pairs",
    "dedup_minhash_calibration",
})

DRIVER_VERIFIED_R06: frozenset[str] = frozenset({
    "dedup_duplicate_spans", "dedup_spans_clean", "dedup_components",
    "curation_canonical_docs", "curation_training_mix", "curation_mix_report",
    "dupgraph_triangle_stats", "approx_distinct_users_by_type",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_minhash_lsh_dfcap",
    "simhash_near_dup", "dedup_containment_pairs", "dedup_containment_ppjoin",
    "dedup_ppjoin", "dedup_minhash_calibration", "pagerank_trade_graph",
    "embedding_near_dup_lsh", "embedding_lsh_calibration", "ann_ivf_probe",
    "ann_topk_bruteforce", "embedding_near_dup_pairs", "ann_topk_batch",
    "embedding_int8_quantize", "ann_topk_int8", "text_token_stats",
    "text_quality_scores", "lang_id_heuristic", "lang_id_char_ngrams",
    "doc_winnowing_fingerprints", "dataset_split_assign", "doc_fingerprint",
    "text_tfidf_topk", "text_repetition_scores", "text_bm25_topk",
    "curation_decontaminate", "curation_stratified_sample",
    "curation_pack_sequences", "curation_source_cap", "curation_quality_filter",
    "curation_temperature_mix", "osm_ways_reassembly", "osm_tag_usage_by_month",
    "osm_latest_versions", "osm_latest_versions_window", "osm_deleted_count",
    "osm_changesets_with_comment", "osm_changesets_josm",
    "osm_changesets_liberty_island", "osm_tag_additions_window",
})

# Triple-green rows from the round-8 gate (CORRECTNESS_r08.json): 50/50
# green, zero failures, zero errors — the GATE_PRIORITY_R08 re-gates
# (dedup verify shapes, the try_divide cosine family) plus stale
# re-confirmations.
DRIVER_VERIFIED_R08: frozenset[str] = frozenset({
    "ann_hamming_recall", "ann_ivf_index_stats", "ann_ivf_kmeans",
    "ann_ivf_probe", "ann_ivf_recall", "ann_ivfpq_probe", "ann_ivfpq_recall",
    "ann_matryoshka_rerank", "ann_pq_adc", "ann_topk_batch",
    "ann_topk_bruteforce", "ann_topk_hamming", "asof_join_tolerance",
    "cohort_monthly_retention", "curation_contamination_report",
    "curation_dsir_select", "curation_epoch_mix", "customer_rfm_segments",
    "dedup_components", "dedup_containment_pairs", "dedup_containment_ppjoin",
    "dedup_minhash_calibration", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_ppjoin", "dedup_semantic_kmeans", "embedding_lsh_calibration",
    "embedding_near_dup_lsh", "embedding_near_dup_pairs",
    "embedding_prototype_prune", "event_transitions",
    "funnel_view_click_purchase", "grouping_sets_orders",
    "histogram_event_values", "multimodal_audio_chunks",
    "multimodal_frame_sample", "order_backlog_curve", "order_fulfillment_lag",
    "osm_relation_members", "osm_way_bbox", "part_abc_pareto",
    "rolling_hour_user_activity", "stream_dedup_events", "stream_hourly_rollup",
    "stream_ohlc_bars", "stream_purchase_attribution", "stream_session_windows",
    "stream_user_totals", "text_quality_classifier", "unpivot_order_measures",
})

# Triple-green rows from the round-9 gate (CORRECTNESS_r09.json): 50/50
# green, zero failures, zero errors — the GATE_PRIORITY_R09 re-gates
# (the strategy-switched window/banding/ANN families) plus stale
# re-confirmations.
DRIVER_VERIFIED_R09: frozenset[str] = frozenset({
    "ann_ivf_kmeans", "ann_ivf_probe", "ann_ivf_recall", "ann_ivfpq_probe",
    "ann_ivfpq_recall", "anomaly_zscore_events",
    "anti_join_customers_without_orders", "approx_percentiles_value_by_type",
    "array_agg_sorted_lines", "asof_join_last_purchase", "asof_join_next_event",
    "composite_key_self_join", "cte_chain_order_items",
    "dedup_boilerplate_chunks", "dedup_exact", "dedup_semantic_kmeans",
    "distinct_parts_per_supplier", "embedding_dim_stats",
    "embedding_near_dup_lsh", "event_cooccurrence_pmi", "event_run_islands",
    "event_transitions", "explode_with_ordinality", "filter_like_prefix",
    "fuzzy_name_match", "hourly_spine_fill", "json_prop_extraction",
    "latest_event_agg_join", "latest_event_window", "monthly_event_stats",
    "ohlc_hourly_bars", "order_by_case_precedence",
    "pivot_returnflag_by_status", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue",
    "rollup_region_nation_customers", "scd2_user_value_bands",
    "semi_join_customers_with_open_orders", "sessionize_events",
    "simhash_near_dup", "simhash_signature", "stream_scd2_intervals",
    "stream_transitions", "top3_items_per_supplier", "tumbling_window_hourly",
    "union_all_literals", "weekly_activity_profile", "window_lag_transitions",
})

# Triple-green rows from the round-10 gate (CORRECTNESS_r10.json): 50/50
# green, zero failures, zero errors — the GATE_PRIORITY_R10 re-gates (the
# whole OSM README reference contract, the text family, the r10
# scale-killer dispatches) plus the two newly registered prebuilt ANN
# probes earning their first driver green.
DRIVER_VERIFIED_R10: frozenset[str] = frozenset({
    "ann_ivf_probe_prebuilt", "ann_ivfpq_probe_prebuilt", "ann_topk_int8",
    "approx_distinct_users_by_type", "asof_join_tolerance",
    "corpus_shuffle_shards", "curation_canonical_docs",
    "curation_contamination_report", "curation_decontaminate",
    "curation_pack_sequences", "curation_quality_filter",
    "curation_stratified_sample", "customer_rfm_segments",
    "dataset_split_assign", "dedup_containment_pairs", "dedup_duplicate_spans",
    "dedup_minhash_lsh_dfcap", "dedup_spans_clean", "doc_fingerprint",
    "doc_winnowing_fingerprints", "dupgraph_triangle_stats",
    "embedding_int8_quantize", "fuzzy_name_match", "lang_confusion_matrix",
    "lang_id_char_ngrams", "lang_id_heuristic", "multimodal_decode_meta",
    "multimodal_resize", "osm_changesets_josm", "osm_changesets_liberty_island",
    "osm_changesets_with_comment", "osm_deleted_count", "osm_latest_versions",
    "osm_latest_versions_window", "osm_tag_additions_window",
    "osm_tag_usage_by_month", "osm_ways_reassembly", "pagerank_trade_graph",
    "part_abc_pareto", "percentiles_value_by_type",
    "rolling_hour_user_activity", "simhash_near_dup", "text_bigram_coverage",
    "text_bm25_topk", "text_ngram_vocab", "text_pii_redact",
    "text_quality_scores", "text_repetition_scores", "text_tfidf_topk",
    "text_token_stats",
})

DRIVER_VERIFIED: frozenset[str] = (
    DRIVER_VERIFIED_R01 | DRIVER_VERIFIED_R02 | DRIVER_VERIFIED_R03
    | DRIVER_VERIFIED_R04 | DRIVER_VERIFIED_R05 | DRIVER_VERIFIED_R06
    | DRIVER_VERIFIED_R08 | DRIVER_VERIFIED_R09 | DRIVER_VERIFIED_R10
)

# Explicit gate order for round 5.  Every registered query has a driver row
# and all oracle-backed ones are triple-green, so r5's slots go to queries
# whose CONTRACT or IMPLEMENTATION changed this round — they must re-earn
# their green — with the remaining ~37 slots falling through to verified
# re-confirmations.
GATE_PRIORITY_R05: tuple[str, ...] = (
    # The two sketches: now oracle-backed via bounded-invariant contracts
    # (exact anchors + within-guarantee booleans the oracle pins to TRUE).
    "approx_distinct_users_by_type", "approx_percentiles_value_by_type",
    # Output contract changed: recall-vs-cost curve over (nprobe, shortlist).
    "ann_ivfpq_recall",
    # Oracle SQL changed (fit_m=MAX_FIT_ROWS absolute fit cap threaded
    # through the Lloyd CTE twins) and/or impl changed (persist removal).
    "ann_ivf_kmeans", "ann_pq_adc", "ann_ivfpq_probe", "dedup_semantic_kmeans",
    # Variance numerator moved to IEEE double in both engines.
    "embedding_dim_stats",
    # min/max dup filter replaced countDistinct; spans_clean composes it.
    "dedup_duplicate_spans", "dedup_spans_clean",
    # df via count-over-window replaced groupBy+join-back (one shingle
    # exchange instead of three).
    "dedup_ppjoin", "dedup_containment_ppjoin",
    # Bounded driver-side funnel materialization replaced the leaked persist.
    "curation_mix_report",
    # Timestamp-unit pinning in the applyInPandasWithState kernels.
    "stream_transitions", "stream_scd2_intervals",
)

# Explicit gate order for round 6 (registry frozen at 162 per the r5
# verdict; slots go to impl-touched queries first, then to the longest-
# unconfirmed greens).  r6 touched: the duplicate-spans rewrite (window →
# skew-safe partial agg + semi join), the dedup_components strategy pick
# (bounded driver union-find under CC_COLLECT_MAX_EDGES) and everything
# composing it, the 5-sigma HLL contract, and every query whose persist
# sites moved to release_with cache scoping (results identical by
# construction — re-gated anyway because the implementation changed).
GATE_PRIORITY_R06: tuple[str, ...] = (
    # spans rewrite (verdict #2)
    "dedup_duplicate_spans", "dedup_spans_clean",
    # components strategy pick (verdict #4) + composers
    "dedup_components", "curation_canonical_docs", "curation_training_mix",
    "curation_mix_report", "dupgraph_triangle_stats",
    # HLL band 3σ→5σ (advice #4)
    "approx_distinct_users_by_type",
    # release_with cache scoping (verdict #3)
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_minhash_lsh_dfcap",
    "simhash_near_dup", "dedup_containment_pairs", "dedup_containment_ppjoin",
    "dedup_ppjoin", "dedup_minhash_calibration", "pagerank_trade_graph",
    "embedding_near_dup_lsh", "embedding_lsh_calibration", "ann_ivf_probe",
)


# Explicit gate order for round 7 (registry frozen at 162).  r7 touched:
# the PPJoin df rewrite (count-over-window(shingle) → skew-safe
# groupBy(shingle).count() + AQE-splittable join-back, the r6 verdict's
# only two weaks) and every query whose explicit unpersist sites moved to
# the refcount-aware safe_unpersist (results identical by construction —
# re-gated anyway because the implementation changed).  The remaining
# slots fall to the stalest never-re-confirmed greens via the key below
# (the ~112 queries last confirmed r1–r5 and not in the r6 window).
GATE_PRIORITY_R07: tuple[str, ...] = (
    # PPJoin df skew fix (r6 verdict #1) + the queries composing the
    # shared shingle path
    "dedup_ppjoin", "dedup_containment_ppjoin",
    # span-stream persist (r6 verdict #3 diagnosis: with the r6 groupBy
    # shape, the cache now beats re-explode) + its composer
    "dedup_duplicate_spans", "dedup_spans_clean",
    # safe_unpersist routing (r6 advice #3): components + composers,
    # and the two curation quality finally-blocks
    "dedup_components", "curation_canonical_docs", "curation_training_mix",
    "curation_mix_report", "dupgraph_triangle_stats",
    # r7 rank-cap skew pass: canonical-docs' component window became a
    # max(struct) aggregate (canonical + training_mix + mix_report above
    # re-gate it), the source/lang rank caps gained the literal
    # conjunct that turns on map-side WindowGroupLimit pruning, and
    # prototype_prune's exposed per-label rank became the two-level
    # bucket rank
    "curation_source_cap", "curation_temperature_mix",
    "embedding_prototype_prune",
)


# Triple-green rows added by the round-7 gate (CORRECTNESS_r07.json):
# 50/50 green, zero failures, zero errors.
DRIVER_VERIFIED_R07: frozenset[str] = frozenset({
    "ann_ivf_index_stats", "ann_ivf_recall", "ann_matryoshka_rerank",
    "asof_join_last_purchase", "bag_setops_nations", "corpus_shuffle_shards",
    "correlated_min_price_parts", "cube_orders_priority_status",
    "curation_canonical_docs", "curation_dedup_report", "curation_mix_report",
    "curation_source_cap", "curation_temperature_mix", "curation_training_mix",
    "dedup_components", "dedup_containment_ppjoin", "dedup_duplicate_spans",
    "dedup_ppjoin", "dedup_spans_clean", "dupgraph_triangle_stats",
    "embedding_prototype_prune", "full_outer_nation_presence",
    "intersect_except_nations", "lang_confusion_matrix",
    "multimodal_decode_meta", "multimodal_resize", "osm_snapshot_at",
    "percentiles_value_by_type", "q10_returned_item_losers",
    "q12_priority_shipping_mix", "q13_customer_distribution",
    "q14_promo_revenue_share", "q15_top_supplier",
    "q17_small_quantity_revenue", "q18_large_volume_orders",
    "q19_discounted_revenue", "q22_global_sales_opportunity",
    "q4_order_priority_check", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "range_join_value_bands", "salted_hot_key_agg",
    "scalar_function_corpus", "stream_segment_rollup", "text_bigram_coverage",
    "text_ngram_vocab", "text_pii_redact", "window_rank_suite",
    "zorder_key_events",
})


# Explicit gate order for round 8 (registry frozen at 162).  r8 touched:
# (a) the shared _cosine helper moved to try_divide (r7 advice: under
# Spark 4 ANSI a zero-norm vector raised DIVIDE_BY_ZERO and killed the
# job) — identical output wherever the norm is non-zero, but the
# physical expression changed for EVERY query scoring a cosine, so the
# whole family re-earns its driver green (the r6/r7 "identical by
# construction — re-gated anyway" precedent); (b) the per-vector argmax
# in ann_ivf_probe / ann_ivf_index_stats became a map-side max_by
# aggregate (r7 verdict #6); (c) embedding_prototype_prune's bucket keys
# became null-safe (r7 advice).  The sessionize family is NOT here: the
# split-and-stitch variant is non-registered and the registered plan is
# byte-identical.  Note on the r7 verdict's ">=40 stale slots" target:
# the try_divide advice fix touched a 17-query shared helper, so this
# round's stale re-confirmations get the remaining ~33 slots —
# correctness-first ordering (impl-touched before stale) follows the
# standing precedent.
# Explicit gate order for round 9 (registry frozen at 162).  r9 wired
# the measured scale paths INTO the registered queries as automatic
# strategy switches (r8 verdict #1): below every probe threshold the
# gate-SF plans are byte-identical to r8 (thresholds sit far above the
# gate SFs), but the registered IMPLEMENTATIONS changed, so the whole
# switched family re-earns its green first — the r6/r7/r8 "identical by
# construction, re-gated anyway" precedent:
# (a) the per-user window family now probes max-rows-per-key and
#     delegates to the proven chunked split-and-stitch spellings when
#     hot (operators/switches.py);
# (b) simhash_near_dup probes corpus size and delegates to the exact
#     recursive-pigeonhole refinement in the coincidence regime;
# (c) embedding_near_dup_lsh probes its level-1 bucket sizes and
#     engages adaptive band refinement when saturated;
# (d) ann_ivf_kmeans's probe core was extracted to _ivf_topk (shared
#     with the new fit-once/probe-many surface), and the IVF / IVF-PQ
#     probe scans moved to the Arrow-vectorized kernel
#     (_ann_scan_vectorized — collect-identical to the expression
#     forms, test-asserted; ann_probe_vectorized in SCALING_SKEW);
# (e) the stream_transitions / stream_scd2_intervals stateful kernels
#     were vectorized (identical emissions, oracle-checked).
# The remaining slots fall to the stalest never-re-confirmed greens.
GATE_PRIORITY_R09: tuple[str, ...] = (
    "sessionize_events", "window_lag_transitions", "event_transitions",
    "event_run_islands", "scd2_user_value_bands", "asof_join_next_event",
    "asof_join_last_purchase",
    "simhash_near_dup", "embedding_near_dup_lsh",
    "ann_ivf_kmeans", "ann_ivf_probe", "ann_ivfpq_probe", "ann_ivfpq_recall",
    "ann_ivf_recall", "dedup_semantic_kmeans",
    "stream_transitions", "stream_scd2_intervals",
)


# Explicit gate order for round 10 (registry grows 162 -> 164: the
# prebuilt ANN probes earn registration per the r9 verdict #3).  The r9
# verdict's #1 leads: 28 greens are three rounds stale (last confirmed
# r6) — including the REFERENCE CONTRACT itself, the whole OSM README
# corpus, plus the text family — so they head the 50-slot gate as
# re-confirmations (last-green-r6 set, recomputed from all nine
# CORRECTNESS files).  Then the r10 impl-touched queries re-earn their
# green: simhash_near_dup's regime switch moved from corpus-size to the
# sampled coincidence-mass probe (r9 verdict #4; gate-SF plans stay
# byte-identical — sf0.1's flat-bucket mass is ~10^3 pairs, far below
# the 2^28 threshold).  The two NEW prebuilt probes sort into the
# following tier automatically (not yet in DRIVER_VERIFIED), landing at
# slots ~30-31; remaining slots fall to the stalest r7 greens.
GATE_PRIORITY_R10: tuple[str, ...] = (
    # reference contract: the six README queries + the OSM window corpus
    "osm_ways_reassembly", "osm_latest_versions", "osm_latest_versions_window",
    "osm_deleted_count", "osm_tag_usage_by_month", "osm_changesets_with_comment",
    "osm_changesets_josm", "osm_changesets_liberty_island",
    "osm_tag_additions_window",
    # text family (last green r6)
    "text_token_stats", "text_quality_scores", "text_tfidf_topk",
    "text_repetition_scores", "text_bm25_topk", "lang_id_heuristic",
    "lang_id_char_ngrams", "doc_winnowing_fingerprints", "doc_fingerprint",
    # remaining r6-stale greens
    "ann_topk_int8", "embedding_int8_quantize", "approx_distinct_users_by_type",
    "curation_decontaminate", "curation_pack_sequences",
    "curation_quality_filter", "curation_stratified_sample",
    "dataset_split_assign", "dedup_minhash_lsh_dfcap", "pagerank_trade_graph",
    # r10 impl-touched: the coincidence-mass regime probe, the
    # degree-ordered triangle core, the bucket-banded
    # sorted-neighborhood join, and the decontamination flat-mass switch
    # (curation_decontaminate is already gated above as an r6-stale
    # re-confirmation; its dual re-gates here) — all output identical,
    # property-tested, re-gated per the standing precedent
    "simhash_near_dup", "dupgraph_triangle_stats", "fuzzy_name_match",
    "curation_contamination_report", "corpus_shuffle_shards",
    # r10 late: df-cap spelling moved from broadcast anti-join to the
    # df join-back (dedup_minhash_lsh_dfcap re-gates from the stale
    # tier above; its containment sibling re-gates here)
    "dedup_containment_pairs",
    # r10 scale-killer #11: the unpartitioned dimension-window pair now
    # dispatches through the dim-window switch (gate-SF plans stay
    # byte-identical — both dimensions are far below DIM_WINDOW_ROWS_MAX
    # at sf0.01 — but the dispatch code is new, so both re-gate)
    "customer_rfm_segments", "part_abc_pareto",
    # r10 scale-killer #12: the trailing-RANGE-frame query joins the
    # window-family switch (ghost-replication chunked twin for hot keys),
    # and the tolerance as-of joins the family routing (same carry shape
    # as asof_join_last_purchase)
    "rolling_hour_user_activity", "asof_join_tolerance",
    # r10 scale-killer #13: exact percentiles dispatch to the grouped
    # two-level order-statistic spelling above the bar (gate SFs stay on
    # the byte-identical aggregate plan; dispatch code is new)
    "percentiles_value_by_type",
)


# Explicit gate order for round 11 (registry grows 164 -> 165: the kNN
# self-join over the prebuilt IVF index registers this round).  The r10
# verdict's #1 leads: 30 greens are last-confirmed r7 — by the end of
# r11 they would be four rounds stale — so they head the gate as
# re-confirmations (last-green-r7 set, recomputed from all ten
# CORRECTNESS files; exactly the verdict's 30).  The remaining 19 slots
# fall to the oldest r8 cohort, leading with the ANN probe family (the
# new kNN join composes _ivf_topk, so its neighbors re-confirm beside
# it), the dedup shingle core, and the streaming suite.  The NEW
# ann_knn_join_prebuilt is not listed: it auto-sorts into the
# new-with-oracle tier immediately after this list (slot 50).  The
# 17 r8-stale queries that miss this round's gate lead R12.
GATE_PRIORITY_R11: tuple[str, ...] = (
    # --- 30 r7-stale greens (verdict #1; recomputed last-green == r7) ---
    "q4_order_priority_check", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "q10_returned_item_losers",
    "q12_priority_shipping_mix", "q13_customer_distribution",
    "q14_promo_revenue_share", "q15_top_supplier",
    "q17_small_quantity_revenue", "q18_large_volume_orders",
    "q19_discounted_revenue", "q22_global_sales_opportunity",
    "bag_setops_nations", "correlated_min_price_parts",
    "cube_orders_priority_status", "full_outer_nation_presence",
    "intersect_except_nations", "scalar_function_corpus",
    "window_rank_suite", "range_join_value_bands", "salted_hot_key_agg",
    "zorder_key_events", "osm_snapshot_at", "stream_segment_rollup",
    "curation_dedup_report", "curation_mix_report", "curation_source_cap",
    "curation_temperature_mix", "curation_training_mix",
    # --- 19 oldest-r8 fills: ANN probes (kNN-join neighbors), the dedup
    # shingle core, the streaming suite ---
    "ann_topk_bruteforce", "ann_topk_batch", "ann_pq_adc",
    "ann_matryoshka_rerank", "ann_topk_hamming", "ann_hamming_recall",
    "ann_ivf_index_stats",
    "dedup_ppjoin", "dedup_containment_ppjoin", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_minhash_calibration", "dedup_components",
    "stream_hourly_rollup", "stream_session_windows", "stream_dedup_events",
    "stream_user_totals", "stream_ohlc_bars", "stream_purchase_attribution",
)


GATE_PRIORITY_R08: tuple[str, ...] = (
    # plan-shape changes first. r8 late change: the dedup verify family
    # moved from exploded fan-out joins to in-task array_intersect over
    # per-doc shingle arrays (0.61x, bit-identical at sf0.1) — re-gate
    # every query whose plan that touched, incl. transitive consumers.
    "dedup_ppjoin", "dedup_containment_ppjoin", "dedup_minhash_lsh",
    "dedup_containment_pairs", "dedup_minhash_calibration",
    "dedup_ngram_jaccard", "dedup_components",
    # earlier r8 changes: max_by argmax, null-safe bucket rank, and
    # the DSIR double-persist (audit_scans found the tokenize+explode
    # subtree planned 4x; measured 1.9x at sf0.1)
    "ann_ivf_probe", "ann_ivf_index_stats", "embedding_prototype_prune",
    "curation_dsir_select",
    # try_divide cosine family (direct users of _cosine)
    "ann_topk_bruteforce", "embedding_near_dup_pairs", "ann_topk_batch",
    "ann_ivf_kmeans", "embedding_near_dup_lsh", "embedding_lsh_calibration",
    "ann_pq_adc", "ann_ivfpq_probe", "ann_matryoshka_rerank",
    "dedup_semantic_kmeans", "ann_topk_hamming",
    # transitive users (recall evals compose the probes above)
    "ann_ivfpq_recall", "ann_ivf_recall", "ann_hamming_recall",
)


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that populate the registry.  Import order
    # matters: composed oracles (curation) are assembled from earlier
    # registry entries at import time.  Gate ORDER is applied afterwards.
    from osm2orc_spark.queries import relational  # noqa: F401
    from osm2orc_spark.operators import dedup, similarity, text, multimodal  # noqa: F401
    from osm2orc_spark.operators import ann_index, curation, graph, layout  # noqa: F401
    from osm2orc_spark.queries import advanced, osm_corpus, sequences, tpch_extra  # noqa: F401
    from osm2orc_spark.streaming import events  # noqa: F401

    reg_index = {name: i for i, name in enumerate(REGISTRY)}
    prio_index = {name: i for i, name in enumerate(GATE_PRIORITY_R11)}
    # Staleness tier for verified re-confirmations: the round a query was
    # LAST driver-confirmed — oldest greens re-confirm first (r5 verdict
    # #7: "then never-re-confirmed r1 greens").
    last_confirmed = {}
    for rnd, names in enumerate(
        (DRIVER_VERIFIED_R01, DRIVER_VERIFIED_R02, DRIVER_VERIFIED_R03,
         DRIVER_VERIFIED_R04, DRIVER_VERIFIED_R05, DRIVER_VERIFIED_R06,
         DRIVER_VERIFIED_R07, DRIVER_VERIFIED_R08, DRIVER_VERIFIED_R09,
         DRIVER_VERIFIED_R10),
        start=1,
    ):
        for n in names:
            last_confirmed[n] = rnd  # later rounds overwrite earlier ones

    def key(name: str) -> tuple[int, int, int]:
        # The r11 priority list re-gates stale + impl-touched queries first.
        if name in prio_index:
            return (0, prio_index[name], 0)
        no_oracle = REGISTRY[name].oracle is None
        if name not in DRIVER_VERIFIED and not no_oracle:  # new this round
            return (1, 0, reg_index[name])
        if name not in DRIVER_VERIFIED:  # rows-only: weakest gate signal, last
            return (2, 0, reg_index[name])
        # already driver-verified: stalest confirmation first
        return (3, last_confirmed[name], reg_index[name])

    return {name: REGISTRY[name] for name in sorted(REGISTRY, key=key)}

"""Query registry: every implemented operator exposed as (spark_fn, oracle_sql).

Each submodule maps one family of SURVEY.md §2 operators onto the driver's
TPC-H-ish test tables (region nation customer supplier part orders lineitem
events documents embeddings) and provides an ANSI-SQL oracle for DuckDB.
"""

from __future__ import annotations

from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec, collect


def all_queries() -> dict[str, QuerySpec]:
    # Imports deferred so a syntax error in one family doesn't kill the rest
    # during development; order defines display order.
    from gcp_healthcare_data_pipeline_spark.queries import (  # noqa: PLC0415
        analytics_queries,
        curation_queries,
        dedup_queries,
        event_queries,
        extended_queries,
        gold_analogs,
        lake_queries,
        pipeline_queries,
        silver_analogs,
        stats_queries,
        streaming_queries,
        text_queries,
        training_queries,
        vector_queries,
        window_queries,
    )

    out = collect(
        gold_analogs.QUERIES,
        lake_queries.QUERIES,
        silver_analogs.QUERIES,
        dedup_queries.QUERIES,
        text_queries.QUERIES,
        vector_queries.QUERIES,
        event_queries.QUERIES,
        window_queries.QUERIES,
        extended_queries.QUERIES,
        streaming_queries.QUERIES,
        curation_queries.QUERIES,
        stats_queries.QUERIES,
        training_queries.QUERIES,
        pipeline_queries.QUERIES,
        analytics_queries.QUERIES,
    )
    ordered = {n: out.pop(n) for n in _DRIVER_PRIORITY if n in out}
    ordered.update(out)
    return ordered


# The driver's correctness gate emits rows for the FIRST 50 registry
# entries only, so display order decides which queries get hard
# driver-vs-oracle evidence each round. Round-16 rotation (r15 verdict
# item 2): head = the TWO never-sampled round-16 additions (IVF-PQ
# tombstone delete maintenance; the Gopher intra-doc repetition
# filters), then q_stream_semdedup (this round's
# plan-changed query: its foreachBatch body now loads standing state
# from the versioned store, results bit-identical), then the full
# 14-query r11-evidence cohort (the oldest standing rows — retiring
# r11 entirely, as r15 retired r10), then 33 of the 43-query r12
# cohort (alphabetical — the next-oldest evidence). That is exactly
# 50 slots; the remaining 10 r12 members are listed at 51+ so any
# sampling overrun refreshes oldest evidence first, then
# q_dedup_reinstate (plan changed this round: conditional candidate
# broadcast, results bit-identical, r15 evidence still fresh), and
# everything after follows plain registry order.
_DRIVER_PRIORITY = [
    # NEW this round (never driver-sampled)
    "q_ann_ivfpq_deletes",
    "q_repetition_gopher",
    # plan changed this round, results bit-identical (loads the
    # standing semdedup state instead of rebuilding it)
    "q_stream_semdedup",
    # the full r11-evidence cohort (oldest standing rows; retire r11)
    "q_snapshot_diff",
    "q_stats_by_flag",
    "q_stratified_sample",
    "q_stream_dedup",
    "q_stream_stateful_profiles",
    "q_stream_static_join",
    "q_stream_stream_join",
    "q_stream_tumbling",
    "q_stream_upsert",
    "q_tfidf_topterms",
    "q_token_budget",
    "q_train_split",
    "q_unpivot_balances",
    "q_user_zscore",
    # the r12 cohort, 34 of 43 (next-oldest evidence)
    "q_above_avg_orders",
    "q_ann_lsh",
    "q_approx_distinct",
    "q_approx_quantiles",
    "q_cdc_apply",
    "q_cluster_balance",
    "q_compaction_roundtrip",
    "q_conversion_latency",
    "q_coreset_select",
    "q_countmin_heavy",
    "q_cube_sales",
    "q_dq_checks",
    "q_embedding_quantize",
    "q_event_transitions",
    "q_events_variant",
    "q_ewma_values",
    "q_feature_hashing",
    "q_golden_record",
    "q_group_split",
    "q_hll_incremental",
    "q_image_coreset",
    "q_importance_weights",
    "q_knn_graph",
    "q_market_share",
    "q_mart_refresh",
    "q_oov_rate",
    "q_pmi_collocations",
    "q_regional_supplier_volume",
    "q_robust_outliers",
    "q_rolling_active_users",
    "q_sequence_pattern",
    "q_set_ops",
    "q_shipping_priority",
    # ---- 51+ : the remaining 10 r12-cohort members, then the
    # plan-changed-but-fresh reinstatement query, so a sampling
    # overrun refreshes oldest rows first; after these the tail is
    # plain registry order
    "q_skew_diagnose",
    "q_stream_backfill",
    "q_stream_left_join",
    "q_stream_session",
    "q_stream_sliding",
    "q_stream_timeout_flush",
    "q_unigram_logprob",
    "q_version_diff",
    "q_weighted_sample",
    "q_zorder_stats",
    "q_dedup_reinstate",
]

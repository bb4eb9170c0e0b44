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
# driver-vs-oracle evidence each round. Round-15 rotation (r14 verdict
# item 2): head = the SIX never-sampled round-15 additions (the three
# persisted-lifecycle gates, the filter-then-rerank search, the
# tombstone delete maintenance, and the takedown reinstatement), then the three PQ-family queries
# whose RESULT VALUES changed this round (codebooks now train on a
# bounded hash-stratified sample, so every code and ADC distance
# moved; the r14 rows are evidence for a build that no longer ships),
# then the five queries whose PLAN changed with bit-identical results
# (q_text_canonical — corpus-derived twin offset; q_temperature_mix /
# q_domain_mix / q_psi_drift / q_ab_chi_square — the tiny-frame window
# spelling), then the LAST EIGHT r10-evidence queries (retiring the
# r10 cohort entirely — 5 rounds stale), and 28 of the 43-query r11
# cohort (the next-oldest evidence; q_domain_mix counts against the
# cohort from the plan-changed section). That is exactly 50 slots; the
# remaining 14 r11 members are listed at 51+ so any sampling overrun
# refreshes oldest evidence first, and everything after them follows
# plain registry order.
_DRIVER_PRIORITY = [
    # NEW this round (never driver-sampled)
    "q_index_roundtrip",
    "q_pq_roundtrip",
    "q_ivf_roundtrip",
    "q_ann_rerank",
    "q_ann_ivf_deletes",
    "q_dedup_reinstate",
    # result values changed this round (sample-trained PQ codebooks)
    "q_ann_pq",
    "q_ann_ivfpq",
    "q_pq_incremental",
    # plan changed, results bit-identical (derived offset / tiny-frame
    # window)
    "q_text_canonical",
    "q_temperature_mix",
    "q_domain_mix",
    "q_psi_drift",
    "q_ab_chi_square",
    # the last eight r10-evidence queries (oldest rows in the registry)
    "q_quarantine_documents",
    "q_rarity_score",
    "q_rolling_fingerprint",
    "q_sql_revenue_by_segment",
    "q_text_quality",
    "q_token_count",
    "q_token_count_bpe",
    "q_topk_orders",
    # the r11 cohort, 28 of 43 (next-oldest evidence)
    "q_boilerplate",
    "q_dedup_substring",
    "q_fuzzy_name_match",
    "q_contamination",
    "q_customer_running_total",
    "q_customers_no_orders",
    "q_dedup_passages",
    "q_events_asof_error",
    "q_events_error_rate",
    "q_events_funnel",
    "q_events_sessionize",
    "q_events_sliding",
    "q_events_tumbling",
    "q_gap_fill",
    "q_grouping_sets",
    "q_incremental_agg",
    "q_length_histogram",
    "q_ntile_quartiles",
    "q_percentiles",
    "q_pii_redaction",
    "q_profile_table",
    "q_range_join_shipping",
    "q_retention_cohorts",
    "q_rolling_revenue",
    "q_salted_agg",
    "q_salted_join",
    "q_sequence_packing",
    "q_shuffle_export",
    # ---- 51+ : the remaining 14 r11-cohort members (q_domain_mix sits
    # in the plan-changed head section already), so a sampling
    # overrun refreshes oldest rows first; after these the tail is
    # plain registry order
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
]

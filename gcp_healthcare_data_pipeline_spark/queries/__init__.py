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
# driver-vs-oracle evidence each round. Rounds 2-4 always checked the
# same first 50; the families below had no driver row ever (pipeline
# end-to-end gates, streaming, curation, stats, training, the post-slot-
# 50 extended ops) or were red in round 4 (the event-time queries, now
# fixed — they must prove green). Long-green families (gold/silver,
# dedup, text, vector, windows) rotate behind slot 50; their evidence is
# CHECK_LOCAL_r05.txt + pytest.
_DRIVER_PRIORITY = [
    # reference end-to-end gates (silver.sql + gold.sql full pipeline)
    "q_pipeline_provider_charge_summary",
    "q_pipeline_patient_history",
    "q_pipeline_provider_performance",
    "q_pipeline_department_performance",
    "q_pipeline_financial_metrics",
    "q_pipeline_payor_performance",
    # structured streaming (red in r4 via read_events_stream, now fixed)
    "q_stream_stateful_profiles",
    "q_stream_tumbling",
    "q_stream_dedup",
    "q_stream_static_join",
    "q_stream_stream_join",
    "q_stream_upsert",
    # event-time batch analytics (red in r4, now encoding-dispatched)
    "q_events_tumbling",
    "q_events_sessionize",
    "q_events_error_rate",
    "q_events_funnel",
    "q_retention_cohorts",
    "q_events_asof_error",
    "q_events_sliding",
    "q_gap_fill",
    # curation / stats / training / multimodal families (never checked)
    "q_corpus_curation",
    "q_boilerplate",
    "q_user_zscore",
    "q_percentiles",
    "q_length_histogram",
    "q_stats_by_flag",
    "q_fuzzy_name_match",
    "q_profile_table",
    "q_train_split",
    "q_stratified_sample",
    "q_tfidf_topterms",
    "q_contamination",
    "q_pii_redaction",
    "q_sequence_packing",
    "q_domain_mix",
    "q_token_budget",
    "q_multimodal_features",
    # rows-only but self-certifying (embedded subsample_recall column) —
    # kept inside the driver window so the quality pin is recorded
    "q_ann_lsh",
    # round-5 additions (no driver row yet)
    "q_dedup_passages",
    "q_shuffle_export",
    # extended ops past old slot 50 (never checked)
    "q_incremental_agg",
    "q_snapshot_diff",
    "q_rolling_revenue",
    "q_set_ops",
    "q_cube_sales",
    "q_grouping_sets",
    "q_unpivot_balances",
    "q_approx_distinct",
    "q_range_join_shipping",
    "q_customers_no_orders",
    "q_pivot_order_status",
]

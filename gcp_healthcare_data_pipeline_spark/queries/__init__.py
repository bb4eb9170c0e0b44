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
# driver-vs-oracle evidence each round. Round-17 rotation (r16 verdict
# item 3): head = the SIX never-sampled round-17 additions (the text
# dedup lifecycle gate, the composed curation pipeline, the IVF-PQ
# loaded-index serving twin, the streaming text-dedup screen, the
# segment-store compaction gate, the takedown gate), then
# q_dedup_incremental (plan changed this round: its screen now loads
# the committed standing corpus index, results bit-identical), then
# the full 10-query r12-evidence cohort
# (the oldest standing rows — retiring r12 entirely, as r16 retired
# r11), then 33 of the 47-query r13 cohort (alphabetical — the
# next-oldest evidence). That is exactly 50 slots; the remaining 14 r13
# members are listed at 51+ so any sampling overrun refreshes oldest
# evidence first, and everything after follows plain registry order.
_DRIVER_PRIORITY = [
    # NEW this round (never driver-sampled)
    "q_dedup_roundtrip",
    "q_curation_pipeline",
    "q_ann_ivfpq_serve",
    "q_stream_text_dedup",
    "q_dedup_compaction",
    "q_dedup_takedown",
    # plan changed this round, results bit-identical (loads the
    # standing text-dedup corpus index instead of rebuilding it)
    "q_dedup_incremental",
    # the full r12-evidence cohort (oldest standing rows; retire r12)
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
    # the r13 cohort, 33 of 47 (next-oldest evidence, alphabetical)
    "q_ann_ivf",
    "q_basket_affinity",
    "q_catalog_coverage",
    "q_charge_summary",
    "q_customer_order_dist",
    "q_dedup_exact",
    "q_disjunct_revenue",
    "q_dominant_suppliers",
    "q_dormant_rich_customers",
    "q_fanout_profile",
    "q_forecast_revenue",
    "q_group_regression",
    "q_important_parts",
    "q_kmeans",
    "q_lang_confusion",
    "q_lang_id",
    "q_large_volume_customers",
    "q_min_cost_supplier",
    "q_multimodal_decode",
    "q_nation_trade",
    "q_part_supplier_counts",
    "q_parts_ordered",
    "q_pipeline_department_performance",
    "q_pipeline_financial_metrics",
    "q_pipeline_patient_history",
    "q_pipeline_payor_performance",
    "q_pipeline_provider_charge_summary",
    "q_pipeline_provider_performance",
    "q_pipeline_sf",
    "q_pivot_order_status",
    "q_pricing_summary",
    "q_priority_late_exists",
    "q_product_profit",
    # ---- 51+ : the remaining 14 r13-cohort members, so a sampling
    # overrun refreshes oldest rows first; after these the tail is
    # plain registry order
    "q_promo_revenue_share",
    "q_rate_spikes",
    "q_returned_item_loss",
    "q_revenue_gini",
    "q_rollup_sales",
    "q_semdedup",
    "q_shipmode_priority",
    "q_small_quantity_revenue",
    "q_source_overlap",
    "q_stream_scd2",
    "q_supplier_hhi",
    "q_top_supplier",
    "q_video_coreset",
    "q_waiting_suppliers",
]

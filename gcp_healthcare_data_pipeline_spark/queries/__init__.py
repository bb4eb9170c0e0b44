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
# driver-vs-oracle evidence each round. Round-9 rotation (the round-6
# block had been left pinned through r7/r8, freezing the sample): the
# 6 pipeline gates, then ALL 36 queries that have never had a driver
# row (the 7 round-7 additions, the 11 round-6 stragglers, and all 18
# round-9 additions), then 8 continuity picks drawn from the OLDEST
# driver evidence (the 3 r2-only rows + one per r4 family: SCD2,
# dedup, text, vector, gold mart). Union of driver rows across rounds
# covers every registry query; rotated-out entries all hold green
# r4-r8 rows.
_DRIVER_PRIORITY = [
    # reference end-to-end gates (silver.sql + gold.sql full pipeline)
    "q_pipeline_provider_charge_summary",
    "q_pipeline_patient_history",
    "q_pipeline_provider_performance",
    "q_pipeline_department_performance",
    "q_pipeline_financial_metrics",
    "q_pipeline_payor_performance",
    # never-driver-sampled: round-7 additions
    "q_pipeline_sf",
    "q_stream_scd2",
    "q_multimodal_decode",
    "q_top_supplier",
    "q_waiting_suppliers",
    "q_important_parts",
    "q_priority_late_exists",
    # never-driver-sampled: round-6 stragglers
    "q_basket_affinity",
    "q_catalog_coverage",
    "q_fanout_profile",
    "q_group_regression",
    "q_lang_confusion",
    "q_mom_growth",
    "q_psi_drift",
    "q_rate_spikes",
    "q_revenue_gini",
    "q_source_overlap",
    "q_supplier_hhi",
    # new this round (first driver evidence): sf-scale SCD2 merge,
    # live-JDBC ingest, the completed TPC-H set, multimodal codecs
    "q_scd2_sf",
    "q_jdbc_ingest",
    "q_multimodal_audio",
    "q_multimodal_video",
    "q_min_cost_supplier",
    "q_product_profit",
    "q_shipmode_priority",
    "q_small_quantity_revenue",
    "q_dominant_suppliers",
    "q_pricing_summary",
    "q_forecast_revenue",
    "q_returned_item_loss",
    "q_promo_revenue_share",
    "q_part_supplier_counts",
    "q_customer_order_dist",
    "q_large_volume_customers",
    "q_disjunct_revenue",
    "q_dormant_rich_customers",
    # continuity: last sampled r2
    "q_parts_ordered",
    "q_pivot_order_status",
    "q_rollup_sales",
    # continuity: one r4 pick per family
    "q_scd2_customer",
    "q_dedup_exact",
    "q_lang_id",
    "q_ann_ivf",
    "q_charge_summary",
]

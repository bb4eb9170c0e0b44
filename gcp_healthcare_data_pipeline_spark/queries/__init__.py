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
    # changed THIS round (r10): SCD2 NULL-key bypass, Derby table
    # keying, WAV probe/vectorized stats, adaptive-LSH corpus curation
    "q_scd2_sf",
    "q_scd2_customer",
    "q_jdbc_ingest",
    "q_multimodal_audio",
    "q_multimodal_video",
    "q_multimodal_features",
    "q_corpus_curation",
    "q_semdedup",
    "q_kmeans",
    "q_cluster_balance",
    "q_knn_graph",
    # oldest driver evidence (last sampled r4) - freshness rotation;
    # includes the four adaptive-LSH dedup queries changed this round
    "q_dedup_minhash_lsh",
    "q_dedup_clusters",
    "q_dedup_incremental",
    "q_dedup_containment",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_scd2_two_runs",
    "q_scd2_corrected",
    "q_sql_revenue_by_segment",
    "q_patient_history",
    "q_provider_performance",
    "q_department_performance",
    "q_conform_union",
    "q_quarantine_documents",
    "q_incremental_watermark",
    "q_token_count",
    "q_token_count_bpe",
    "q_rolling_fingerprint",
    "q_text_quality",
    "q_fingerprint",
    "q_ann_topk",
    "q_embedding_neardup",
    "q_topk_orders",
    "q_order_items_agg",
    "q_events_json_props",
    "q_bpe_merges",
    "q_repetition_ratio",
    "q_quality_gate",
    "q_doc_chunking",
    "q_rarity_score",
    "q_heavy_hitters",
    "q_bm25_search",
    "q_embedding_outliers",
    # r4-era q_salted_agg/q_salted_join rotate next round (both are
    # synthetic demos with dedicated runtime tests in tests/test_skew.py)
]

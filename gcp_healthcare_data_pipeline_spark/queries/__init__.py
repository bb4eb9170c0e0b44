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

    return collect(
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
    )

"""Silver-zone bucketing: the co-located-join layout for gold at scale.

The gold marts join patients ⟕ encounters ⟕ transactions on the patient
id and transactions ⟕ claims on the transaction id (gold.sql:75-81,
121-127). Bucketing each silver table on its dominant join key turns the
patient-chain joins into zero-exchange sort-merge joins; only the
claims join still re-shuffles the transaction side (one table cannot be
co-located on two keys — at deployment, claims-heavy workloads would
flip transactions' bucket key or materialize a second layout).

This is an optional post-silver step: path-parquet stays the source of
truth (restartability), bucketed catalog tables are a derived layout.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from gcp_healthcare_data_pipeline_spark.sources.writers import (
    write_bucketed_table,
)

# entity -> (bucket/sort key serving the gold joins)
SILVER_BUCKET_KEYS = {
    "patients": "SRC_PatientID",
    "encounters": "PatientID",
    "transactions": "PatientID",
    "claims": "TransactionID",
}


def bucketize_silver(
    spark: SparkSession, warehouse: str, n_buckets: int = 16
) -> dict[str, str]:
    """Materialize bucketed catalog tables from the silver parquet zone.

    Returns entity -> catalog table name.
    """
    out = {}
    for entity, key in SILVER_BUCKET_KEYS.items():
        path = os.path.join(warehouse, "silver", entity)
        if not os.path.isdir(path):
            continue
        table = f"silver_{entity}_bucketed"
        write_bucketed_table(
            spark.read.parquet(path), table, (key,), n_buckets
        )
        out[entity] = table
    return out


def bucketize_scd2_sf(
    spark: SparkSession, sf_dir: str, n_buckets: int = 16
) -> tuple[str, str]:
    """Materialize the sf-scale SCD2 target + source batches as catalog
    tables bucketed (and sorted) on the business key ``txn_id``.

    This is the at-scale layout for the silver MERGE (operators/
    scd2.py:68, reference silver.sql:142-199): with both sides bucketed
    on the key with the same bucket count, the merge's full-outer join
    consumes the bucketing as its required hash distribution — NO
    shuffle exchange, the property tests/test_scd2_bucketed_sf.py pins
    at sf0.1. At 100 TB this is the difference between re-shuffling the
    whole current table every nightly run and a scan-local merge.

    Returns (target_table, source_table).
    """
    from gcp_healthcare_data_pipeline_spark.queries.pipeline_queries import (  # noqa: PLC0415
        scd2_sf_batches,
    )

    target, source = scd2_sf_batches(spark, sf_dir)
    t_name, s_name = "scd2_sf_target_bucketed", "scd2_sf_source_bucketed"
    write_bucketed_table(target, t_name, ("txn_id",), n_buckets)
    write_bucketed_table(source, s_name, ("txn_id",), n_buckets)
    return t_name, s_name

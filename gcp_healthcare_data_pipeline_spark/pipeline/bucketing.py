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

"""Dim-aware sizing (r13): block/cluster budgets are FLOATS, not rows.

The k-means block target, the IVF target-cluster mod, and the vector
shard budget all bound memory/fold costs that scale with rows x dims, so
their row counts derive from the embedding width: a 1024-dim corpus gets
16-row blocks (not a 16x-ed broadcast and 16x per-row fold work). These
tests pin the derivation at two dims on BOTH engines — the DuckDB twin
(_K_SQL / _BLOCK_SQL) must stay in bit-lockstep with Spark's
_derived_k / _block_rows_agg.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries import vector_queries as vq


def _corpus(spark, n: int, dims: int):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dims - 1}), "
            "i -> sin(cast(id * (i + 3) as double)))"
        ).alias("v"),
    )


def test_block_rows_pinned_at_two_dims(spark):
    """floor(16384/dims): 256 rows at the 64-dim testdata (bit-identical
    k to every pre-r13 round there), 16 rows at 1024 dims."""
    for dims, expect_block in ((64, 256), (1024, 16)):
        emb = _corpus(spark, 100, dims)
        got = emb.agg(vq._block_rows_agg().alias("b")).collect()[0]["b"]
        assert got == expect_block, (dims, got)


def test_derived_k_pinned_at_two_dims(spark):
    """Same corpus row count, different widths: k = max(8, ceil(n/block))
    must differ exactly by the dims ratio once above the K_MIN floor."""
    n = 10000
    for dims, expect_k in ((64, math.ceil(n / 256)), (1024, math.ceil(n / 16))):
        emb = _corpus(spark, n, dims)
        got = vq._derived_k(emb).collect()[0]["_k"]
        assert got == expect_k == max(
            vq._KMEANS_K_MIN, math.ceil(n / (vq._TARGET_BLOCK_FLOATS // dims))
        ), (dims, got)


def test_k_derivation_cross_engine_parity(spark):
    """_K_SQL (the DuckDB twin) and _derived_k agree bit-for-bit at
    8 / 64 / 1024 dims — the arithmetic both engines must share for
    every vector-family oracle to keep hash-matching on any corpus."""
    con = duckdb.connect()
    for dims in (8, 64, 1024):
        for n in (5, 500, 10000):
            emb = _corpus(spark, n, dims)
            spark_k = vq._derived_k(emb).collect()[0]["_k"]
            pdf = pd.DataFrame(
                {"vec_id": range(n), "v": [[0.0] * dims] * n}
            )
            con.register("edata", pdf)
            duck_k = con.sql(
                f"WITH e AS (SELECT vec_id, v FROM edata) SELECT {vq._K_SQL}"
            ).fetchone()[0]
            assert spark_k == duck_k, (dims, n, spark_k, duck_k)


def test_ivf_adaptive_mod_dim_aware(spark):
    """The IVF seed mod derives from dims the same way: at 8 dims the
    adaptive mod is 2048, so a 4000-row corpus seeds ids {0, 2048} — two
    centroids — where the 64-dim testdata still seeds every 256th id."""
    from gcp_healthcare_data_pipeline_spark.operators.similarity import (
        IVF_TARGET_CLUSTER_FLOATS,
    )

    assert IVF_TARGET_CLUSTER_FLOATS // 64 == 256
    assert IVF_TARGET_CLUSTER_FLOATS // 1024 == 16

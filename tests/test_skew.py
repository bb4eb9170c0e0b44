"""Salted aggregation must reproduce the plain groupBy exactly, including
on a heavily skewed key distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.operators.skew import salted_agg


def test_salted_matches_plain_on_skew(spark):
    # 10k rows for the hot key, 10 for the cold one
    rows = [(i, "hot" if i < 10000 else "cold", float(i % 97) / 7.0)
            for i in range(10010)]
    df = spark.createDataFrame(rows, "uid long, k string, v double")

    salted = {
        r.k: (r.n_rows, r.total, r.avg)
        for r in salted_agg(df, ["k"], "v", "uid", salts=16).collect()
    }
    plain = {
        r.k: (r.n, round(r.s, 2), round(r.s / r.n, 4))
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert set(salted) == set(plain)
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert salted[k][1] == pytest.approx(plain[k][1], abs=0.011)
        assert salted[k][2] == pytest.approx(plain[k][2], abs=0.00011)


def test_salted_spreads_hot_key(spark):
    # the partial phase must produce multiple rows for a hot key
    rows = [(i, "hot", 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "uid long, k string, v double")
    partial = df.groupBy(
        "k", F.pmod(F.col("uid"), F.lit(16)).alias("_salt")
    ).count()
    assert partial.count() == 16

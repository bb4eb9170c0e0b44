"""Arrow pandas-UDF API surface: scalar and grouped-aggregate variants.

The engine's production paths deliberately stay JVM-side (SURVEY §2.10 —
no UDFs needed for parity; multimodal uses mapInPandas, z-score
normalization uses applyInPandas, profiles use applyInPandasWithState).
These tests pin the remaining two Arrow UDF variants — SCALAR and
GROUPED_AGG — as supported surface, each asserted equivalent to its
JVM-side built-in twin so the slow path can always be cross-checked
against the fast one.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType


@F.pandas_udf(LongType())
def _vec_token_count(text: pd.Series) -> pd.Series:
    # vectorized batch op on the Arrow-transferred column
    return text.str.split(" ").str.len().astype("int64")


@F.pandas_udf(DoubleType())
def _vec_weighted_mean(v: pd.Series, w: pd.Series) -> float:
    return float((v * w).sum() / w.sum())


def test_scalar_pandas_udf_matches_builtin(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["tok"] * (i % 7 + 1))) for i in range(200)],
        "id long, text string",
    )
    out = df.select(
        "id",
        _vec_token_count("text").alias("py_count"),
        F.size(F.split("text", " ")).cast("long").alias("jvm_count"),
    )
    assert out.filter(F.col("py_count") != F.col("jvm_count")).count() == 0


def test_grouped_agg_pandas_udf_matches_builtin(spark):
    df = spark.createDataFrame(
        [(i % 5, float(i), float(i % 3 + 1)) for i in range(300)],
        "g long, v double, w double",
    )
    py = (
        df.groupBy("g")
        .agg(F.round(_vec_weighted_mean("v", "w"), 9).alias("wm"))
        .collect()
    )
    jvm = (
        df.groupBy("g")
        .agg(
            F.round(
                F.sum(F.col("v") * F.col("w")) / F.sum("w"), 9
            ).alias("wm")
        )
        .collect()
    )
    assert sorted(map(tuple, py)) == sorted(map(tuple, jvm))


def test_scalar_pandas_udf_usable_as_window_input(spark):
    # scalar pandas UDFs compose with downstream JVM ops (window rank)
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i % 3, "x " * (i % 5 + 1)) for i in range(60)],
        "g long, text string",
    )
    w = Window.partitionBy("g").orderBy(
        F.col("n").desc(), F.col("text").asc()
    )
    out = (
        df.withColumn("n", _vec_token_count(F.rtrim("text")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    rows = out.collect()
    assert len(rows) == 3
    assert all(r.n == 5 for r in rows)  # longest text per group wins

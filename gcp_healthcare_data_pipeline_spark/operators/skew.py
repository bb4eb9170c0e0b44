"""Skew-aware aggregation: explicit two-phase salted groupBy.

AQE's skew-join handling covers joins, but a groupBy over a column with a
handful of hot keys still funnels each hot key through one reducer. The
classic fix: salt the key, pre-aggregate on (key, salt), then merge the
partials. Both phases stay map-side-combinable and whole-stage-codegen;
the result is identical to the plain aggregation because SUM/COUNT are
associative (MIN/MAX likewise; AVG derives from SUM/COUNT).

The salt here is deterministic (a mod over a unique column) so results
are reproducible and oracle-checkable; production can salt on any
uniform expression.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    unique_col: str,
    salts: int = 16,
) -> DataFrame:
    """Two-phase SUM/COUNT over possibly-skewed ``key_cols``.

    Output: key_cols + (n_rows, total, avg) — identical values to a plain
    ``groupBy(key).agg(...)``, but the first shuffle spreads each hot key
    over ``salts`` reducers.
    """
    salt = F.pmod(F.col(unique_col), F.lit(salts)).alias("_salt")
    partial = df.groupBy(*key_cols, salt).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(value_col).alias("_s"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_n").alias("n_rows"),
        F.round(F.sum("_s"), 2).alias("total"),
        F.round(F.sum("_s") / F.sum("_n"), 4).alias("avg"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_unique: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (possibly hot-keyed) fact side with a
    deterministic mod over a unique column and replicate the dim side once
    per salt, so one hot join key spreads over ``salts`` reducers instead
    of funneling through one.

    This is the manual form of AQE's skew-join split — useful when the
    skew is known ahead of time (AQE only reacts to runtime partition
    stats) or when AQE is off. Result is row-identical to the plain join;
    the replication factor costs ``salts`` copies of the (small) dim side
    in the shuffle, never a copy of the fact side.
    """
    salt = F.pmod(F.col(fact_unique), F.lit(salts))
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salts)]))
    )
    cond = (f[fact_key] == d[dim_key]) & (f["_salt"] == d["_salt"])
    return f.join(d, cond, how).drop("_salt")

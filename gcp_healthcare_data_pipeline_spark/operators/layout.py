"""Z-order (Morton-curve) clustering layout for multi-dimensional
data skipping.

A table sorted by one column skips files well for predicates on that
column and terribly for any other. Interleaving the bits of two (or
more) range-bucketed dimensions into a single Morton code and clustering
files by that code gives every interleaved dimension locality: each file
covers a small SQUARE of the key grid instead of a full-width stripe, so
min/max file statistics prune scans on either column — the layout behind
Delta OPTIMIZE ZORDER BY and friends, built here from plain integer
arithmetic.

Everything is exact integer math (range-bucket via integral division,
bit interleave via shift/mask), expressible identically in Spark SQL and
DuckDB — ``morton_sql`` emits the same expression for both dialects, so
the oracle-gated query (queries/analytics_queries.py:q_zorder_stats)
hash-checks the full layout computation cross-engine.

At 100 TB: bucket bounds come from one tiny min/max aggregate (or from
table statistics); the layout write is one range-partition exchange on
the Morton code — the same single shuffle a plain sort-by-one-column
layout costs, but with skipping power on every clustered dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_sql(col: str, lo: str, hi: str, bits: int, dialect: str) -> str:
    """Range-bucket ``col`` from [lo, hi] into 2**bits integral buckets.

    ``lo``/``hi`` are SQL expressions (usually scalar-subquery or joined
    min/max columns). Exact integer math; ``least`` guards the top edge
    (col == hi lands in the last bucket).
    """
    n = 1 << bits
    div = "DIV" if dialect == "spark" else "//"
    return (
        f"least({n - 1}, (({col} - {lo}) * {n}) {div} ({hi} - {lo} + 1))"
    )


def morton_sql_n(cols: list[str], bits: int) -> str:
    """Interleave the low ``bits`` bits of N bucket ids round-robin:
    column j's bit i lands at position i*N + (N-1-j), so earlier columns
    take the more significant slot within each round. Identical syntax
    in Spark SQL and DuckDB (``>>``, ``<<``, ``&``, ``+``)."""
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            pos = i * n + (n - 1 - j)
            terms.append(f"((({c} >> {i}) & 1) << {pos})")
    return "(" + " + ".join(terms) + ")"


def morton_sql(a: str, b: str, bits: int) -> str:
    """Two-dimensional special case of ``morton_sql_n``: a's bit i goes
    to position 2i+1, b's to 2i."""
    return morton_sql_n([a, b], bits)


def zorder_assign(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 5,
    n_files: int = 16,
) -> DataFrame:
    """Add ``_za``/``_zb`` (bucket ids), ``_zval`` (Morton code), and
    ``_zfile`` (deterministic target-file id: contiguous Morton ranges).

    Bucket bounds come from one broadcast min/max aggregate over the
    input — a scalar-sized crossJoin, not a data shuffle.
    """
    stats = df.agg(
        F.min(col_a).alias("_amin"),
        F.max(col_a).alias("_amax"),
        F.min(col_b).alias("_bmin"),
        F.max(col_b).alias("_bmax"),
    )
    out = df.crossJoin(F.broadcast(stats))
    out = out.withColumn(
        "_za",
        F.expr(bucket_sql(col_a, "_amin", "_amax", bits, "spark")),
    ).withColumn(
        "_zb",
        F.expr(bucket_sql(col_b, "_bmin", "_bmax", bits, "spark")),
    )
    out = out.withColumn("_zval", F.expr(morton_sql("_za", "_zb", bits)))
    cells = 1 << (2 * bits)
    per_file = max(cells // n_files, 1)
    return out.withColumn(
        "_zfile", F.expr(f"_zval DIV {per_file}")
    ).drop("_amin", "_amax", "_bmin", "_bmax")


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 5,
    n_files: int = 16,
) -> None:
    """Materialize the clustered layout: one directory per contiguous
    Morton range, rows sorted by the code within each — min/max footer
    stats then prune on BOTH columns."""
    assigned = zorder_assign(df, col_a, col_b, bits, n_files)
    (
        assigned.repartition(F.col("_zfile"))
        .sortWithinPartitions("_zval")
        .drop("_za", "_zb", "_zval")
        .write.mode("overwrite")
        .partitionBy("_zfile")
        .parquet(path)
    )

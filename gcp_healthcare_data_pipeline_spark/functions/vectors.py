"""Vector math over ``array<float>`` embedding columns — JVM built-ins only.

``F.aggregate`` / ``F.zip_with`` keep the dot product inside whole-stage
codegen; arrays are cast to double first so accumulation order and
precision match the (double-based) oracle. No Python UDFs: at 100 TB the
Arrow hop per batch would dominate; these expressions vectorize in Tungsten.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_precomputed(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with norms computed once per vector instead of once per
    pair — O(n) instead of O(n·m) norm work in pairwise scoring, with a
    bit-identical result (multiplication of the same doubles)."""
    return dot(a, b) / (norm_a * norm_b)

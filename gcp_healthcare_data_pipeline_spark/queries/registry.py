from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One correctness-gated query.

    ``fn(spark, sf_dir) -> DataFrame``; ``oracle`` is equivalent DuckDB SQL
    over the pre-registered parquet views, or None for non-SQL-expressible
    operators (driver then records a weaker rows-only check).
    Column names/aliases MUST match between fn's output and the oracle.
    """

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ids: str = ""  # SURVEY.md §2 operator ids this query exercises


def collect(*groups: Iterable[QuerySpec]) -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for group in groups:
        for spec in group:
            if spec.name in out:
                raise ValueError(f"duplicate query name: {spec.name}")
            out[spec.name] = spec
    return out

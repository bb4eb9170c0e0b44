"""Input-contract test for the date columns of orders/lineitem: under the
pinned ``nanosAsLong`` conf, a nanos-encoded writer surfaces
``o_orderdate`` / ``l_shipdate`` as raw BIGINT — load_tables must
normalize them back to TIMESTAMP so every date-filtering query works on
both encodings (the orders/lineitem sibling of test_events_encoding)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.session import load_tables

_BASE_US = 1_600_000_000 * 1_000_000  # 2020-09-13 UTC
_DAY_US = 86_400 * 1_000_000


def _orders_table(unit: str):
    mult = {"us": 1, "ns": 1000}[unit]
    return pa.table(
        {
            "o_orderkey": pa.array(range(20), pa.int64()),
            "o_custkey": pa.array([i % 5 for i in range(20)], pa.int64()),
            "o_totalprice": pa.array([10.0 * i for i in range(20)], pa.float64()),
            "o_orderdate": pa.array(
                [(_BASE_US + i * _DAY_US) * mult for i in range(20)],
                pa.timestamp(unit),
            ),
        }
    )


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    dirs = {}
    for unit in ("us", "ns"):
        d = tmp_path_factory.mktemp(f"orders_{unit}")
        pq.write_table(_orders_table(unit), d / "orders.parquet")
        dirs[unit] = str(d)
    return dirs


def test_orderdate_normalized_across_encodings(spark, encoded_dirs):
    results = {}
    for unit, sf_dir in encoded_dirs.items():
        orders = load_tables(spark, sf_dir, "orders")
        assert dict(orders.dtypes)["o_orderdate"].startswith("timestamp"), (
            f"{unit}: o_orderdate surfaced as {dict(orders.dtypes)['o_orderdate']}"
        )
        cutoff = F.lit("2020-09-20").cast("timestamp")
        results[unit] = sorted(
            tuple(r)
            for r in orders.filter(F.col("o_orderdate") >= cutoff)
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            )
            .collect()
        )
        assert results[unit], f"{unit}: date filter matched nothing"
    assert results["us"] == results["ns"]

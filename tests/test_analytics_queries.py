"""Semantic tests for the decision-support / DQ / stable-ID additions.

Tiny hand-built inputs with hand-computed expectations; the DuckDB oracle
gate (tools/check.py) covers engine parity on the real test tables.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.analytics_queries import (
    q_cdc_apply,
    q_dq_checks,
    q_stable_ids,
)


def test_stable_ids_are_contiguous_in_doc_id_order(spark, tmp_path):
    sf_dir = str(tmp_path / "sfx")
    # doc_ids deliberately sparse + unordered, spanning several 100-wide
    # range buckets including an EMPTY bucket (300-399)
    ids = [450, 7, 120, 0, 255, 119, 99, 100, 401]
    spark.createDataFrame([(i,) for i in ids], "doc_id long").write.parquet(
        sf_dir + "/documents.parquet"
    )
    out = q_stable_ids(spark, sf_dir).collect()
    got = {r.doc_id: r.stable_id for r in out}
    expect = {d: rank for rank, d in enumerate(sorted(ids))}
    assert got == expect


def test_dq_checks_flags_violations(spark, tmp_path):
    sf_dir = str(tmp_path / "sfx")
    rows = [
        # orderkey, custkey, status, totalprice, orderdate, priority
        (1, 10, "O", 5.0, "1996-01-01", "1-URGENT"),
        (1, 11, "F", 3.0, "1997-01-01", "2-HIGH"),     # duplicate key
        (2, None, "X", -1.0, "1980-01-01", "2-HIGH"),  # 3 violations
        (3, 12, "P", 2.0, "1998-01-01", "3-MEDIUM"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.parquet(
        sf_dir + "/orders.parquet"
    )
    out = {r.check_name: r for r in q_dq_checks(spark, sf_dir).collect()}
    assert set(out) == {
        "key_unique", "custkey_complete", "status_in_domain",
        "price_positive", "orderdate_in_range",
    }
    assert out["key_unique"].metric == 0.75 and not out["key_unique"].passed
    assert out["custkey_complete"].metric == 0.75
    assert out["status_in_domain"].metric == 0.75
    assert out["price_positive"].metric == 0.75
    assert out["orderdate_in_range"].metric == 0.75
    assert not any(r.passed for r in out.values())


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    ids=st.sets(st.integers(min_value=0, max_value=1500), max_size=30),
)
def test_stable_ids_property(spark, tmp_path_factory, ids):
    """For ANY sparse id set (empty buckets, bucket-boundary ids), the
    assigned ids are exactly the rank in ascending doc_id order."""
    if not ids:
        return
    sf_dir = str(tmp_path_factory.mktemp("sfx"))
    spark.createDataFrame(
        [(i,) for i in ids], "doc_id long"
    ).write.mode("overwrite").parquet(sf_dir + "/documents.parquet")
    got = {
        r.doc_id: r.stable_id for r in q_stable_ids(spark, sf_dir).collect()
    }
    assert got == {d: rank for rank, d in enumerate(sorted(ids))}


def test_cdc_apply_semantics(spark, tmp_path):
    """keys: 10 -> U (price +100), 11 -> D, 13 -> unchanged; %1000==2
    also synthesizes an insert keyed +10_000_000."""
    sf_dir = str(tmp_path / "sfx")
    rows = [(10, "F", 5.0), (11, "O", 3.0), (13, "P", 7.0), (2, "F", 4.0)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_totalprice double"
    ).write.parquet(sf_dir + "/orders.parquet")
    out = {r.o_orderkey: r for r in q_cdc_apply(spark, sf_dir).collect()}
    assert 11 not in out                       # delete applied
    assert out[10].total_price == 105.0        # update applied
    assert out[13].total_price == 7.0          # untouched row survives
    assert out[2].total_price == 4.0           # %10==2: not in U/D feed
    # key 2 also matches %1000==2, which synthesizes an insert at +10M
    assert out[10_000_002].total_price == 1.0 and out[10_000_002].order_status == "O"
    assert len(out) == 4


def test_dq_checks_all_pass_on_clean_table(spark, tmp_path):
    sf_dir = str(tmp_path / "sfx")
    rows = [(i, 10 + i, "O", 1.0 + i, "1996-01-01", "1-URGENT") for i in range(5)]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.parquet(
        sf_dir + "/orders.parquet"
    )
    out = q_dq_checks(spark, sf_dir).collect()
    assert len(out) == 5
    assert all(r.passed and r.metric == 1.0 for r in out)

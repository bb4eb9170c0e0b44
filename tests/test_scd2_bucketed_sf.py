"""SCD2 MERGE at sf0.1 on the bucketed layout must be exchange-free.

The at-scale claim in operators/scd2.py's module doc — "at 100 TB the
target table should be bucketed by the key so the join degenerates to a
co-located sort-merge without re-shuffle" — pinned as a plan assertion
over the REAL sf0.1 batches (600k rows/side), not a fixture: both sides
come from pipeline/bucketing.bucketize_scd2_sf, broadcast is disabled,
and the merge's full-outer join must introduce no Exchange.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.pipeline.bucketing import (
    bucketize_scd2_sf,
)
from gcp_healthcare_data_pipeline_spark.queries.pipeline_queries import (
    scd2_sf_batches,
    scd2_sf_merge,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.fixture(scope="module")
def bucketed(spark):
    names = bucketize_scd2_sf(spark, SF_DIR, n_buckets=16)
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_scd2_merge_is_exchange_free(spark, bucketed):
    t_name, s_name = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        merged = scd2_sf_merge(spark.table(t_name), spark.table(s_name))
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_merge_matches_unbucketed(spark, bucketed):
    t_name, s_name = bucketed

    def signature(df):
        return {
            tuple(r)
            for r in df.groupBy("is_current", "modified_date")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("amount_cents").alias("cents"),
            )
            .collect()
        }

    bucketed_merge = scd2_sf_merge(spark.table(t_name), spark.table(s_name))
    target, source = scd2_sf_batches(spark, SF_DIR)
    plain_merge = scd2_sf_merge(target, source)
    assert signature(bucketed_merge) == signature(plain_merge)


def test_sf_merge_zone_compaction(spark, tmp_path):
    """The sf merge output, fragmented the way incremental runs fragment
    silver (48 small task files), bin-packs back through the runner's
    scheduled maintenance stage (Runner.compact_zone) with row-identical
    content — write_bucketed_table covers the co-located-join layout,
    this covers the small-file hygiene half of the at-scale story."""
    from pyspark.sql import functions as F

    from gcp_healthcare_data_pipeline_spark.pipeline.runner import Runner

    target, source = scd2_sf_batches(spark, SF_DIR)
    merged = scd2_sf_merge(target, source)
    wh = str(tmp_path / "wh")
    path = os.path.join(wh, "silver", "scd2_sf")
    merged.repartition(48).write.parquet(path)
    n_before = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert n_before >= 48

    results = Runner(spark, wh).compact_zone("silver", target_bytes=1 << 30)
    assert results["scd2_sf"]["compacted"] is True
    n_after = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert n_after < n_before

    # content identical: same classification signature as the live merge
    def signature(df):
        return {
            tuple(r)
            for r in df.groupBy("is_current", "modified_date")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("amount_cents").alias("cents"),
            )
            .collect()
        }

    assert signature(spark.read.parquet(path)) == signature(merged)

"""Property tests for the round-6 operators.

- incremental_mart law: for ANY base/delta split and partition-determined
  mart, the partition-level refresh equals a from-scratch rebuild.
- versioning invariants: after ANY write sequence, the pointer names the
  last committed snapshot, its content matches, and retention holds.
- Morton bijectivity: for ANY dims/bits (small), the interleave is a
  permutation of the full cell grid — no two cells collide, no code
  escapes the range.
"""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.operators.incremental_mart import (
    incremental_mart,
)

# (id, partition, amount) rows; partitions from a tiny domain so deltas
# overlap existing partitions, miss some, and create new ones
rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=-5, max_value=5),
    ),
    max_size=25,
)


def _mart(df):
    return df.groupBy("p").agg(
        F.count(F.lit(1)).alias("n"), F.sum("amt").alias("total")
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy, mask=st.integers(min_value=0, max_value=7))
def test_incremental_mart_equals_full_rebuild(spark, rows, mask):
    # dedupe ids so base/delta split is well-defined
    uniq = {r[0]: r for r in rows}.values()
    base_rows = [r for r in uniq if r[0] % 8 > mask % 8 or r[0] % 8 == mask]
    delta_rows = [r for r in uniq if r not in base_rows]
    schema = "id long, p int, amt long"
    base = spark.createDataFrame(base_rows or [], schema)
    delta = spark.createDataFrame(delta_rows or [], schema)
    full = base.unionByName(delta)
    out = incremental_mart(_mart(base), full, delta, ["p"], _mart).collect()
    expected = _mart(full).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, expected))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=6), min_size=1, max_size=5),
    retain=st.integers(min_value=1, max_value=3),
)
def test_versioning_invariants(spark, tmp_path_factory, sizes, retain):
    from gcp_healthcare_data_pipeline_spark.operators.versioning import (
        latest_version,
        list_versions,
        read_version,
        write_version,
    )

    path = str(tmp_path_factory.mktemp("vprop") / "t")
    for i, n in enumerate(sizes):
        df = spark.range(n).select("id", F.lit(i).alias("gen"))
        v = write_version(df, path, retain=retain)
        assert v == i
    last = len(sizes) - 1
    assert latest_version(path) == last
    got = read_version(spark, path).collect()
    assert len(got) == sizes[-1]
    assert all(r.gen == last for r in got)
    on_disk = list_versions(path)
    assert on_disk == list(range(max(0, last - retain + 1), last + 1))


@given(
    n_dims=st.integers(min_value=1, max_value=4),
    bits=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=20, deadline=None)
def test_morton_is_bijective(n_dims, bits):
    import duckdb

    from gcp_healthcare_data_pipeline_spark.operators.layout import (
        morton_sql_n,
    )

    cols = [f"c{i}" for i in range(n_dims)]
    expr = morton_sql_n(cols, bits)
    side = 1 << bits
    pts = list(itertools.product(range(side), repeat=n_dims))
    values = ", ".join("(" + ",".join(map(str, p)) + ")" for p in pts)
    got = duckdb.sql(
        f"SELECT {expr} FROM (VALUES {values}) t({','.join(cols)})"
    ).fetchall()
    codes = sorted(r[0] for r in got)
    assert codes == list(range(side**n_dims))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.integers(min_value=1, max_value=400),
    n_files=st.integers(min_value=1, max_value=12),
)
def test_compaction_preserves_content_exactly(
    spark, tmp_path_factory, rows, n_files
):
    from gcp_healthcare_data_pipeline_spark.operators.compaction import (
        compact,
    )

    path = str(tmp_path_factory.mktemp("cprop") / "t")
    df = spark.range(rows).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 1.5).alias("v")
    )
    df.repartition(n_files).write.parquet(path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    compact(spark, path, target_bytes=1 << 30, force=True)
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before

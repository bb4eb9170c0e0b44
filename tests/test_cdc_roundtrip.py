"""Property: apply_feed(base, snapshot_diff(base, next)) == next.

Hypothesis generates arbitrary base/next snapshots (overlapping key
spaces, null values, equal and differing rows) and the CDC round-trip
must reconstruct ``next`` exactly — inserts added, deletes removed,
updates applied, unchanged rows untouched.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gcp_healthcare_data_pipeline_spark.operators.cdc import (
    apply_feed,
    snapshot_diff,
)

snapshot = st.dictionaries(
    keys=st.integers(min_value=0, max_value=12),
    values=st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),
    max_size=8,
)


def _df(spark, snap):
    schema = "key long, val long"
    if not snap:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(list(snap.items()), schema)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(base=snapshot, nxt=snapshot)
def test_cdc_roundtrip_reconstructs_next(spark, base, nxt):
    base_df, next_df = _df(spark, base), _df(spark, nxt)
    feed = snapshot_diff(base_df, next_df, ["key"], ["val"])
    got = {
        r.key: r.val
        for r in apply_feed(base_df, feed, ["key"], ["val"]).collect()
    }
    assert got == nxt


def test_diff_classifies_all_change_types(spark):
    base = _df(spark, {1: 10, 2: 20, 3: None, 4: 40})
    nxt = _df(spark, {1: 10, 2: 25, 3: 30, 5: 50})  # 2:U 3:null->U 4:D 5:I
    feed = {
        r.key: r.change_type
        for r in snapshot_diff(base, nxt, ["key"], ["val"]).collect()
    }
    assert feed == {2: "update", 3: "update", 4: "delete", 5: "insert"}

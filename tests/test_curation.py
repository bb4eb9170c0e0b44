"""Grouped-map vs window-function z-score equivalence.

q_user_zscore's registry plan is pure window functions (JVM-side);
user_zscore_grouped_map is the same math on the Arrow applyInPandas
surface.  They must produce identical rounded values — this pins the
grouped-map API (batch schema, ddof=1 stddev, NaN-on-singleton) while the
registry query takes the fast path.
"""

from __future__ import annotations

import math

from gcp_healthcare_data_pipeline_spark.queries.curation_queries import (
    q_user_zscore,
    user_zscore_grouped_map,
)

SF_DIR = "/root/testdata/sf0.001"


def _by_event(df):
    out = {}
    for r in df.collect():
        out[r["event_id"]] = (r["user_id"], r["zscore"])
    return out


def test_grouped_map_matches_window_plan(spark):
    fast = _by_event(q_user_zscore(spark, SF_DIR))
    slow = _by_event(user_zscore_grouped_map(spark, SF_DIR))
    assert fast.keys() == slow.keys()
    for eid, (uid_f, z_f) in fast.items():
        uid_s, z_s = slow[eid]
        assert uid_f == uid_s
        if z_f is None or (isinstance(z_f, float) and math.isnan(z_f)):
            assert z_s is None or math.isnan(z_s)
        else:
            assert abs(z_f - z_s) < 1e-9, (eid, z_f, z_s)

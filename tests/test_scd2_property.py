"""Property test: scd2_merge against an independent Python model.

Hypothesis generates arbitrary target states and source batches
(overlapping keys, NULLs in tracked columns, NULL business keys) and
runs TWO merge generations; the Spark operator must agree with a
~30-line reference model of the documented semantics — NULL-unsafe
``<>`` change detection, expire-without-reinsert (strict) vs
expire+insert (corrected), NULL keys never matching, history rows
immutable."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from gcp_healthcare_data_pipeline_spark.operators.scd2 import (
    scd2_initial,
    scd2_merge,
)

_SCHEMA = StructType(
    [
        StructField("k", IntegerType(), True),
        StructField("v", IntegerType(), True),
        StructField("inserted_date", StringType(), True),
        StructField("modified_date", StringType(), True),
        StructField("is_current", BooleanType(), True),
    ]
)

# key may be None (NULL business key); value may be None (NULL tracked)
snapshot = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=6)),
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
    ),
    max_size=6,
    unique_by=lambda t: t[0],
)


def _model_merge(state, src, ts, strict):
    """Reference model over row dicts. state: list of
    (k, v, ins, mod, cur)."""
    out = [r for r in state if not r[4]]  # history is immutable
    current = [r for r in state if r[4]]
    src_by_key = {k: v for k, v in src if k is not None}
    matched_keys = set()
    for k, v, ins, mod, cur in current:
        # NULL keys never match (MERGE ON semantics)
        if k is not None and k in src_by_key:
            matched_keys.add(k)
            sv = src_by_key[k]
            # NULL-unsafe <>: only literal TRUE expires
            differs = (v is not None and sv is not None and v != sv)
            if differs:
                out.append((k, v, ins, ts, False))  # expire
                if not strict:
                    out.append((k, sv, ts, ts, True))
            else:
                out.append((k, v, ins, mod, True))
        else:
            out.append((k, v, ins, mod, True))
    for k, sv in src:
        if k is None or k not in {r[0] for r in current if r[0] is not None}:
            out.append((k, sv, ts, ts, True))
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(s0=snapshot, s1=snapshot, s2=snapshot, strict=st.booleans())
def test_scd2_merge_agrees_with_model(spark, s0, s1, s2, strict):
    t0 = "2024-01-01"
    t1, t2 = "2024-02-01", "2024-03-01"

    # generation 0: initial load of s0
    state_df = scd2_initial(
        spark.createDataFrame(s0 or [], "k int, v int"), F.lit(t0)
    )
    state_model = [(k, v, t0, t0, True) for k, v in s0]

    for src, ts in ((s1, t1), (s2, t2)):
        state_df = scd2_merge(
            state_df,
            spark.createDataFrame(src or [], "k int, v int"),
            ["k"],
            ["v"],
            F.lit(ts),
            strict_reference_semantics=strict,
        ).localCheckpoint()
        state_model = _model_merge(state_model, src, ts, strict)

    got = sorted(
        [
            (
                r.k,
                r.v,
                str(r.inserted_date)[:10],
                str(r.modified_date)[:10],
                r.is_current,
            )
            for r in state_df.collect()
        ],
        key=str,
    )
    want = sorted(state_model, key=str)
    assert got == want

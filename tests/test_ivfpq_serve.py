"""q_ann_ivfpq_serve — the loaded-index serving twin of q_ann_ivfpq
(r16 verdict item 6).

Contract pinned here:
 1. serving from the LOADED versioned tables is row-identical to the
    same tombstone-aware ADC search run on the in-session build
    lineage (codeword doubles round-trip parquet bit-exactly);
 2. no tombstoned id ever appears in served results, and every query
    still fills its k slots from live vectors where the probed lists
    hold enough of them;
 3. the standing store builds+commits ONCE per (session, sf_dir) and
    subsequent calls only LOAD (the nightly cost model).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
    _DELETE_LABELS,
    _IVFPQ_STORES,
    _ivfpq_adc_serve,
    _ivfpq_standing_frames,
    clear_standing_ivfpq_store,
    q_ann_ivfpq_serve,
    standing_ivfpq_tables,
)
from gcp_healthcare_data_pipeline_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_serve_equals_build_lineage(spark):
    """The gate's core claim: searching from the LOADED store is
    row-identical to the identical search on the in-session build
    lineage — the persisted tables change the cost model, never the
    answer."""
    in_session = _ivfpq_adc_serve(
        spark, SF_DIR, _ivfpq_standing_frames(spark, SF_DIR)
    )
    assert _rows(q_ann_ivfpq_serve(spark, SF_DIR)) == _rows(in_session)


def test_served_results_exclude_tombstones(spark):
    dead = {
        r.vec_id
        for r in load_tables(spark, SF_DIR, "embeddings")
        .filter(
            (F.col("vec_id") % 10 != 0)
            & F.col("label").isin(*_DELETE_LABELS)
        )
        .select("vec_id")
        .collect()
    }
    rows = q_ann_ivfpq_serve(spark, SF_DIR).collect()
    assert rows, "serve returned nothing"
    assert not any(r.neighbor_id in dead for r in rows)
    # ranks are dense 1..k per query
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)


def test_store_builds_once_then_loads(spark):
    clear_standing_ivfpq_store()
    assert SF_DIR not in _IVFPQ_STORES
    loaded = standing_ivfpq_tables(spark, SF_DIR)
    expected = {"supers", "cmap", "inv", "codebook", "codes", "tombstones"}
    assert set(loaded) == expected
    root = _IVFPQ_STORES[SF_DIR]
    again = standing_ivfpq_tables(spark, SF_DIR)
    assert _IVFPQ_STORES[SF_DIR] == root
    for table in expected:
        vdirs = [
            d
            for d in os.listdir(os.path.join(root, table))
            if d.startswith("v=")
        ]
        assert len(vdirs) == 1, (table, vdirs)
    assert set(again) == expected


def test_clear_reclaims_store_dirs(spark):
    standing_ivfpq_tables(spark, SF_DIR)
    root = _IVFPQ_STORES[SF_DIR]
    assert os.path.isdir(root)
    clear_standing_ivfpq_store()
    assert not _IVFPQ_STORES
    assert not os.path.isdir(root)

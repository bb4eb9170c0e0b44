"""q_dedup_roundtrip + standing_dedup_tables — the persisted
standing-state lifecycle for the TEXT dedup family (r16 verdict item 1),
mirroring tests/test_index_roundtrip.py and tests/test_standing_store.py
for the vector family.

Contract pinned here:
 1. load-then-screen EQUALS rebuild-then-screen (strings and
    string-arrays round-trip parquet exactly);
 2. the standing store builds+commits ONCE per (session, sf_dir) and
    subsequent calls only LOAD;
 3. the maintenance half (append_dedup_delta) commits the batch as a
    NEW SEGMENT whose aggregated view equals a full rebuild over
    corpus ∪ batch — per-ingest write cost ∝ |batch|, never a corpus
    rewrite;
 4. hostile lifecycles: a crashed writer's corrupt orphan segment is
    invisible to loads and swept by the next append; an aged manifest
    keeps serving its consistent segment list after the store advances;
 5. the audited candidate space (_incremental_band_candidates) still
    matches the production loaded-band-table space row-for-row.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (
    _DEDUP_STORES,
    _commit_dedup_segments,
    _corpus_lsh_params,
    _dedup_screen,
    _dedup_state_frames,
    _incremental_band_candidates,
    _read_dedup_segments,
    append_dedup_delta,
    clear_standing_dedup_store,
    q_dedup_incremental,
    q_dedup_roundtrip,
    standing_dedup_tables,
)
from gcp_healthcare_data_pipeline_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        tuple(tuple(x) if isinstance(x, list) else x for x in row)
        for row in df.collect()
    )


def _rebuild_state(spark, sf_dir, pred):
    docs = load_tables(spark, sf_dir, "documents").select("doc_id", "text")
    return _dedup_state_frames(
        docs.filter(pred), _corpus_lsh_params(spark, sf_dir)
    )


def _profile_view(df):
    """Segment-insensitive view of the hash profile (partial counts
    summed per hash) — the aggregation the screen itself performs."""
    return df.groupBy("h").agg(F.sum("n_exact").alias("n_exact"))


def test_roundtrip_equals_rebuild_path(spark):
    """The gate's core claim: screening the batch from the LOADED
    versioned segments is row-identical to screening from the
    in-session corpus-state lineage."""
    rebuilt = _rebuild_state(spark, SF_DIR, F.col("doc_id") % 10 != 0)
    assert _rows(q_dedup_roundtrip(spark, SF_DIR)) == _rows(
        _dedup_screen(spark, SF_DIR, rebuilt)
    )


def test_store_builds_once_then_loads(spark):
    clear_standing_dedup_store()
    assert SF_DIR not in _DEDUP_STORES
    loaded = standing_dedup_tables(spark, SF_DIR)
    assert set(loaded) == {"hash_profile", "bands", "shingles"}
    root = _DEDUP_STORES[SF_DIR]
    again = standing_dedup_tables(spark, SF_DIR)
    assert _DEDUP_STORES[SF_DIR] == root
    for table in ("hash_profile", "bands", "shingles"):
        vdirs = [
            d
            for d in os.listdir(os.path.join(root, table))
            if d.startswith("v=")
        ]
        assert len(vdirs) == 1, (table, vdirs)
    assert set(again) == {"hash_profile", "bands", "shingles"}


def test_incremental_screens_from_loaded_store(spark):
    """q_dedup_incremental (the production per-ingest path) equals the
    roundtrip gate — both screen the same batch against the same
    committed corpus state."""
    assert _rows(q_dedup_incremental(spark, SF_DIR)) == _rows(
        q_dedup_roundtrip(spark, SF_DIR)
    )


def test_append_delta_segments_equal_full_rebuild(spark, tmp_path):
    """The maintenance half: after appending the batch as a new segment,
    the loaded multi-segment state aggregates to exactly the state a
    full rebuild over corpus ∪ batch would produce."""
    root = str(tmp_path / "store")
    corpus_frames = _rebuild_state(spark, SF_DIR, F.col("doc_id") % 10 != 0)
    _commit_dedup_segments(corpus_frames, root, run_id="nightly-000001")
    append_dedup_delta(spark, SF_DIR, root, run_id="ingest-000002")

    loaded = _read_dedup_segments(spark, root)
    full = _rebuild_state(spark, SF_DIR, F.lit(True))
    assert _rows(_profile_view(loaded["hash_profile"])) == _rows(
        _profile_view(full["hash_profile"])
    )
    assert _rows(loaded["bands"]) == _rows(full["bands"])
    assert _rows(loaded["shingles"]) == _rows(full["shingles"])
    # segment discipline: two live segments per table, corpus segment
    # untouched (never rewritten)
    for table in ("hash_profile", "bands", "shingles"):
        vdirs = sorted(
            d
            for d in os.listdir(os.path.join(root, table))
            if d.startswith("v=")
        )
        assert vdirs == ["v=000000", "v=000001"], (table, vdirs)


def test_compaction_preserves_screen_and_sweeps_on_next_append(
    spark, tmp_path
):
    """The merge phase of merge-on-read: compaction folds the live
    segments into one, screens read identical state before and after,
    the previous segments survive the compaction commit itself (reader
    grace via the aged manifest), and the NEXT append sweeps them."""
    from gcp_healthcare_data_pipeline_spark.operators.versioning import (
        read_snapshot_manifest,
    )
    from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (
        compact_dedup_segments,
    )

    root = str(tmp_path / "store")
    corpus_frames = _rebuild_state(spark, SF_DIR, F.col("doc_id") % 10 != 0)
    _commit_dedup_segments(corpus_frames, root, run_id="nightly-000001")
    append_dedup_delta(spark, SF_DIR, root, run_id="ingest-000002")
    before = _rows(_dedup_screen(spark, SF_DIR, _read_dedup_segments(spark, root)))

    compact_dedup_segments(spark, root, run_id="compact-000003")
    m = read_snapshot_manifest(root)
    assert all(len(vs) == 1 for vs in m["versions"].values()), m["versions"]
    after = _rows(_dedup_screen(spark, SF_DIR, _read_dedup_segments(spark, root)))
    assert before == after
    # grace window: the pre-compaction segments are still on disk and
    # the aged manifest still serves them
    assert sorted(
        d for d in os.listdir(os.path.join(root, "bands")) if d.startswith("v=")
    ) == ["v=000000", "v=000001", "v=000002"]
    aged = _read_dedup_segments(spark, root, run_id="nightly-000001")
    assert _rows(aged["bands"]) == _rows(corpus_frames["bands"])
    # the NEXT append sweeps the compacted-away segments
    append_dedup_delta(spark, SF_DIR, root, run_id="ingest-000004")
    assert sorted(
        d for d in os.listdir(os.path.join(root, "bands")) if d.startswith("v=")
    ) == ["v=000002", "v=000003"]


def test_corrupt_orphan_segment_invisible_and_swept(spark, tmp_path):
    """A writer that crashed AFTER writing a segment but BEFORE the
    pointer flip leaves a corrupt orphan: loads must never see it, and
    the next append must sweep it and commit cleanly."""
    root = str(tmp_path / "store")
    corpus_frames = _rebuild_state(spark, SF_DIR, F.col("doc_id") % 10 != 0)
    _commit_dedup_segments(corpus_frames, root, run_id="nightly-000001")
    # simulate the crash on the bands table: v1 data lands (not even
    # parquet), pointer and manifest never advance
    orphan = os.path.join(root, "bands", "v=000001")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-00000.parquet"), "w") as fh:
        fh.write("not parquet at all")
    loaded = _read_dedup_segments(spark, root)
    rebuilt = corpus_frames["bands"]
    assert _rows(loaded["bands"]) == _rows(rebuilt)
    # the next append sweeps the orphan and commits as a fresh v1
    append_dedup_delta(spark, SF_DIR, root, run_id="ingest-000002")
    full = _rebuild_state(spark, SF_DIR, F.lit(True))
    assert _rows(_read_dedup_segments(spark, root)["bands"]) == _rows(
        full["bands"]
    )


def test_aged_manifest_serves_consistent_segment_list(spark, tmp_path):
    """A reader holding the pre-append manifest keeps seeing exactly the
    corpus segments — never a half-appended state."""
    from gcp_healthcare_data_pipeline_spark.operators.versioning import (
        read_snapshot_manifest,
    )

    root = str(tmp_path / "store")
    corpus_frames = _rebuild_state(spark, SF_DIR, F.col("doc_id") % 10 != 0)
    _commit_dedup_segments(corpus_frames, root, run_id="nightly-000001")
    old_rows = _rows(_read_dedup_segments(spark, root)["bands"])
    append_dedup_delta(spark, SF_DIR, root, run_id="ingest-000002")
    # the aged manifest still resolves only its own segment list
    aged = _read_dedup_segments(spark, root, run_id="nightly-000001")
    assert _rows(aged["bands"]) == old_rows
    # and the current manifest sees both segments
    cur = read_snapshot_manifest(root)
    assert cur["versions"]["bands"] == [0, 1]


def test_audited_candidate_space_matches_production(spark):
    """The --pairs audit gate (_incremental_band_candidates, in-session
    lineage) must produce the same distinct (doc_id, corpus_id) pairs as
    the loaded standing band table joined against fresh batch keys."""
    from gcp_healthcare_data_pipeline_spark.operators.dedup import (
        band_keys,
        minhash_signatures,
        with_shingles,
    )

    r, nb, k = _corpus_lsh_params(spark, SF_DIR)
    state = standing_dedup_tables(spark, SF_DIR)
    batch = (
        load_tables(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 10 == 0)
    )
    bsh = with_shingles(batch, "text", n=3).select("doc_id", "shingles")
    bkeys = band_keys(
        minhash_signatures(bsh, "doc_id", "shingles", k=k), "doc_id", "sig",
        nb, r,
    )
    production = (
        bkeys.join(state["bands"], "band_key")
        .select("doc_id", "corpus_id")
        .distinct()
    )
    assert _rows(production) == _rows(
        _incremental_band_candidates(spark, SF_DIR)
    )


def test_roundtrip_cleans_up_workdir(spark):
    """The per-call versioned store is reclaimed after the result is
    pinned — no directory leak (the q_index_roundtrip discipline)."""
    import glob
    import tempfile

    before = set(
        glob.glob(os.path.join(tempfile.gettempdir(), "q_dedup_roundtrip_*"))
    )
    q_dedup_roundtrip(spark, SF_DIR).count()
    after = set(
        glob.glob(os.path.join(tempfile.gettempdir(), "q_dedup_roundtrip_*"))
    )
    assert after <= before


def test_clear_reclaims_store_dirs(spark):
    standing_dedup_tables(spark, SF_DIR)
    root = _DEDUP_STORES[SF_DIR]
    assert os.path.isdir(root)
    clear_standing_dedup_store()
    assert not _DEDUP_STORES
    assert not os.path.isdir(root)


def test_epoch_shape_travels_with_the_store(spark, tmp_path):
    """EPOCH POLICY, end to end: a store built when the corpus was one
    decade smaller keeps screening with ITS OWN pinned band shape after
    the corpus grows — never the shape a fresh derivation over the
    grown corpus would produce (which would orphan every persisted band
    row). The divergence regime is asserted, not assumed."""
    from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (
        _screen_frame,
        _standing_dedup_root,
        clear_shared_state,
        dedup_store_epoch,
    )

    src = "/root/testdata/sf0.1"  # 5000 docs -> derived shape (3, 10, 30)
    d = str(tmp_path / "grown")
    os.makedirs(d)
    docs = load_tables(spark, src, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    small = docs.orderBy("doc_id").limit(500)
    small.write.parquet(os.path.join(d, "documents.parquet"))

    root = _standing_dedup_root(spark, d)  # build: epoch pinned at n=500
    stored = dedup_store_epoch(root)
    assert stored == _corpus_lsh_params(spark, d)

    # the corpus GROWS a full decade in place; a fresh session derives
    # a different shape from the new size
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    clear_shared_state()  # drop the param cache = a new session's view
    grown = _corpus_lsh_params(spark, d)
    assert grown != stored, (
        f"corpus growth no longer changes the derived shape "
        f"({stored} vs {grown}) — resize the fixture"
    )

    # the screen still bands with the STORED epoch: row-identical to an
    # in-session screen of the grown batch against the small corpus
    # under the pinned shape
    state = _dedup_state_frames(
        small.select("doc_id", "text").filter(F.col("doc_id") % 10 != 0),
        stored,
    )
    batch = (
        load_tables(spark, d, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 10 == 0)
    )
    assert _rows(q_dedup_incremental(spark, d)) == _rows(
        _screen_frame(batch, state, stored)
    )

    # the maintenance half bands the appended delta under the stored
    # epoch too: post-append state aggregates to a full rebuild over
    # corpus ∪ batch under the PINNED shape
    append_dedup_delta(spark, d, root, run_id="ingest-000002")
    appended_docs = load_tables(spark, d, "documents").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") % 10 == 0)
    merged_plus = _dedup_state_frames(
        small.select("doc_id", "text")
        .filter(F.col("doc_id") % 10 != 0)
        .unionByName(appended_docs),
        stored,
    )
    loaded = _read_dedup_segments(spark, root)
    assert _rows(_profile_view(loaded["hash_profile"])) == _rows(
        _profile_view(merged_plus["hash_profile"])
    )
    assert _rows(loaded["bands"]) == _rows(merged_plus["bands"])
    assert dedup_store_epoch(root) == stored  # meta carried forward


def test_takedown_screens_immediately_and_purges_at_compaction(
    spark, tmp_path
):
    """Retraction is merge-on-read: one segment (negated hash partials +
    tombstones), retracted docs stop matching immediately, and the
    screen equals one over a corpus that never held them. Compaction
    then makes the delete PHYSICAL: tombstoned rows leave the merged
    band/shingle segments, fully-retracted hashes leave the profile,
    the tombstones table leaves the manifest — and the screen is
    unchanged."""
    from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (
        _screen_frame,
        compact_dedup_segments,
        dedup_store_epoch,
        retract_dedup_docs,
    )

    root = str(tmp_path / "store")
    docs = load_tables(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    params = _corpus_lsh_params(spark, SF_DIR)
    _commit_dedup_segments(
        _dedup_state_frames(corpus, params), root,
        run_id="nightly-000001", meta={"lsh": list(params)},
    )
    removed = corpus.filter(F.col("doc_id") % 7 == 0)
    retract_dedup_docs(removed, root, run_id="takedown-000002")

    batch = docs.filter(F.col("doc_id") % 10 == 0)
    shrunk = _dedup_state_frames(
        corpus.filter(F.col("doc_id") % 7 != 0), params
    )
    screened = _rows(
        _screen_frame(
            batch, _read_dedup_segments(spark, root), dedup_store_epoch(root)
        )
    )
    assert screened == _rows(_screen_frame(batch, shrunk, params))

    compact_dedup_segments(spark, root, run_id="compact-000003")
    state = _read_dedup_segments(spark, root)
    assert "tombstones" not in state
    removed_ids = {r.doc_id for r in removed.select("doc_id").collect()}
    assert removed_ids  # the retraction slice is non-empty
    live_band_ids = {
        r.corpus_id for r in state["bands"].select("corpus_id").collect()
    }
    assert not (live_band_ids & removed_ids)  # physically purged
    assert state["hash_profile"].filter(F.col("n_exact") <= 0).count() == 0
    after = _rows(
        _screen_frame(batch, state, dedup_store_epoch(root))
    )
    assert after == screened

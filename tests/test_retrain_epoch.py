"""Drift-triggered re-train epoch — the maintenance loop the
incremental PQ family documents, run end-to-end: encode deltas against
the FROZEN versioned codebook, watch the emitted per-subspace
quantization distance (q_pq_incremental's drift signal), and when a
drifted batch pushes it past the epoch threshold, re-train on the
drifted distribution, commit the new codebook as the NEXT version
(atomic pointer flip — readers mid-encode keep the old epoch), and
verify the new epoch actually fits the new data.

This is the executable form of the epoch policy the docstrings state:
"a rising qdist distribution tells the pipeline the frozen codebook no
longer fits the incoming data and a re-train epoch is due".
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.operators.versioning import (
    latest_version,
    read_version,
    write_version,
)
from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
    _pq_assign,
    _pq_codebook_and_codes,
    _pq_subvectors,
)


def _corpus(spark, n=400, dims=16, scale=1.0, seed_shift=0):
    """Deterministic synthetic corpus; ``scale`` shifts the value
    distribution to simulate upstream drift (new embedding model,
    renormalization) without randomness."""
    return spark.range(n).select(
        (F.col("id") + seed_shift).alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dims - 1}), i -> "
            f"{scale} * sin(cast((id + {seed_shift}) * (i + 2) as double)))"
        ).alias("v"),
    )


def _median_qdist(df):
    return df.agg(
        F.percentile_approx("_qdist", 0.5, 10000).alias("m")
    ).collect()[0]["m"]


def test_drift_triggers_retrain_epoch(spark, tmp_path):
    store = str(tmp_path / "codebook")

    # epoch 0: train on the standing corpus, commit as v0
    base = _corpus(spark, scale=1.0)
    cb0, _ = _pq_codebook_and_codes(spark, base)
    write_version(cb0, store)
    assert latest_version(store) == 0

    # nightly batch from the SAME distribution: qdist stays at the
    # trained-fit level
    same = _corpus(spark, n=80, scale=1.0, seed_shift=400)
    fit = _median_qdist(_pq_assign(_pq_subvectors(same), read_version(spark, store)))

    # drifted batch (upstream re-scaled embeddings 5x): the frozen
    # epoch-0 codebook no longer fits — the drift signal fires
    drifted = _corpus(spark, n=80, scale=5.0, seed_shift=480)
    drift = _median_qdist(
        _pq_assign(_pq_subvectors(drifted), read_version(spark, store))
    )
    threshold = 2.0 * fit  # the epoch policy: re-train at 2x trained fit
    assert drift > threshold, (fit, drift)

    # re-train epoch: fit the drifted distribution, commit as v1 (the
    # pointer flip is atomic; an encoder mid-batch keeps reading v0)
    old_reader = read_version(spark, store)
    cb1, _ = _pq_codebook_and_codes(spark, _corpus(spark, scale=5.0))
    write_version(cb1, store)
    assert latest_version(store) == 1
    # the pre-flip reader still resolves epoch 0's directory
    assert old_reader.count() == cb0.count()

    # epoch 1 fits the new distribution: against ITS OWN trained-fit
    # level (absolute qdist scales with the data's magnitude, so every
    # epoch's threshold is relative to its own fit — the same reason
    # epoch 0's threshold was 2x epoch-0 fit) the drifted batch is back
    # inside policy, and it improved >2x vs the stale epoch
    new_fit = _median_qdist(
        _pq_assign(
            _pq_subvectors(_corpus(spark, n=80, scale=5.0, seed_shift=560)),
            read_version(spark, store),
        )
    )
    refit = _median_qdist(
        _pq_assign(_pq_subvectors(drifted), read_version(spark, store))
    )
    assert refit <= 2.0 * new_fit, (fit, drift, new_fit, refit)
    assert refit < drift / 2.0, (drift, refit)
    # and time travel still reproduces the OLD epoch's encoding exactly
    # (reproducible-training-run pinning)
    v0_again = _median_qdist(
        _pq_assign(_pq_subvectors(drifted), read_version(spark, store, 0))
    )
    assert v0_again == drift
    assert sorted(os.listdir(store))[:2] == ["_LATEST", "v=000000"]

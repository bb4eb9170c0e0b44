"""Unit tests for the pure gate logic in the round-artifact tools.

These gates decide exit codes for round artifacts (STREAM_OVERHEAD.md,
SCALING_r*.md); their arithmetic must be testable without a Spark
session or a 12-minute measurement run.
"""

import sys

sys.path.insert(0, "/root/repo/tools")

from stream_overhead import (  # noqa: E402
    ENVELOPE_MARGIN,
    ENVELOPE_MED_S,
    ENVELOPE_SLACK_S,
    envelope_breaches,
)


def test_envelope_recorded_medians_pass():
    """The recorded medians themselves are green by construction."""
    assert envelope_breaches(dict(ENVELOPE_MED_S)) == []


def test_envelope_margin_and_slack():
    """Bound is median * 1.5 + 1.0 s: just-below passes, above breaches
    and the message names the stream and both sides of the comparison."""
    name = "q_stream_scd2"
    rec = ENVELOPE_MED_S[name]
    bound = rec * ENVELOPE_MARGIN + ENVELOPE_SLACK_S
    ok = dict(ENVELOPE_MED_S)
    ok[name] = bound - 0.01
    assert envelope_breaches(ok) == []
    bad = dict(ENVELOPE_MED_S)
    bad[name] = bound + 0.01
    (msg,) = envelope_breaches(bad)
    assert name in msg and f"{bound:.2f}" in msg


def test_envelope_detects_median_regression_class():
    """The motivating case: a genuine ~2.2x median regression on a
    sub-2 s stream must breach (the old max-based bound needed 8.5x)."""
    bad = dict(ENVELOPE_MED_S)
    bad["q_stream_scd2"] = ENVELOPE_MED_S["q_stream_scd2"] * 2.2
    assert envelope_breaches(bad)


def test_envelope_unknown_stream_is_a_breach():
    """A new stream without a recorded envelope fails loudly instead of
    silently passing ungated."""
    m = dict(ENVELOPE_MED_S)
    m["q_stream_new_thing"] = 0.1
    assert any("q_stream_new_thing" in b for b in envelope_breaches(m))


def test_envelope_missing_stream_is_a_breach():
    """The reverse direction: a recorded stream absent from the fresh
    run (registry typo, rotation edit) breaches — measuring 11 of 12
    streams must not exit green."""
    m = dict(ENVELOPE_MED_S)
    dropped = "q_stream_scd2"
    del m[dropped]
    breaches = envelope_breaches(m)
    assert any(dropped in b and "absent" in b for b in breaches)


from scaling_audit import classify_pair_growth  # noqa: E402


def _gate(p_small, d_small, p_big, d_big):
    return classify_pair_growth(
        p_small, d_small, p_big, d_big,
        watch_threshold=1.5, fail_threshold=12.0,
    )


def test_pair_gate_linear_growth_passes():
    """Pairs growing exactly with the data: no flag, no watch."""
    _, _, norm, fail, watch, sparse = _gate(1000, 500, 10000, 5000)
    assert not fail and not watch and not sparse
    assert abs(norm - 1.0) < 1e-9


def test_pair_gate_quadratic_with_material_baseline_fails():
    """Pairs-per-row growing ~20x on a 10x step (= near-quadratic total
    pairs) with a real baseline: FAIL."""
    _, _, norm, fail, _, sparse = _gate(1000, 500, 200000, 5000)
    assert fail and not sparse and norm > 12


def test_pair_gate_sparse_noise_passes():
    """3 -> 400 pairs on a 10x step is a norm of 13.3 built on a
    3-pair baseline — sparse-corpus noise: the norm alone would breach
    the 12x fail threshold (the ADVICE r10 bug class), but the absolute
    growth floor (1200) absorbs it."""
    _, _, norm, fail, watch, sparse = _gate(3, 6000, 400, 60000)
    assert sparse and not fail
    assert norm > 12  # would have failed on norm alone — the bug class


def test_pair_gate_sparse_early_quadratic_fails():
    """The review scenario: 5 -> 5000 pairs on a 10x step is an
    early-stage quadratic even though density stays < 1 pair/row; the
    absolute growth floor (10 * 10 * 12 = 1200) catches it."""
    _, per_big, _, fail, _, sparse = _gate(5, 5000, 5000, 50000)
    assert sparse and fail and per_big < 1.0


def test_pair_gate_zero_baseline_handled():
    """p_small == 0 uses the half-pair floor for norm and the growth
    floor for failure; a genuinely exploding big side still fails."""
    _, _, _, fail0, _, sparse0 = _gate(0, 500, 30, 5000)
    assert sparse0 and not fail0
    _, _, _, fail1, _, sparse1 = _gate(0, 500, 2000, 5000)
    assert sparse1 and fail1  # floor = 10 * 10 * 12 = 1200 < 2000

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

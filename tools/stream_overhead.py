"""Measure the fixed per-stream drain overhead envelope (VERDICT r5 #5).

Runs every q_stream_* query N times at the bench scale factor and prints
per-query min/median/max wall-clock. The numbers feed STREAM_OVERHEAD.md,
the documented envelope used to attribute future drifts (state-store
init / commit-log machinery vs real sf-scaling work): a bench reading
inside the envelope is noise; a breach is a regression to chase.

Usage: python tools/stream_overhead.py [--n 3] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


# Recorded envelope: per-stream MEDIAN drain seconds, element-wise max
# over the two controlled idle measurements (round 9 2026-08-14 and
# round 10 2026-08-15 — see STREAM_OVERHEAD.md for the full
# min/median/max tables and measurement conditions). --check compares
# a fresh run's MEDIAN against median * ENVELOPE_MARGIN +
# ENVELOPE_SLACK_S: median-vs-median because recorded MAXes are
# spin-up outliers (q_stream_scd2's max is 10 s against a 1.8 s stable
# median — a max-based bound could not catch an 8x median
# regression), with an absolute slack so the sub-2 s streams don't
# breach on ordinary first-stream-of-iteration spikes (Python worker,
# checkpoint dir, commit log) when --n is small.
ENVELOPE_MED_S = {
    # Round-16 convention repair (ADVICE r15 low #1): the r15 re-pin
    # took one n=3 session's medians verbatim, abandoning the
    # element-wise-max convention even for streams whose improvement was
    # NOT the A/B'd _STATE_PARTITIONS cause — with documented same-day
    # contention swings up to ~1.9x, a single-session pin can
    # false-alarm --check on a busy host. This table is the element-wise
    # MAX of the r15 near-idle medians (anchor ratio 0.966) and the r10
    # idle medians (the prior controlled pin), EXCEPT the two
    # stream-stream joins, which keep the r15 values alone: their r10
    # numbers measured the dead 32-wide state-store plan (15.9->4.1 s
    # and 11.2->4.0 s A/B'd at identical output), so carrying those
    # maxes forward would hide an 8-wide regression behind a dead
    # config's envelope. q_stream_semdedup (added r14, no r10 row) was
    # re-pinned round 16 after its foreachBatch body switched to LOADING
    # standing state from the versioned warehouse tables instead of
    # rebuilding centroids+survivors per invocation — the r15 12.78 s
    # measured the rebuild plan that no longer ships. Its pin is the
    # element-wise max of the two r16 idle measurements of the LOAD
    # plan (3.62 canonical --n 3 median; 4.27 same-day warm-call
    # median); its first-call-of-session MAX (~18 s) is the one-time
    # standing-store build — lands in max, never in median.
    "q_stream_semdedup": 4.27,
    # q_stream_text_dedup (added r17): the text-family streaming screen,
    # same load-plan contract as q_stream_semdedup — foreachBatch body
    # screens against the standing segment store loaded from the
    # versioned warehouse tables; the first call of a session pays the
    # one-time store build (~18 s max), which lands in max, never in
    # median. Pin = element-wise max of the two r17 idle measurements
    # of the load plan (4.20 canonical --n 3 median, anchor-idle host;
    # 3.52 median-of-3 in BENCH_LOCAL_r17 with the store pre-built in
    # warm-up).
    "q_stream_text_dedup": 4.20,
    "q_stream_backfill": 2.11,
    "q_stream_dedup": 3.56,
    "q_stream_left_join": 4.05,
    "q_stream_scd2": 1.99,
    "q_stream_session": 2.92,
    "q_stream_sliding": 1.62,
    "q_stream_stateful_profiles": 2.70,
    "q_stream_static_join": 1.60,
    "q_stream_stream_join": 4.07,
    "q_stream_timeout_flush": 3.86,
    "q_stream_tumbling": 2.57,
    "q_stream_upsert": 1.10,
}
ENVELOPE_MARGIN = 1.5
ENVELOPE_SLACK_S = 1.0


def envelope_breaches(medians: "dict[str, float]") -> "list[str]":
    """Pure gate logic (unit-tested in tests/test_tools.py): one line
    per breach, empty list = green."""
    breaches = []
    for name, med in sorted(medians.items()):
        rec = ENVELOPE_MED_S.get(name)
        if rec is None:
            breaches.append(f"{name}: no recorded envelope — "
                            "add it to ENVELOPE_MED_S")
            continue
        bound = rec * ENVELOPE_MARGIN + ENVELOPE_SLACK_S
        if med > bound:
            breaches.append(
                f"{name}: median {med:.2f}s > bound {bound:.2f}s "
                f"(recorded median {rec:.2f}s x {ENVELOPE_MARGIN} "
                f"+ {ENVELOPE_SLACK_S}s)"
            )
    # reverse direction: a recorded stream that vanished from the run
    # (registry typo, rotation edit) must fail loudly, not pass silently
    for name in sorted(ENVELOPE_MED_S.keys() - medians.keys()):
        breaches.append(
            f"{name}: recorded in ENVELOPE_MED_S but absent from this "
            "run — stream dropped from the registry?"
        )
    return breaches


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--check", action="store_true",
        help="exit 1 if any stream's fresh median exceeds its recorded "
             f"envelope median x {ENVELOPE_MARGIN} + {ENVELOPE_SLACK_S}s "
             "(the round artifact gate from VERDICT r9 #5)",
    )
    args = ap.parse_args()

    from gcp_healthcare_data_pipeline_spark.queries import all_queries
    from gcp_healthcare_data_pipeline_spark.session import get_spark

    spark = get_spark("stream-overhead")
    spark.sparkContext.setLogLevel("ERROR")
    streams = {
        n: s for n, s in all_queries().items() if n.startswith("q_stream_")
    }
    results: dict[str, list[float]] = {n: [] for n in streams}
    for it in range(args.n):
        for name, spec in streams.items():
            t0 = time.perf_counter()
            spec.fn(spark, args.sf).count()
            sec = round(time.perf_counter() - t0, 3)
            results[name].append(sec)
            print(f"# iter {it}: {name}: {sec:.3f}s", file=sys.stderr)

    print(f"| query | n | min | median | max |")
    print(f"|---|---|---|---|---|")
    for name, xs in sorted(results.items()):
        print(
            f"| {name} | {len(xs)} | {min(xs):.2f} | "
            f"{statistics.median(xs):.2f} | {max(xs):.2f} |"
        )
    if args.check:
        # breaches go to STDOUT: the documented workflow filters stderr
        # (Spark noise), and a silent exit 1 would hide which stream
        # fired the gate
        breaches = envelope_breaches(
            {n: statistics.median(xs) for n, xs in results.items()}
        )
        for b in breaches:
            print(f"ENVELOPE BREACH {b}")
        if breaches:
            return 1
        print(f"# envelope check OK: all {len(results)} stream medians "
              f"within median x {ENVELOPE_MARGIN} + {ENVELOPE_SLACK_S}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

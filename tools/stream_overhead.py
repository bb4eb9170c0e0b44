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


# Recorded envelope: per-stream MAX drain seconds, element-wise max
# over the two controlled idle measurements (round 9 2026-08-14 and
# round 10 2026-08-15 — see STREAM_OVERHEAD.md for the full
# min/median/max tables and measurement conditions). --check fails if
# a fresh run's MEDIAN exceeds envelope_max * 1.5 — median-vs-max with
# margin, because single readings legitimately spike on
# first-stream-of-iteration spin-up (Python worker, checkpoint dir,
# commit log) without any code change.
ENVELOPE_MAX_S = {
    "q_stream_backfill": 2.64,
    "q_stream_dedup": 4.04,
    "q_stream_left_join": 7.84,
    "q_stream_scd2": 10.03,
    "q_stream_session": 2.38,
    "q_stream_sliding": 1.79,
    "q_stream_stateful_profiles": 5.83,
    "q_stream_static_join": 1.74,
    "q_stream_stream_join": 7.07,
    "q_stream_timeout_flush": 4.00,
    "q_stream_tumbling": 3.00,
    "q_stream_upsert": 1.06,
}
ENVELOPE_MARGIN = 1.5


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--check", action="store_true",
        help="exit 1 if any stream's fresh median exceeds its recorded "
             f"envelope max by more than {ENVELOPE_MARGIN}x (the round "
             "artifact gate from VERDICT r9 #5)",
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
        breaches = []
        for name, xs in sorted(results.items()):
            med = statistics.median(xs)
            bound = ENVELOPE_MAX_S.get(name)
            if bound is None:
                breaches.append(f"{name}: no recorded envelope — "
                                "add it to ENVELOPE_MAX_S")
            elif med > bound * ENVELOPE_MARGIN:
                breaches.append(
                    f"{name}: median {med:.2f}s > envelope max "
                    f"{bound:.2f}s x {ENVELOPE_MARGIN}"
                )
        for b in breaches:
            print(f"ENVELOPE BREACH {b}", file=sys.stderr)
        if breaches:
            return 1
        print(f"# envelope check OK: all {len(results)} stream medians "
              f"within {ENVELOPE_MARGIN}x of recorded max", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

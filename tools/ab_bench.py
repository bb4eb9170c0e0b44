"""Same-night interleaved A/B bench — the optimization rounds' bench
CONTRACT (r17 verdict item 7, hardening what r17 did by hand).

Motivation (measured, r17): this host's MULTI-threaded throughput drifts
up to 1.3x between days while the single-threaded anchor stays ~1.0, so
cross-night totals are not comparable and `ANCHOR_REF_SEC` normalization
cannot correct the drift. The only honest optimization evidence is
base-commit and HEAD sweeps interleaved in one session on one host.

What it does:

  python tools/ab_bench.py --base <sha> [--runs 3] [--out FILE]

1. `git worktree add /tmp/ab_base_<sha> <sha>` (reused if present);
2. runs `python bench.py --runs 1` alternately in the base worktree and
   in this repo (base run 1, head run 1, base run 2, head run 2, ...) —
   each sweep is its own process/Spark session, so neither tree's code
   or session caches leak into the other, and host contention hits both
   sides of every adjacent pair equally;
3. parses each sweep's one-line JSON, aggregates per-query MEDIANS per
   side, and writes ONE artifact with the per-query ratio table the
   round writeups previously built by hand (ratio = head/base; < 1.0 is
   a speedup), plus geomean/median ratios over the common query set.

The child benches keep bench.py's untouched contract ($SPARK_GRAFT_SF_DIR,
local[$SPARK_GRAFT_CPUS], one JSON line); this wrapper never replaces the
driver's bench — it is the builder's evidence harness.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_sweep(tree: str, env: dict, label: str) -> dict:
    """One `bench.py --runs 1` in `tree`; returns the parsed JSON line."""
    print(f"# ab_bench: sweep {label} in {tree}", file=sys.stderr, flush=True)
    proc = subprocess.run(
        [sys.executable, "bench.py", "--runs", "1"],
        cwd=tree, env=env, capture_output=True, text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"{label} sweep failed rc={proc.returncode}: "
            f"{proc.stderr[-2000:]}"
        )
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"{label} sweep emitted no JSON line")


def _all_queries(parsed: dict) -> dict:
    q = dict(parsed.get("queries", {}))
    q.update(parsed.get("exempt_fixed_overhead", {}).get("queries", {}))
    return q


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True, help="base commit (sha/ref)")
    ap.add_argument("--runs", type=int, default=3,
                    help="sweeps PER SIDE (interleaved pairs)")
    ap.add_argument("--out", default=None,
                    help="artifact path (default AB_BENCH_<base7>.json)")
    args = ap.parse_args()

    sha = subprocess.run(
        ["git", "rev-parse", args.base], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    base_tree = f"/tmp/ab_base_{sha[:12]}"
    if not os.path.isdir(base_tree):
        subprocess.run(
            ["git", "worktree", "add", "--detach", base_tree, sha],
            cwd=REPO, check=True,
        )

    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")

    base_samples: dict[str, list[float]] = {}
    head_samples: dict[str, list[float]] = {}
    sweeps = []
    for r in range(args.runs):
        # base first, head second within every pair: any monotone host
        # drift then biases ALTERNATE pairs the same way, not one side
        for side, tree, acc in (
            ("base", base_tree, base_samples),
            ("head", REPO, head_samples),
        ):
            parsed = _run_sweep(tree, env, f"{side}#{r}")
            qs = _all_queries(parsed)
            for name, sec in qs.items():
                acc.setdefault(name, []).append(sec)
            sweeps.append({
                "side": side, "run": r, "total": parsed.get("value"),
                "anchor": parsed.get("anchor", {}).get("sec"),
            })

    med_base = {k: round(statistics.median(v), 3) for k, v in base_samples.items()}
    med_head = {k: round(statistics.median(v), 3) for k, v in head_samples.items()}
    common = sorted(set(med_base) & set(med_head))
    ratios = {
        k: round(med_head[k] / med_base[k], 4)
        for k in common if med_base[k] > 0
    }
    logs = [math.log(r) for r in ratios.values() if r > 0]
    summary = {
        "base_sha": sha,
        "runs_per_side": args.runs,
        "sweeps": sweeps,
        "n_common": len(common),
        "geomean_ratio": round(math.exp(sum(logs) / len(logs)), 4) if logs else None,
        "median_ratio": round(statistics.median(ratios.values()), 4) if ratios else None,
        "base_median_sec": med_base,
        "head_median_sec": med_head,
        "ratio_head_over_base": ratios,
        "note": "ratio < 1.0 = HEAD faster; sweeps interleaved base,head "
                "per pair on one host in one session-night",
    }
    out = args.out or os.path.join(REPO, f"AB_BENCH_{sha[:7]}.json")
    with open(out, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(f"# ab_bench: wrote {out}", file=sys.stderr)
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
    best = sorted(ratios.items(), key=lambda kv: kv[1])[:8]
    print(json.dumps({
        "geomean": summary["geomean_ratio"],
        "median": summary["median_ratio"],
        "best": best, "worst": worst,
    }))


if __name__ == "__main__":
    main()

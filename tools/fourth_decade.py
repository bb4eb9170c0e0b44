"""Fourth-decade probe for the posting-list dedup families (r12 verdict
item 3): wall-clock q_dedup_containment / q_dedup_ngram_jaccard through
FOUR decades from sf0.1 — 5k -> 50k -> 500k -> 5M -> 50M documents —
extending the third-step instrument (they carried exact pair-count
linearity through 500k docs in SCALING_r12.md §8 but no wall-clock
beyond the third decade).

The blow-up is DOCUMENTS-ONLY (these families read nothing else; the
full build_blowup also rewrites lineitem, which at 10000x would be
billions of rows of irrelevant I/O): the same bijective per-copy
token-prefix rewrite as build_blowup, composed once per decade, so dup
density is preserved at every level and cross-copy shingle collisions
are impossible. Other tables are symlinked from sf0.1 so load_tables
resolves.

Shuffle partitions are a UNIFORM 512 across every timed cell ("size
partitions to the data" at the largest cell, per the SCALING_r12.md §9
lesson that the 50M-doc exchange spills at small partition counts; a
uniform setting keeps the per-decade ratios clean of partitioning
changes). Retry discipline matches scaling_audit: the denominator cell
is best-of-2, and a flagged top cell is re-timed once keeping the min,
with the first reading RECORDED.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
QUERIES = ["q_dedup_containment", "q_dedup_ngram_jaccard"]
THRESHOLD = 18.0


def compose_documents(spark, src_dir: str, out_dir: str, copies: int = 10):
    """10x the documents table of ``src_dir`` into ``out_dir`` with the
    build_blowup token-prefix rewrite; symlink every other table."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * span)).alias("doc_id"),
            F.regexp_replace(
                "text", "(^|(?<= ))(?=[^ ])", f"k{i}"
            ).alias("text"),
            "lang", "source",
        ).withColumn("n_chars", F.length("text"))
        for i in range(copies)
    ]
    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    d.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    for name in os.listdir(SRC):
        if name != "documents.parquet" and not os.path.exists(
            os.path.join(out_dir, name)
        ):
            os.symlink(os.path.join(SRC, name), os.path.join(out_dir, name))
    return out_dir


def main() -> int:
    from gcp_healthcare_data_pipeline_spark.queries import all_queries
    from gcp_healthcare_data_pipeline_spark.session import get_spark

    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fourth_decade"
    spark = get_spark(
        "fourth-decade",
        shuffle_partitions=512,
        extra_conf={"spark.driver.memory": "64g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    decades = [SRC]
    cur = SRC
    for lvl in range(1, 5):  # 50k, 500k, 5M, 50M
        out = os.path.join(base, f"d{lvl}")
        marker = os.path.join(out, "_DONE")
        if not os.path.exists(marker):
            t0 = time.perf_counter()
            compose_documents(spark, cur, out)
            open(marker, "w").write("ok")
            print(f"built {out} in {time.perf_counter() - t0:.0f}s",
                  flush=True)
        decades.append(out)
        cur = out

    def _reclaim():
        # the 5M/50M cells run back-to-back in one JVM: drop cached
        # blocks and nudge both GCs so a prior cell's lingering shuffle
        # state cannot OOM the next one (observed: a 5M re-run OOM'd
        # after a successful 250 s first run at 48g)
        import gc

        spark.catalog.clearCache()
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    specs = all_queries()
    results = {}
    for name in QUERIES:
        spec = specs[name]
        spec.fn(spark, "/root/testdata/sf0.001").count()  # codegen warmup
        times = []
        failed = None
        for i, d in enumerate(decades):
            _reclaim()
            try:
                t0 = time.perf_counter()
                spec.fn(spark, d).count()
                t = time.perf_counter() - t0
                if i <= 2:  # cheap denominator cells: best-of-2
                    t0 = time.perf_counter()
                    spec.fn(spark, d).count()
                    t = min(t, time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001
                failed = (i, f"{type(exc).__name__}: {exc}"[:200])
                print(f"{name} decade {i} FAILED: {failed[1]}", flush=True)
                break
            times.append(t)
            print(f"{name} decade {i} (5e{i + 3} docs): {t:.1f}s",
                  flush=True)
        r_last = times[-1] / max(times[-2], 1e-9) if len(times) > 1 else 0.0
        retry_note = "" if failed is None else f" [decade {failed[0]} FAILED: {failed[1]}]"
        if failed is None and r_last > THRESHOLD:
            _reclaim()
            t0 = time.perf_counter()
            spec.fn(spark, decades[-1]).count()
            t2 = time.perf_counter() - t0
            retry_note = (f" [flagged x{r_last:.1f}; retry {t2:.1f}s "
                          f"vs first {times[-1]:.1f}s]")
            times[-1] = min(times[-1], t2)
            r_last = times[-1] / max(times[-2], 1e-9)
        results[name] = (times, r_last, retry_note)
        print(f"{name}: " + " -> ".join(f"{t:.1f}s" for t in times)
              + f"  last-decade x{r_last:.2f}{retry_note}", flush=True)

    print("\n=== summary (512 shuffle partitions, uniform) ===")
    for name, (times, r, note) in results.items():
        ratios = [times[i + 1] / max(times[i], 1e-9)
                  for i in range(len(times) - 1)]
        print(f"{name}: " + " | ".join(f"{t:.1f}" for t in times)
              + "  ratios " + " ".join(f"x{x:.2f}" for x in ratios) + note,
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

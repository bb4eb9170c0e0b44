"""Registry inventory: per-family query counts, survey-id tags, and
driver-rotation status — the at-a-glance map of what the engine's
correctness gate covers.

Usage: python tools/registry_summary.py
"""

from __future__ import annotations

import sys
from collections import Counter

sys.path.insert(0, "/root/repo")


def main() -> int:
    from gcp_healthcare_data_pipeline_spark.queries import (
        _DRIVER_PRIORITY,
        all_queries,
    )

    specs = all_queries()
    fam = Counter()
    for name, spec in specs.items():
        tag = (spec.survey_ids or "untagged").split()[0].split(":")[0]
        fam[tag] += 1
    print(f"registry: {len(specs)} queries, "
          f"{sum(1 for s in specs.values() if s.oracle)} with SQL oracles, "
          f"{min(50, len(_DRIVER_PRIORITY))} in the driver-sampled "
          f"first 50 ({len(_DRIVER_PRIORITY)} pinned incl. the 51+ "
          f"overrun tail)\n")
    print("by family tag (first survey-id token):")
    for tag, n in fam.most_common():
        print(f"  {tag:12s} {n}")
    print("\nfirst-50 driver rotation:")
    for i, name in enumerate(list(specs)[:50], 1):
        print(f"  {i:2d}. {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

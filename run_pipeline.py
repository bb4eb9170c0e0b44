"""CLI for the healthcare medallion pipeline (the reference's Airflow DAG
chain as one command — SURVEY §2.11 C7).

    python run_pipeline.py --sources <dir> --warehouse <dir> [--clock ISO]

``--sources`` expects the reference data layout:
    emr/hospital-a/*.csv  emr/hospital-b/*.csv
    claims/*.csv  cptcodes/cptcodes.csv  configs/load_config.csv
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import datetime

sys.path.insert(0, "/root/repo")

from gcp_healthcare_data_pipeline_spark.pipeline.runner import (  # noqa: E402
    Runner,
    SourcePaths,
)
from gcp_healthcare_data_pipeline_spark.session import get_spark  # noqa: E402

EMR_TABLES = ("patients", "encounters", "transactions", "providers", "departments")


def source_paths(root: str) -> SourcePaths:
    emr = {
        ds: {t: f"{root}/emr/{h}/{t}.csv" for t in EMR_TABLES}
        for ds, h in (
            ("hospital_a_db", "hospital-a"),
            ("hospital_b_db", "hospital-b"),
        )
    }
    return SourcePaths(
        emr=emr,
        claims_glob=f"{root}/claims/*.csv",
        cptcodes=f"{root}/cptcodes/cptcodes.csv",
        load_config=f"{root}/configs/load_config.csv",
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sources", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--clock", default=None, help="ISO timestamp for SCD2 runs")
    args = ap.parse_args()

    clock = datetime.fromisoformat(args.clock) if args.clock else None
    spark = get_spark("healthcare-pipeline")
    runner = Runner(spark, args.warehouse, clock=clock)
    summary = runner.run(source_paths(args.sources))
    print(json.dumps({"gold_mart_rows": summary}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

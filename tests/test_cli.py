"""run_pipeline.py CLI smoke test — the C7 command form (the analog of
the reference's DAG chain) must work as an actual command entry point,
not only via the Runner API the other e2e tests drive."""

from __future__ import annotations

import json
import sys

import run_pipeline
from gcp_healthcare_data_pipeline_spark.pipeline import fixtures as FX

_MARTS = {
    "provider_charge_summary",
    "patient_history",
    "provider_performance",
    "department_performance",
    "financial_metrics",
    "payor_performance",
}


def _run_cli(capsys, monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["run_pipeline.py", *argv])
    assert run_pipeline.main() == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_end_to_end(spark, tmp_path, capsys, monkeypatch):
    src = str(tmp_path / "src")
    FX.write_fixtures(src)
    out = _run_cli(
        capsys,
        monkeypatch,
        [
            "--sources", src,
            "--warehouse", str(tmp_path / "wh"),
            "--clock", "2024-06-01T05:00:00",
        ],
    )
    assert set(out["gold_mart_rows"]) == _MARTS
    assert all(n > 0 for n in out["gold_mart_rows"].values())


def test_cli_compact_flag_reports_zone_plans(
    spark, tmp_path, capsys, monkeypatch
):
    src = str(tmp_path / "src")
    FX.write_fixtures(src)
    out = _run_cli(
        capsys,
        monkeypatch,
        [
            "--sources", src,
            "--warehouse", str(tmp_path / "wh"),
            "--clock", "2024-06-01T05:00:00",
            "--compact",
        ],
    )
    assert set(out["compaction"]) == {"silver", "gold"}
    # fixture tables are tiny and freshly written -> the no-op heuristic
    # must refuse to rewrite them (that's the contract being smoked)
    for zone in out["compaction"].values():
        for plan in zone.values():
            assert {"n_files", "target_files", "compacted"} <= set(plan)

"""End-to-end medallion pipeline test on reference-shaped fixtures:
landing -> bronze -> silver (quarantine + SCD2) -> gold, run twice with a
second-run delta (SURVEY §5 layers 2-4)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.pipeline.runner import Runner, SourcePaths
from tests.fixtures import update_patient_for_run2, write_fixtures

RUN1 = datetime(2024, 6, 1, 5, 0, 0)
RUN2 = datetime(2025, 6, 1, 5, 0, 0)


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    """Run the pipeline twice (delta in between); yield paths."""
    root = tmp_path_factory.mktemp("hc")
    src_root, wh = str(root / "sources"), str(root / "warehouse")
    paths = write_fixtures(src_root)
    sources = SourcePaths(**paths)

    r1 = Runner(spark, wh, clock=RUN1)
    summary1 = r1.run(sources)

    update_patient_for_run2(src_root)
    r2 = Runner(spark, wh, clock=RUN2)
    summary2 = r2.run(sources)
    return {"wh": wh, "s1": summary1, "s2": summary2, "spark": spark}


def _silver(warehouse, name):
    return warehouse["spark"].read.parquet(f"{warehouse['wh']}/silver/{name}")


def test_gold_marts_materialize(warehouse):
    assert warehouse["s1"]["provider_charge_summary"] > 0
    assert warehouse["s1"]["patient_history"] > 0
    assert warehouse["s1"]["provider_performance"] > 0
    assert warehouse["s1"]["department_performance"] > 0


def test_quarantine_rules(warehouse):
    pat = _silver(warehouse, "patients")
    # 'null' FirstName sentinel and NULL PatientID both quarantined
    q = pat.filter(F.col("is_quarantined")).select("FirstName", "SRC_PatientID")
    rows = {(r.FirstName, r.SRC_PatientID) for r in q.collect()}
    assert ("null", "P003") in rows
    assert any(pid is None for _, pid in rows)
    # hospital-B rows conformed through renamed columns
    assert pat.filter(
        (F.col("datasource") == "hospital_b_db") & (F.col("FirstName") == "Hans")
    ).count() == 1


def test_shared_business_key_disambiguated_by_datasource(warehouse):
    dept = _silver(warehouse, "departments")
    keys = {r.Dept_Id for r in dept.select("Dept_Id").collect()}
    assert "DEPT001-hospital_a_db" in keys and "DEPT001-hospital_b_db" in keys


def test_safe_cast_bad_numerics(warehouse):
    prov = _silver(warehouse, "providers")
    npi = {r.ProviderID: r.NPI for r in prov.collect()}
    assert npi["PROV001"] == 1234567890
    assert npi["PROV003"] is None  # 'notanumber'
    trx = _silver(warehouse, "transactions")
    amounts = {r.SRC_TransactionID: r.Amount for r in trx.filter(F.col("is_current")).collect()}
    assert amounts["TRX003"] is None  # 'badnum'
    assert amounts["TRX001"] == 100.50


def test_distinct_collapses_exact_dupes(warehouse):
    pat = _silver(warehouse, "patients")
    assert (
        pat.filter(
            (F.col("SRC_PatientID") == "P001")
            & (F.col("datasource") == "hospital_a_db")
        ).count()
        == 1
    )


def test_scd2_second_run_delta(warehouse):
    pat = _silver(warehouse, "patients")
    p002 = pat.filter(F.col("SRC_PatientID") == "P002").orderBy("modified_date")
    rows = p002.collect()
    # strict reference semantics: changed row expired, no re-insert (§2.6)
    assert [(r.Address, r.is_current, str(r.modified_date.date())) for r in rows] == [
        ("2 Oak Ave", False, "2025-06-01"),
    ]
    # untouched patient remains current from run 1
    p001 = pat.filter(
        (F.col("SRC_PatientID") == "P001") & (F.col("datasource") == "hospital_a_db")
    ).first()
    assert p001.is_current and str(p001.inserted_date.date()) == "2024-06-01"


def test_incremental_watermark_skips_old_rows(warehouse):
    audit = warehouse["spark"].read.parquet(
        f"{warehouse['wh']}/control/audit_log"
    )
    r2 = audit.filter(
        (F.col("tablename") == "encounters")
        & (F.col("data_source") == "hospital_a_db")
        & (F.col("load_timestamp") == RUN2)
    ).first()
    # no encounter rows newer than run-1 watermark -> empty delta landed
    assert r2.status == "success" and r2.record_count == 0
    r2p = audit.filter(
        (F.col("tablename") == "patients")
        & (F.col("data_source") == "hospital_a_db")
        & (F.col("load_timestamp") == RUN2)
    ).first()
    assert r2p.record_count == 1  # only the P002 delta row


def test_gold_charge_summary_values(warehouse):
    mart = warehouse["spark"].read.parquet(
        f"{warehouse['wh']}/gold/provider_charge_summary"
    )
    vals = {
        (r.Provider_Name, r.Dept_Name): r.Amount
        for r in mart.collect()
    }
    # TRX002 (200.25, PROV002/DEPT001-Emergency appears for A and B dept rows)
    # TRX003 amount is NULL (badnum) -> COALESCE 0
    assert vals[("Bob Brown", "Emergency")] == pytest.approx(400.50)
    # TRX001: Alice Adams in Cardiology (DEPT002 exists only in hospital A)
    assert vals[("Alice Adams", "Cardiology")] == pytest.approx(100.50)


def test_extension_marts(warehouse):
    """The reference's placeholder marts (gold.sql:165-169), completed."""
    fm = warehouse["spark"].read.parquet(
        f"{warehouse['wh']}/gold/financial_metrics"
    )
    rows = {(r.Line_Of_Business, r.Payor): r for r in fm.collect()}
    # TRX001: commercial/Medicare, 100.50 charged, 80 paid
    r = rows[("Commercial", "Medicare")]
    assert r.Total_Charges == pytest.approx(100.50)
    assert r.Total_Payments == pytest.approx(80.0)
    assert r.Outstanding_Balance == pytest.approx(20.50)

    pp = warehouse["spark"].read.parquet(
        f"{warehouse['wh']}/gold/payor_performance"
    )
    by_payor = {r.Payor: r for r in pp.collect()}
    # CLM001 approved (CLM003 is quarantined via 'null' status)
    assert by_payor["Medicare"].Approval_Rate_Pct == 100.0
    assert by_payor["Medicare"].Avg_Claim_Lag_Days == pytest.approx(3.0)
    assert by_payor["BlueCross"].Approved_Claims == 0


def test_provider_performance_approval_rate(warehouse):
    mart = warehouse["spark"].read.parquet(
        f"{warehouse['wh']}/gold/provider_performance"
    )
    rows = {(r.FirstName, r.LastName): r for r in mart.collect()}
    # PROV001: CLM001 approved of 1 claim -> 100.0
    assert rows[("Alice", "Adams")].ClaimApprovalRate == 100.0
    # PROV002: CLM002 pending + CLM003 'null' -> 0.0 approval
    assert rows[("Bob", "Brown")].ClaimApprovalRate == 0.0

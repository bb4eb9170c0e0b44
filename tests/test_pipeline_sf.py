"""sf-scaling silver->gold chain (q_pipeline_sf) + at-scale maintenance
modes (compaction, versioned snapshots) over the derived silver table.

The fixture gates (tests/test_pipeline_e2e.py) prove reference semantics
at reference volume; these tests prove the same code path on an input
that scales with sf and that the lake-maintenance operators preserve the
chain's results byte-for-byte.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _mart_rows(df):
    return sorted(map(tuple, df.collect()), key=str)


def test_pipeline_sf_chain_scales_and_quarantines(spark):
    from gcp_healthcare_data_pipeline_spark.queries.pipeline_queries import (
        q_pipeline_sf,
    )

    mart = q_pipeline_sf(spark, SF_DIR)
    rows = mart.collect()
    assert len(rows) > 50  # ~100 providers minus the D7 dept filter
    assert set(mart.columns) == {"Provider_Name", "Dept_Name", "Amount"}
    # D7 departments are NULL-named -> null-rejecting gold filter drops
    # every provider homed there
    assert all(r.Dept_Name is not None for r in rows)
    assert all(r.Provider_Name.startswith("Dr ") for r in rows)
    assert all(r.Amount >= 0 for r in rows)


def test_pipeline_sf_survives_compaction_and_versioning(spark, tmp_path):
    """End-to-end at-scale maintenance: materialize the derived silver
    transactions (60k rows at sf0.01) fragmented, compact them, snapshot
    the gold mart through the versioned writer, and verify the
    compacted+versioned readback yields the identical mart."""
    from gcp_healthcare_data_pipeline_spark.operators.compaction import (
        compact,
    )
    from gcp_healthcare_data_pipeline_spark.operators.scd2 import (
        scd2_initial,
    )
    from gcp_healthcare_data_pipeline_spark.operators.versioning import (
        read_version,
        write_version,
    )
    from gcp_healthcare_data_pipeline_spark.plans.conform import (
        TRANSACTIONS,
    )
    from gcp_healthcare_data_pipeline_spark.queries.pipeline_queries import (
        q_pipeline_sf,
    )

    want = _mart_rows(q_pipeline_sf(spark, SF_DIR))

    # materialize the chain's silver stage fragmented (40 files), as an
    # incremental-append history would leave it
    from gcp_healthcare_data_pipeline_spark.queries import pipeline_queries

    silver_dir = str(tmp_path / "silver_tx")
    # the chain's silver stage = everything under the gold mart's first
    # aggregate; easiest faithful reconstruction is re-deriving it:
    from gcp_healthcare_data_pipeline_spark.plans.conform import (
        conform_source,
        conform_union,
    )
    from gcp_healthcare_data_pipeline_spark.session import load_tables

    # (duplicates q_pipeline_sf's transactions derivation on purpose:
    # this test pins that a MATERIALIZED silver zone behaves identically
    # to the lazy plan)
    tid = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    vd = F.date_format("l_shipdate", "yyyy-MM-dd")
    cents = (
        F.col("l_orderkey") * 37 + F.col("l_linenumber") * 13
        + F.col("l_partkey")
    ) % 100000
    li = load_tables(spark, SF_DIR, "lineitem")
    raw_tx = li.select(
        tid.alias("TransactionID"),
        F.when(F.col("l_orderkey") % 50 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("E"), tid)).alias("EncounterID"),
        F.concat(F.lit("P"), (F.col("l_orderkey") % 1000).cast("string"))
        .alias("PatientID"),
        F.concat(F.lit("PR"), (F.col("l_suppkey") % 100 + 1).cast("string"))
        .alias("ProviderID"),
        F.concat(F.lit("D"), (F.col("l_partkey") % 25).cast("string"))
        .alias("DeptID"),
        vd.alias("VisitDate"), vd.alias("ServiceDate"), vd.alias("PaidDate"),
        F.col("l_linestatus").alias("VisitType"),
        F.when(F.col("l_orderkey") % 97 == 0, F.lit("notanumber"))
        .otherwise(cents.cast("string")).alias("Amount"),
        F.col("l_returnflag").alias("AmountType"),
        ((cents * 3) % 100000).cast("string").alias("PaidAmount"),
        F.concat(F.lit("C"), tid).alias("ClaimID"),
        F.concat(F.lit("PY"), (F.col("l_partkey") % 10).cast("string"))
        .alias("PayorID"),
        (F.col("l_partkey") % 500).cast("string").alias("ProcedureCode"),
        F.concat(F.lit("ICD"), (F.col("l_partkey") % 30).cast("string"))
        .alias("ICDCode"),
        F.col("l_returnflag").alias("LineOfBusiness"),
        F.concat(F.lit("MA"), (F.col("l_orderkey") % 7).cast("string"))
        .alias("MedicaidID"),
        F.concat(F.lit("MC"), (F.col("l_orderkey") % 11).cast("string"))
        .alias("MedicareID"),
        vd.alias("InsertDate"), vd.alias("ModifiedDate"),
        (F.col("l_orderkey") % 2).alias("_branch"),
    )
    silver_tx = scd2_initial(
        conform_union([
            conform_source(
                raw_tx.filter(F.col("_branch") == 0), TRANSACTIONS,
                "hospital_a_db",
            ),
            conform_source(
                raw_tx.filter(F.col("_branch") == 1), TRANSACTIONS,
                "hospital_b_db",
            ),
        ]),
        F.lit(pipeline_queries._SF_TS).cast("timestamp"),
    )
    silver_tx.repartition(40).write.parquet(silver_dir)  # fragmented

    n_before = len([
        f for f in os.listdir(silver_dir) if f.endswith(".parquet")
    ])
    result = compact(spark, silver_dir, target_bytes=1 << 30, force=True)
    assert result["compacted"] is True
    n_after = len([
        f for f in os.listdir(silver_dir) if f.endswith(".parquet")
    ])
    assert n_after < n_before

    # gold over the compacted silver == the lazy chain's mart
    from gcp_healthcare_data_pipeline_spark.plans.gold import (
        provider_charge_summary,
    )
    from gcp_healthcare_data_pipeline_spark.plans.conform import (
        DEPARTMENTS,
        PROVIDERS,
    )

    t = load_tables(spark, SF_DIR, "supplier", "nation")
    raw_prov = t["supplier"].filter(F.col("s_suppkey") < 100).select(
        F.concat(F.lit("PR"), (F.col("s_suppkey") + 1).cast("string"))
        .alias("ProviderID"),
        F.lit("Dr").alias("FirstName"),
        F.col("s_name").alias("LastName"),
        F.concat(F.lit("S"), (F.col("s_nationkey") % 5).cast("string"))
        .alias("Specialization"),
        F.concat(F.lit("D"), (F.col("s_suppkey") % 25).cast("string"))
        .alias("DeptID"),
        (F.col("s_suppkey") + 1000000).cast("string").alias("NPI"),
    )
    silver_prov = conform_union(
        [conform_source(raw_prov, PROVIDERS, "hospital_a_db")]
    )
    raw_dept = t["nation"].select(
        F.concat(F.lit("D"), F.col("n_nationkey").cast("string"))
        .alias("DeptID"),
        F.when(F.col("n_nationkey") == 7, F.lit(None).cast("string"))
        .otherwise(F.col("n_name")).alias("Name"),
    )
    silver_dept = conform_union(
        [conform_source(raw_dept, DEPARTMENTS, "hospital_a_db")]
    )
    mart_from_disk = provider_charge_summary(
        spark.read.parquet(silver_dir), silver_prov, silver_dept
    )
    # versioned snapshot of the mart; readback must be identical too
    hist = str(tmp_path / "gold_history" / "charge_summary_sf")
    v = write_version(mart_from_disk, hist)
    got = _mart_rows(read_version(spark, hist, v))
    assert got == want

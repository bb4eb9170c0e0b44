"""The four gold analytics marts (reference gold.sql:5-162) as DataFrame
functions over the silver zone.

Join strategy at scale: providers/departments are small dims — explicitly
broadcast so the fact-side scans never shuffle for them; the
patients⟕encounters⟕transactions⟕claims chains co-shuffle on their keys
(at 100 TB: bucket silver on these keys to make the joins co-located).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.functions.bq_compat import (
    safe_divide,
    safe_offset,
)


def _dept_join_key(dept: DataFrame) -> DataFrame:
    """SPLIT(Dept_Id, '-')[SAFE_OFFSET(0)] computed join key
    (gold.sql:22,158-160)."""
    return dept.withColumn(
        "dept_id_parsed", safe_offset(F.split("Dept_Id", "-"), 0)
    )


def provider_charge_summary(
    transactions: DataFrame, providers: DataFrame, departments: DataFrame
) -> DataFrame:
    """gold.sql:13-25: trx ⟕ providers ⟕ departments (computed key).

    Output schema matches the reference CREATE TABLE (gold.sql:5-9):
    (Provider_Name, Dept_Name, Amount), with COALESCE(name,'') in the
    concat so a NULL first/last name still yields a group key
    (gold.sql:15). Amount is ROUND(...,2) for cross-engine float
    determinism (sum of 2dp money values).
    """
    t = transactions.filter(F.col("is_quarantined") == False)  # noqa: E712
    p = providers.select(
        "ProviderID",
        F.concat(
            F.coalesce(F.col("FirstName"), F.lit("")),
            F.lit(" "),
            F.coalesce(F.col("LastName"), F.lit("")),
        ).alias("Provider_Name"),
        F.col("DeptID").alias("Provider_DeptID"),
    )
    d = _dept_join_key(departments).select(
        "dept_id_parsed", F.col("Name").alias("Dept_Name")
    )
    return (
        t.join(F.broadcast(p), "ProviderID", "left")
        .join(
            F.broadcast(d),
            F.col("dept_id_parsed") == F.col("Provider_DeptID"),
            "left",
        )
        .filter(F.col("Dept_Name").isNotNull())
        .groupBy("Provider_Name", "Dept_Name")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("Amount"), F.lit(0.0))), 2
            ).alias("Amount")
        )
    )


def patient_history(
    patients: DataFrame,
    encounters: DataFrame,
    transactions: DataFrame,
    claims: DataFrame,
) -> DataFrame:
    """gold.sql:53-82: 4-way left chain off current patients (fan-out
    between encounters and transactions preserved deliberately).

    Output schema matches the reference CREATE TABLE (gold.sql:32-51):
    18 columns from Patient_Key through PayorType.
    """
    p = patients.filter(F.col("is_current") == True)  # noqa: E712
    e = encounters.select(
        F.col("PatientID").alias("E_PatientID"),
        F.col("EncounterDate"),
        F.col("EncounterType"),
    )
    t = transactions.select(
        F.col("PatientID").alias("T_PatientID"),
        F.col("SRC_TransactionID"),
        F.col("Transaction_Key"),
        F.col("VisitDate"),
        F.col("ServiceDate"),
        F.col("Amount"),
        F.col("PaidAmount"),
    )
    c = claims.select(
        F.col("TransactionID").alias("C_TransactionID"),
        F.col("ClaimStatus"),
        F.col("ClaimAmount"),
        F.col("PaidAmount").alias("C_PaidAmount"),
        F.col("PayorType"),
    )
    return (
        p.join(e, p.SRC_PatientID == e.E_PatientID, "left")
        .join(t, p.SRC_PatientID == t.T_PatientID, "left")
        .join(c, t.SRC_TransactionID == c.C_TransactionID, "left")
        .select(
            F.col("Patient_Key"),
            F.col("SRC_PatientID"),
            F.col("FirstName"),
            F.col("LastName"),
            F.col("Gender"),
            F.col("DOB"),
            F.col("Address"),
            F.col("EncounterDate"),
            F.col("EncounterType"),
            F.col("Transaction_Key"),
            F.col("VisitDate"),
            F.col("ServiceDate"),
            F.coalesce(F.col("Amount"), F.lit(0.0)).alias("BilledAmount"),
            F.coalesce(F.col("PaidAmount"), F.lit(0.0)).alias("PaidAmount"),
            F.col("ClaimStatus"),
            F.coalesce(F.col("ClaimAmount"), F.lit(0.0)).alias("ClaimAmount"),
            F.coalesce(F.col("C_PaidAmount"), F.lit(0.0)).alias(
                "ClaimPaidAmount"
            ),
            F.col("PayorType"),
        )
    )


def provider_performance(
    providers: DataFrame,
    encounters: DataFrame,
    transactions: DataFrame,
    claims: DataFrame,
) -> DataFrame:
    """gold.sql:103-128: per-provider volumes, charges, approval rate
    (conditional COUNT DISTINCT + SAFE_DIVIDE*100 ROUND 2).

    Output schema matches the reference CREATE TABLE (gold.sql:89-101):
    ProviderID, FirstName, LastName, Specialization, TotalEncounters,
    TotalTransactions, TotalBilledAmount, TotalPaidAmount,
    ApprovedClaims, TotalClaims, ClaimApprovalRate.
    """
    p = providers.select(
        "ProviderID", "FirstName", "LastName", "Specialization"
    )
    e = encounters.select(
        F.col("ProviderID").alias("E_ProviderID"), "Encounter_Key"
    )
    t = transactions.select(
        F.col("ProviderID").alias("T_ProviderID"),
        "SRC_TransactionID", "Transaction_Key", "Amount", "PaidAmount",
    )
    c = claims.select(
        F.col("TransactionID").alias("C_TransactionID"),
        "Claim_Key", "ClaimStatus",
    )
    joined = (
        p.join(e, p.ProviderID == e.E_ProviderID, "left")
        .join(t, p.ProviderID == t.T_ProviderID, "left")
        .join(c, t.SRC_TransactionID == c.C_TransactionID, "left")
    )
    approved = F.countDistinct(
        F.when(F.col("ClaimStatus") == "Approved", F.col("Claim_Key"))
    )
    total_claims = F.countDistinct("Claim_Key")
    return joined.groupBy(
        "ProviderID", "FirstName", "LastName", "Specialization"
    ).agg(
        F.countDistinct("Encounter_Key").alias("TotalEncounters"),
        F.countDistinct("Transaction_Key").alias("TotalTransactions"),
        F.round(F.sum(F.coalesce(F.col("Amount"), F.lit(0.0))), 2).alias(
            "TotalBilledAmount"
        ),
        F.round(F.sum(F.coalesce(F.col("PaidAmount"), F.lit(0.0))), 2).alias(
            "TotalPaidAmount"
        ),
        approved.alias("ApprovedClaims"),
        total_claims.alias("TotalClaims"),
        F.round(
            safe_divide(approved * F.lit(100.0), F.nullif(total_claims, F.lit(0))),
            2,
        ).alias("ClaimApprovalRate"),
    )


def financial_metrics(transactions: DataFrame) -> DataFrame:
    """Financial metrics mart — declared but unimplemented in the
    reference (gold.sql:165-167 placeholder); completed here: charges,
    payments, and outstanding balance per line of business and payor."""
    t = transactions.filter(F.col("is_quarantined") == False)  # noqa: E712
    charges = F.sum(F.coalesce(F.col("Amount"), F.lit(0.0)))
    payments = F.sum(F.coalesce(F.col("PaidAmount"), F.lit(0.0)))
    return (
        t.groupBy(
            F.col("LineOfBusiness").alias("Line_Of_Business"),
            F.col("PayorID").alias("Payor"),
        )
        .agg(
            F.count(F.lit(1)).alias("Num_Transactions"),
            F.round(charges, 2).alias("Total_Charges"),
            F.round(payments, 2).alias("Total_Payments"),
            F.round(charges - payments, 2).alias("Outstanding_Balance"),
            F.round(
                safe_divide(payments * F.lit(100.0), F.nullif(charges, F.lit(0.0))),
                2,
            ).alias("Collection_Rate_Pct"),
        )
    )


def payor_performance(claims: DataFrame) -> DataFrame:
    """Payor performance mart — the reference's second placeholder
    (gold.sql:168-169): claim outcomes and payment lag per payor."""
    c = claims.filter(F.col("is_quarantined") == False)  # noqa: E712
    approved = F.count(F.when(F.col("ClaimStatus") == "Approved", F.lit(1)))
    n = F.count(F.lit(1))
    lag_days = (
        F.col("ClaimDate").cast("long") - F.col("ServiceDate").cast("long")
    ) / 86400.0
    return (
        c.groupBy(F.col("PayorID").alias("Payor"), F.col("PayorType"))
        .agg(
            n.alias("Num_Claims"),
            approved.alias("Approved_Claims"),
            F.round(
                safe_divide(approved * F.lit(100.0), F.nullif(n, F.lit(0))), 2
            ).alias("Approval_Rate_Pct"),
            F.round(F.sum(F.coalesce(F.col("ClaimAmount"), F.lit(0.0))), 2).alias(
                "Total_Claim_Amount"
            ),
            F.round(F.sum(F.coalesce(F.col("PaidAmount"), F.lit(0.0))), 2).alias(
                "Total_Paid_Amount"
            ),
            F.round(F.avg(lag_days), 2).alias("Avg_Claim_Lag_Days"),
        )
    )


def department_performance(
    departments: DataFrame, encounters: DataFrame, transactions: DataFrame
) -> DataFrame:
    """gold.sql:145-162: departments ⟕ encounters / transactions on the
    computed split key, volume + revenue rollup.

    Output schema matches the reference CREATE TABLE (gold.sql:135-143):
    Dept_Id, DepartmentName, TotalEncounters, TotalTransactions,
    TotalBilledAmount, TotalPaidAmount, AvgPaymentPerTransaction.  The
    e×t fan-out per department is the reference's own join shape
    (gold.sql:156-160) and is preserved deliberately.
    """
    d = _dept_join_key(
        departments.filter(F.col("is_quarantined") == False)  # noqa: E712
    ).select("Dept_Id", "dept_id_parsed", F.col("Name").alias("DepartmentName"))
    e = encounters.select(
        F.col("DepartmentID").alias("E_DeptID"), "Encounter_Key"
    )
    t = transactions.select(
        F.col("DeptID").alias("T_DeptID"),
        "Transaction_Key", "Amount", "PaidAmount",
    )
    joined = (
        d.join(e, d.dept_id_parsed == e.E_DeptID, "left")
        .join(t, d.dept_id_parsed == t.T_DeptID, "left")
    )
    return joined.groupBy("Dept_Id", "DepartmentName").agg(
        F.countDistinct("Encounter_Key").alias("TotalEncounters"),
        F.countDistinct("Transaction_Key").alias("TotalTransactions"),
        F.round(F.sum(F.coalesce(F.col("Amount"), F.lit(0.0))), 2).alias(
            "TotalBilledAmount"
        ),
        F.round(F.sum(F.coalesce(F.col("PaidAmount"), F.lit(0.0))), 2).alias(
            "TotalPaidAmount"
        ),
        F.round(F.avg(F.coalesce(F.col("PaidAmount"), F.lit(0.0))), 2).alias(
            "AvgPaymentPerTransaction"
        ),
    )

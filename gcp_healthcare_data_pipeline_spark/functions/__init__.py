from gcp_healthcare_data_pipeline_spark.functions.bq_compat import (  # noqa: F401
    null_prop_concat,
    quarantine_flag,
    safe_cast,
    safe_divide,
    safe_offset,
    string_null_sentinel,
)

from gcp_healthcare_data_pipeline_spark.operators.scd2 import scd2_merge  # noqa: F401
from gcp_healthcare_data_pipeline_spark.operators.cdc import (  # noqa: F401
    apply_feed,
    snapshot_diff,
)

from gcp_healthcare_data_pipeline_spark.sources.readers import (  # noqa: F401
    jdbc_subquery_reader,
    read_csv,
    read_landing_json,
)
from gcp_healthcare_data_pipeline_spark.sources.writers import (  # noqa: F401
    archive_landing_files,
    write_landing_json,
    write_zone_parquet,
)

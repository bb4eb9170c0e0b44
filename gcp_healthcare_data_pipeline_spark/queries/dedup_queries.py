from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec  # noqa: F401

QUERIES: list[QuerySpec] = []

"""Shim: fixture data moved into the package so the pipeline correctness
gate (queries/pipeline_queries.py) and the tests share one source of
truth. See gcp_healthcare_data_pipeline_spark/pipeline/fixtures.py."""

from __future__ import annotations

from gcp_healthcare_data_pipeline_spark.pipeline.fixtures import (  # noqa: F401
    update_patient_for_run2,
    write_fixtures,
)

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from gcp_healthcare_data_pipeline_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4)
    yield s

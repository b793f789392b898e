from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from docling_service_spark.sparkio.session import get_spark

    s = get_spark("local[4]", shuffle_partitions=8, app_name="dss-tests")
    yield s
    s.stop()

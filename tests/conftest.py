from __future__ import annotations

import pytest

from fact_hive_custom_spark.session import get_session


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "previously_red: strict parity for queries that were once driver-red",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_session("fact_hive_custom_spark-tests")
    yield s

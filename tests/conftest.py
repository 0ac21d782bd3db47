from __future__ import annotations

import pytest

from fact_hive_custom_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session("fact_hive_custom_spark-tests")
    yield s

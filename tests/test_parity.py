"""Oracle-differential test over every registered query (SURVEY.md §5.1).

Mirrors the driver's t2 gate: Spark result vs DuckDB oracle at
$SPARK_GRAFT_PARITY_DIR (default sf0.01) — row count, schema, and
order-insensitive value multiset must all match.
"""

from __future__ import annotations

import pytest

from fact_hive_custom_spark.queries import QUERIES
from tests.parity import DEFAULT_SF_DIR, compare


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    ok, detail = compare(spark, name, DEFAULT_SF_DIR)
    assert ok, f"{name}: {detail}"

"""Registry-wide oracle output-dtype audit (SURVEY.md §5.1).

The driver materializes both engines' results through pandas before
hashing, so a DuckDB HUGEINT/DECIMAL output column whose Spark twin is
integer-typed hash-reds even when every value is identical — the class
that made q_join_cross driver-red in round 1 and q_llm_pca_power in
round 9 while a fetchall()-based local comparator stayed green. This
test walks ALL registered queries lazily (Spark analysis schema vs
DuckDB relation types — nothing executes on the DuckDB side) and fails
on any pandas-landing bucket disagreement, making the class impossible
to reintroduce.
"""

from __future__ import annotations

import pytest

from fact_hive_custom_spark.queries import QUERIES
from tests.parity import DEFAULT_SF_DIR, oracle_dtype_report


# slow tier (r16): the full-registry walk costs ~150 s; the default
# tier's strict parity subset (bench.HEADLINE) still catches dtype
# drift on every driver-benched query, and the exhaustive audit runs
# with FHC_SLOW_TESTS=1 at round close.
@pytest.mark.slow
def test_all_oracle_output_dtypes_match(spark):
    report = oracle_dtype_report(spark, DEFAULT_SF_DIR)
    assert report == [], (
        f"{len(report)} latent driver type-red(s): "
        + "; ".join(
            f"{m['query']}.{m['col']} spark={m['spark']} duck={m['duck']} ({m['why']})"
            for m in report
        )
    )


def test_registry_size_unchanged():
    # The audit walks every registered query — pin the count so a
    # silent registry regression can't shrink the audit's coverage.
    assert len(QUERIES) >= 360

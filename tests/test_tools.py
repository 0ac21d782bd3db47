"""The evidence tooling must not rot: every artifact generator under
tools/ stays compilable, and the bench HEADLINE set stays a subset of
the registry (a renamed/removed query would otherwise only fail at
driver bench time, outside CI)."""

from __future__ import annotations

import pathlib
import py_compile

import pytest

TOOLS = sorted(
    (pathlib.Path(__file__).resolve().parents[1] / "tools").glob("*.py")
)


@pytest.mark.parametrize("path", TOOLS, ids=lambda p: p.name)
def test_tool_compiles(path):
    py_compile.compile(str(path), doraise=True)


def test_bench_headline_is_registered():
    from bench import HEADLINE
    from fact_hive_custom_spark.queries import ORACLE, QUERIES

    # q_join_bucketed's bench rows time its build and probe halves
    # separately (round-11); both resolve inside bench.run() to the
    # registered q_join_bucketed's own helpers, so the registry/oracle
    # coverage they rely on is q_join_bucketed's.
    pseudo = {"q_join_bucketed_build", "q_join_bucketed_probe"}
    assert pseudo <= set(HEADLINE)
    assert "q_join_bucketed" in QUERIES and "q_join_bucketed" in ORACLE
    real = [q for q in HEADLINE if q not in pseudo]
    missing = [q for q in real if q not in QUERIES]
    assert not missing, f"HEADLINE references unregistered queries: {missing}"
    unoracled = [q for q in real if q not in ORACLE]
    assert not unoracled, f"HEADLINE queries without oracle: {unoracled}"


class TestDigestComparator:
    """compare_digest (the scale sweep's >1M-row mode) must agree with
    the full pandas comparator on real queries AND stay sensitive:
    any doctored cell — value, row count, or dtype — must fail the
    digest, or the sweep's 'green' means nothing."""

    SF = "/root/testdata/sf0.001"

    def test_digest_agrees_on_mixed_dtypes(self, spark):
        from tests.parity import compare_digest

        # int+string+float (flagship), timestamp (resample), date
        # (scan), bool-free window chain — one per landing class
        for name in ("q_agg_flagship", "q_ts_resample_ohlc", "q_fn_date",
                     "q_win_lag_lead"):
            ok, detail = compare_digest(spark, name, self.SF, rtol=1e-9)
            assert ok, f"{name}: {detail}"

    def test_threshold_routes_to_digest(self, spark):
        from tests.parity import compare

        ok, detail = compare(
            spark, "q_agg_flagship", self.SF, rtol=1e-9, digest_threshold=2
        )
        assert ok and "digest mode" in detail, detail
        ok, detail = compare(
            spark, "q_agg_flagship", self.SF, rtol=1e-9,
            digest_threshold=10**6,
        )
        assert ok and "digest mode" not in detail, detail

    def test_bytes_budget_prices_threshold_by_schema_width(self, spark):
        from fact_hive_custom_spark.queries import QUERIES
        from tests.parity import _est_row_bytes, compare

        # flagship: 2 strings + 7 doubles + 1 bigint → 2*24 + 8*8 = 112 B
        w = _est_row_bytes(QUERIES["q_agg_flagship"](spark, self.SF))
        assert w == 2 * 24 + 8 * 8
        # budget under the 50k-row floor × width still routes exact
        # (6-row result), a tiny budget with the floor removed would
        # digest — exercise both directions through the public arg
        ok, detail = compare(
            spark, "q_agg_flagship", self.SF, rtol=1e-9,
            digest_bytes=64_000_000,
        )
        assert ok and "digest mode" not in detail, detail
        # digest_bytes wins over digest_threshold when both are given
        ok, detail = compare(
            spark, "q_agg_flagship", self.SF, rtol=1e-9,
            digest_threshold=2, digest_bytes=64_000_000,
        )
        assert ok and "digest mode" not in detail, detail

    @pytest.mark.parametrize(
        "mutation, expect",
        [
            ("WHERE n_nationkey <> 7", "row count / hash"),       # dropped row
            ("WHERE 1=1 ORDER BY n_nationkey", None),             # control: same rows
        ],
    )
    def test_digest_catches_doctored_oracle(self, spark, mutation, expect):
        from fact_hive_custom_spark.queries import ORACLE
        from tests.parity import compare_digest

        name = "q_scan_pruned_digest_probe"
        # a disposable registry entry: Spark side reuses a real query,
        # oracle side is doctored
        from fact_hive_custom_spark.queries import QUERIES

        base_sql = (
            "SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS v "
            "FROM nation {mut}"
        ).format(mut=mutation)

        def q(s, d):
            from fact_hive_custom_spark.tables import load_table
            from pyspark.sql import functions as F

            return load_table(s, d, "nation").select(
                F.col("n_nationkey").cast("bigint").alias("k"),
                F.col("n_name").alias("v"),
            )

        QUERIES[name] = q
        ORACLE[name] = base_sql
        try:
            ok, detail = compare_digest(spark, name, self.SF)
            if expect is None:
                assert ok, detail
            else:
                assert not ok, f"digest missed a doctored oracle: {detail}"
        finally:
            del QUERIES[name], ORACLE[name]

    def test_digest_catches_float_shift(self, spark):
        from fact_hive_custom_spark.queries import ORACLE, QUERIES
        from tests.parity import compare_digest

        name = "q_digest_float_probe"

        def q(s, d):
            from fact_hive_custom_spark.tables import load_table
            from pyspark.sql import functions as F

            return load_table(s, d, "nation").select(
                F.col("n_nationkey").cast("bigint").alias("k"),
                (F.col("n_nationkey") * 1.5).alias("x"),
            )

        QUERIES[name] = q
        ORACLE[name] = (
            "SELECT CAST(n_nationkey AS BIGINT) AS k, "
            "n_nationkey * 1.5 + 0.001 AS x FROM nation"
        )
        try:
            ok, detail = compare_digest(spark, name, self.SF, rtol=1e-9)
            assert not ok, f"digest missed a float shift: {detail}"
        finally:
            del QUERIES[name], ORACLE[name]

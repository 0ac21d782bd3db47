"""Metrics surface: QueryExecutionListener, plan SQLMetrics, observe.

The reference's stats hook (`h-stats.sh:1`) is an empty stub even
upstream; these tests pin the engine's real equivalent — passive
per-action records via a py4j QueryExecutionListener, active per-plan
SQLMetric extraction, and in-pass Observation counters.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from fact_hive_custom_spark import metrics
from fact_hive_custom_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestExecutionMetrics:
    def test_scan_and_shuffle_measured(self, spark):
        """A groupBy over lineitem must report the true scanned row
        count and a nonzero (but small — partial-agg'd) shuffle."""
        li = load_table(spark, SF_DIR, "lineitem")
        expected = li.count()
        df = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
        out = metrics.execution_metrics(df)
        s = out["summary"]
        assert s["rows_scanned"] == expected, s
        assert s["shuffle_records_written"] > 0, s
        # map-side combine: the exchange carries per-partition partials
        # (≤ partitions × 3 flags), never the 6k scanned rows
        assert s["shuffle_records_written"] < expected / 10, s
        assert out["wall_sec"] > 0
        assert any("Scan" in n["node"] for n in out["nodes"])

    def test_broadcast_join_no_fact_shuffle(self, spark):
        """A dim-broadcast join must move zero fact rows through a
        hash exchange — the metric proves what the plan string only
        promises."""
        li = load_table(spark, SF_DIR, "lineitem")
        p = load_table(spark, SF_DIR, "part")
        df = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
            "l_orderkey", "p_name"
        )
        s = metrics.execution_metrics(df)["summary"]
        assert s["rows_scanned"] > 0
        assert s["shuffle_records_written"] == 0, s


class TestObservation:
    def test_counters_ride_the_action(self, spark):
        li = load_table(spark, SF_DIR, "lineitem")
        df, obs = metrics.observed(
            li,
            "audit",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "rev_e2"
            ),
        )
        n_action = df.count()
        got = obs.get
        assert got["n_rows"] == n_action
        assert got["rev_e2"] > 0


class TestQueryExecutionListener:
    def test_listener_records_actions(self, spark):
        listener = metrics.install_listener(spark)
        try:
            df = (
                load_table(spark, SF_DIR, "orders")
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            df.collect()
            deadline = time.time() + 30
            while not listener.records and time.time() < deadline:
                time.sleep(0.2)
            assert listener.records, "listener never fired"
            rec = listener.records[-1]
            assert rec.error is None
            assert rec.duration_ms > 0
            assert rec.func_name  # collect / command name per Spark version
            assert rec.summary.get("rows_scanned", 0) > 0, rec
        finally:
            metrics.uninstall_listener(spark, listener)

    def test_listener_records_failures_and_uninstalls(self, spark):
        """A failing action must surface as a QueryRecord with its
        error; after uninstall the listener must stop recording."""
        from pyspark.sql import functions as F

        listener = metrics.install_listener(spark)
        try:
            bad = spark.range(4).select(
                F.raise_error(F.lit("boom")).alias("x")
            )
            try:
                bad.collect()
            except Exception:
                pass
            deadline = time.time() + 30
            while (
                not any(r.error for r in listener.records)
                and time.time() < deadline
            ):
                time.sleep(0.2)
            assert any(
                r.error and "boom" in r.error for r in listener.records
            ), listener.records
        finally:
            metrics.uninstall_listener(spark, listener)
        n = len(listener.records)
        spark.range(3).collect()
        time.sleep(2)
        assert len(listener.records) == n, "listener fired after uninstall"


class TestRound11MeasuredInvariants:
    """Measured SQLMetric invariants for the round-11b headline
    queries — numbers, not plan strings."""

    def test_permutation_expansion_never_shuffles_the_corpus(self, spark):
        """The 64-replicate expansion must stay map-side: the shuffle
        carries only per-replicate partial quadruples (K × partitions
        rows), never the 64× exploded corpus."""
        from fact_hive_custom_spark.queries import QUERIES

        df = QUERIES["q_stat_permutation_test"](spark, SF_DIR)
        s = metrics.execution_metrics(df)["summary"]
        assert s["rows_scanned"] > 0
        # partials: <= K * shuffle partitions * few aggregates; the
        # exploded corpus would be scanned_rows * 64 >> this bound
        assert s["shuffle_records_written"] < 10_000, s

    def test_theta_sketch_shuffles_distinct_keys_not_rows(self, spark):
        """The only corpus-width exchange is the distinct
        (segment, custkey) collapse — bounded by distinct keys, never
        the raw order rows scanned."""
        from fact_hive_custom_spark.queries import QUERIES

        df = QUERIES["q_agg_theta_sketch"](spark, SF_DIR)
        s = metrics.execution_metrics(df)["summary"]
        assert s["rows_scanned"] > 0
        assert s["shuffle_records_written"] < s["rows_scanned"], s

"""Reshape operators: pivot / unpivot (wide↔long). Standard OLAP
surface beyond the base SURVEY inventory — both are single-shuffle
operations (pivot = group-by with per-bucket conditional aggregates;
unpivot = a generate, no shuffle at all)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fact_hive_custom_spark.queries.registry import register
from fact_hive_custom_spark.tables import load_table


@register(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS qty_F,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot long→wide: linestatus buckets become columns.

    The value list is EXPLICIT (["F","O"]) — omitting it makes Spark
    run an extra distinct-collection job and, at scale, risks an
    unbounded column explosion.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 4))
    )
    return p.select(
        "l_returnflag", F.col("F").alias("qty_F"), F.col("O").alias("qty_O")
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot wide→long (melt): numeric columns become (metric, value)
    rows — a Generate, zero shuffle."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return c.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "q_merge_upsert",
    oracle="""
    WITH updates AS (
        SELECT c_custkey, c_name, 'UPDATED' AS c_mktsegment
        FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT c_custkey, c_name, c_mktsegment FROM updates
    UNION ALL
    SELECT c.c_custkey, c.c_name, c.c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-INTO emulation (operators/merge.py): a CDC batch updates
    every 10th customer's segment; updates win, the rest survive —
    anti-join + union, one shuffle per side (zero if bucketed)."""
    from fact_hive_custom_spark.operators.merge import upsert

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    updates = (
        c.filter(F.col("c_custkey") % 10 == 0)
        .withColumn("c_mktsegment", F.lit("UPDATED"))
    )
    return upsert(c, updates, key=["c_custkey"])


@register(
    "q_scd2_history",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type AS status, epoch_us(ts) AS us, event_id
        FROM events
    ),
    o AS (
        SELECT user_id, status, us, event_id,
               lag(status) OVER (
                   PARTITION BY user_id ORDER BY us, event_id) AS prev
        FROM e
    ),
    r AS (
        SELECT user_id, status, us, event_id,
               SUM(CASE WHEN prev IS NULL OR prev <> status THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS version_no
        FROM o
    ),
    g AS (
        SELECT user_id, status, CAST(version_no AS BIGINT) AS version_no,
               MIN(us) AS valid_from_us, COUNT(*) AS n_events
        FROM r GROUP BY user_id, status, version_no
    )
    SELECT user_id, status, version_no, valid_from_us,
           lead(valid_from_us) OVER (
               PARTITION BY user_id ORDER BY version_no) AS valid_to_us,
           (lead(valid_from_us) OVER (
               PARTITION BY user_id ORDER BY version_no) IS NULL) AS is_current,
           n_events
    FROM g
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from an event stream:
    consecutive runs of the same per-user status collapse into
    versioned validity intervals (valid_from/valid_to half-open,
    NULL = current) — the warehouse dimension-history shape.

    Plan: lag → run-id running sum → run rollup → lead, ALL keyed on
    user_id, so Catalyst reuses ONE hash exchange across every window
    and the aggregate (plan-pinned in tests). Exact integer
    epoch-micros; ties broken by event_id, so versions are total-
    ordered and engine-identical."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("status"),
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    wo = Window.partitionBy("user_id").orderBy("us", "event_id")
    r = e.withColumn("prev", F.lag("status").over(wo)).withColumn(
        "version_no",
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("prev") != F.col("status")), 1
            ).otherwise(0)
        )
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    g = r.groupBy("user_id", "status", "version_no").agg(
        F.min("us").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version_no")
    nxt = F.lead("valid_from_us").over(wv)
    return g.select(
        "user_id",
        "status",
        "version_no",
        "valid_from_us",
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
        "n_events",
    )

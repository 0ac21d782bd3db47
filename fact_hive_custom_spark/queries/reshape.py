"""Reshape operators: pivot / unpivot (wide↔long). Standard OLAP
surface beyond the base SURVEY inventory — both are single-shuffle
operations (pivot = group-by with per-bucket conditional aggregates;
unpivot = a generate, no shuffle at all)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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

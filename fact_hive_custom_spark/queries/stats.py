"""Robust / regression statistics beyond the stock aggregate set:
weighted median and exact-moment linear regression.

Both are written in exact integer arithmetic so the two engines reach
bit-identical answers (no float accumulation order): money in cents or
whole dollars, weights as bigints, regression reported as integer
numerator/denominator moments instead of a lossy quotient.

Charter-derived capability — the reference
(`/root/reference/fact-hive/h-run.sh:1-106`) has no statistics surface
(SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fact_hive_custom_spark.queries.registry import register
from fact_hive_custom_spark.tables import load_table


@register(
    "q_agg_weighted_median",
    oracle="""
    WITH p AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS px,
               CAST(round(l_quantity) AS BIGINT) AS q
        FROM lineitem
    ),
    g AS (
        SELECT flag, px, CAST(SUM(q) AS BIGINT) AS w
        FROM p GROUP BY flag, px
    ),
    c AS (
        SELECT flag, px, w,
               CAST(SUM(w) OVER (
                   PARTITION BY flag ORDER BY px) AS BIGINT) AS cum,
               CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tot
        FROM g
    )
    SELECT flag, MIN(px) AS wmedian_cents
    FROM c WHERE 2 * cum >= tot
    GROUP BY flag
    """,
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median: the smallest price whose cumulative weight
    (quantity) reaches half the group's total — the inventory-weighted
    "typical price" that an unweighted percentile misstates.

    No built-in computes this; the composition is (1) pre-aggregate to
    one row per (group, value) — this is the scale lever: the window
    then runs over distinct values, not raw rows — (2) running + total
    weight via two frames over one window shuffle, (3) first crossing
    of half-mass. All bigint (cents / unit weights), so the crossing
    index is exact in both engines.

    At 100 TB: the groupBy shrinks the fact table to |group|×|distinct
    px| rows before any window sort; the window partitions by the group
    key, so no global sort and no skew beyond a group's own value
    cardinality.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("px"),
        F.round(F.col("l_quantity")).cast("bigint").alias("q"),
    )
    g = p.groupBy("flag", "px").agg(F.sum("q").cast("bigint").alias("w"))
    w_run = (
        Window.partitionBy("flag")
        .orderBy("px")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("flag")
    c = g.select(
        "flag",
        "px",
        F.sum("w").over(w_run).cast("bigint").alias("cum"),
        F.sum("w").over(w_all).cast("bigint").alias("tot"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("flag")
        .agg(F.min("px").alias("wmedian_cents"))
    )


@register(
    "q_agg_linreg",
    oracle="""
    WITH p AS (
        SELECT l_returnflag AS flag, l_linestatus AS status,
               CAST(l_linenumber AS BIGINT) AS lineno,
               CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_extendedprice) AS BIGINT) AS y
        FROM lineitem
    ),
    m AS (
        SELECT flag, status, lineno,
               COUNT(*) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM p GROUP BY flag, status, lineno
    )
    SELECT flag, status, lineno, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CAST(sy * sxx - sx * sxy AS BIGINT) AS icept_num
    FROM m
    """,
)
def q_agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares regression of price-in-dollars on quantity per
    (returnflag, linestatus, linenumber) — the regr_slope/regr_intercept
    family, but
    reported as EXACT integer moments: slope = slope_num/slope_den,
    intercept = icept_num/slope_den. Emitting the numerator and
    denominator instead of the quotient keeps the result bit-identical
    across engines (a float slope would diverge in the last ulp by
    summation order) and lets the caller choose precision.

    Overflow budget (int64 max ≈ 9.2e18): y ≤ 1e5 dollars, x ≤ 1e2,
    per-group n ≤ ~2e5 at sf1.0 (42 groups) ⇒ sxy ≤ 2e12,
    n·sxy ≤ 4e17 — >20× headroom; whole-dollar y (not cents) is what
    buys the two extra decades. Beyond ~sf10, switch the moment
    columns to DECIMAL(38,0).

    Scale: one partial-aggregated groupBy — the moments are plain sums,
    so this is exactly as cheap as q_agg_flagship at any size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
        F.col("l_linenumber").cast("bigint").alias("lineno"),
        F.round(F.col("l_quantity")).cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice")).cast("bigint").alias("y"),
    )
    m = p.groupBy("flag", "status", "lineno").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    return m.select(
        "flag",
        "status",
        "lineno",
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("bigint")
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("bigint")
        .alias("slope_den"),
        (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
        .cast("bigint")
        .alias("icept_num"),
    )

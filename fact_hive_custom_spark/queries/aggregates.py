"""Aggregation operators (SURVEY.md §2.2.D).

All aggregates are expressed with `df.groupBy().agg()` / `spark.sql`
built-ins, so Spark plans two-phase hash aggregation (partial map-side
combine → shuffle on the group keys → final) automatically — the
shape that scales to 100 TB. Floating aggregates are ROUND()ed per
SURVEY.md §7.4.2 so results are hash-comparable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fact_hive_custom_spark.queries.registry import register
from fact_hive_custom_spark.tables import load_table


@register(
    "q_agg_flagship",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        ROUND(SUM(l_quantity), 4)                                        AS sum_qty,
        ROUND(SUM(l_extendedprice), 4)                                   AS sum_base_price,
        ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
        ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
        ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
        ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
        ROUND(AVG(l_discount), 4)                                        AS avg_disc,
        COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 shape — multi-aggregate group-by over the fact table.

    Plan shape at scale: vectorized parquet scan with the shipdate
    predicate pushed to the reader, partial hash-agg per partition,
    shuffle on the (low-cardinality) group keys, final hash-agg.
    No custom code — Catalyst does partial aggregation automatically.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )

"""Classic OLAP report shapes beyond Q3/Q5: TPC-H Q10 (returned-item
revenue) and Q18 (large-volume customers).

The reference (`/root/reference/fact-hive`, 142 lines of process
orchestration — SURVEY.md §0) has no query surface; these are
charter-derived capability queries for the decision-support shapes a
warehouse user runs daily: a multi-way dim+fact chain with a selective
fact predicate (Q10) and an agg-derived semi-join back onto the fact
(Q18).

Determinism: all money is exact-integer (cents / 1e-4 revenue units,
one shared rule with queries/optimizer.py); every LIMIT carries a
unique-key tiebreak so top-k agrees bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fact_hive_custom_spark.queries.registry import register
from fact_hive_custom_spark.tables import load_table


@register(
    "q_tpch_q10",
    oracle="""
    SELECT c.c_custkey,
           c.c_name,
           n.n_name,
           CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_e4
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY 1, 2, 3, 4
    ORDER BY revenue_e4 DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue report (TPC-H Q10 shape): the 20 customers
    who returned the most revenue in one quarter, with their nation.

    Physical strategy at 100 TB: both date predicates and the
    returnflag filter are pushed into the fact scans (parquet
    row-group skipping on o_orderdate; dictionary filter on
    l_returnflag). orders⋈lineitem shuffles once on the orderkey the
    facts share; customer and nation are dimension sides and broadcast
    (nation is tiny always; customer post-agg is keyed rows only —
    the join runs AFTER the fact chain is reduced by the quarter
    filter, so Catalyst's size estimate stays honest). The final
    top-20 is TakeOrderedAndProject — a per-partition heap, never a
    global sort. Revenue in exact 1e-4 integer units (cents ×
    discount-complement-percent), acctbal in cents: no float crosses
    an engine boundary."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    joined = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
    )
    return (
        joined.groupBy(
            "c_custkey",
            "c_name",
            "n_name",
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("acctbal_cents"),
        )
        .agg(F.sum(rev).cast("bigint").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_tpch_q18",
    oracle="""
    SELECT c.c_name,
           c.c_custkey,
           o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 300
    )
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY totalprice_cents DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): orders whose total
    quantity exceeds 300 units, with the ordering customer — the
    agg-derived-semi-join-back-onto-the-fact pattern.

    Physical strategy at 100 TB: the HAVING subquery is ONE partial+
    final aggregation of (orderkey, qty) pairs — map-side combine
    shrinks the shuffle to distinct orderkeys; its survivors (a few
    per million orders at TPC-H selectivity) broadcast as a LEFT SEMI
    filter onto lineitem BEFORE the wide customer join, so the
    expensive chain only ever sees qualifying orderkeys. lineitem and
    the agg shuffle on the same key (orderkey) — one exchange is
    reused. l_quantity values are small integers stored as double, so
    their SUM is exact and the BIGINT cast is engine-portable."""
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(big), "l_orderkey", "left_semi"
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(li, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), c.c_custkey == o.o_custkey
    )
    return (
        joined.groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
                "totalprice_cents"
            ),
        )
        .agg(F.sum("l_quantity").cast("bigint").alias("sum_qty"))
        .orderBy(F.desc("totalprice_cents"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q_tpch_q14",
    oracle="""
    WITH j AS (
        SELECT p.p_type,
               CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    )
    SELECT CAST(1000000 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN rev ELSE 0 END)
                // SUM(rev) AS BIGINT) AS promo_ppm,
           CAST(SUM(rev) AS BIGINT) AS total_rev_e4,
           COUNT(*) AS n_lines
    FROM j
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect report (TPC-H Q14 shape): the month's revenue
    share earned by promotional parts, in exact integer ppm.

    Physical strategy at 100 TB: the one-month shipdate range is
    pushed into the lineitem scan (parquet row-group skipping makes
    this the classic partition-pruning win); `part` broadcasts as the
    dim side; the conditional aggregation is one map-side-combined
    pass producing a single row — no second shuffle, no join
    reordering risk. Revenue in exact 1e-4 integer units, the share
    an exact-integer ppm ratio."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_type"), rev.alias("rev")
    )
    return j.agg(
        F.expr(
            "CAST(1000000 * SUM(CASE WHEN p_type LIKE 'PROMO%'"
            " THEN rev ELSE 0 END) AS BIGINT) DIV SUM(rev)"
        )
        .cast("bigint")
        .alias("promo_ppm"),
        F.sum("rev").cast("bigint").alias("total_rev_e4"),
        F.count(F.lit(1)).alias("n_lines"),
    )

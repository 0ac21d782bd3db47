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
from fact_hive_custom_spark.tables import load_table, register_views


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


@register(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT))
                AS BIGINT) AS revenue_e4,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND round(l_discount * 100) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue-change (TPC-H Q6 shape): the discount revenue
    at stake in one shipping year for mid-discount small-quantity
    lines — the canonical SCAN query: zero joins, one aggregate, and
    everything rides on predicate pushdown.

    Physical strategy at 100 TB: all three predicates reach the
    parquet reader (the date range prunes row groups via min/max
    stats; quantity and discount filter vectorized batches), and the
    single-row aggregate is map-side combined — the whole query is
    one scan-shaped stage with no exchange of anything but 1-row
    partials. The discount band compares on exact integer percent
    (round ×100) so the boundary is knife-edge-free on both
    engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.round(F.col("l_discount") * 100).cast("bigint").between(5, 7)
        & (F.col("l_quantity") < 24)
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.round(
        F.col("l_discount") * 100
    ).cast("bigint")
    return li.agg(
        F.sum(rev).cast("bigint").alias("revenue_e4"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q_subquery_not_in",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE c_nationkey IS NOT NULL
      AND c_nationkey NOT IN (
        SELECT n_nationkey FROM nation
        WHERE n_regionkey = 0 AND n_nationkey IS NOT NULL
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery — the three-valued-logic trap done safely:
    customers outside one region's nations, counted per segment.

    NOT IN is NOT an anti-join when the subquery can yield NULL: one
    NULL makes `x NOT IN (...)` UNKNOWN for every row and the whole
    result empty — the classic production incident. The subquery
    therefore filters NULL keys EXPLICITLY (both engines), after
    which Spark plans the clean null-aware anti join
    (LeftAnti). At 100 TB the subquery side is a broadcast: nations
    (any dimension key-list) ship to every executor and the fact side
    never moves. SURVEY §7.4 NULL-drift rule applied to join keys."""
    n = (
        load_table(spark, sf_dir, "nation")
        .filter((F.col("n_regionkey") == 0) & F.col("n_nationkey").isNotNull())
        .select("n_nationkey")
    )
    # a NULL probe key is UNKNOWN under NOT IN (row dropped) but
    # unmatched under LEFT ANTI (row kept) — quarantine NULL keys on
    # BOTH engines so the two formulations stay equivalent under
    # fixture drift (SURVEY §7.4)
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isNotNull()
    )
    return (
        c.join(
            F.broadcast(n),
            c.c_nationkey == n.n_nationkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


_Q21_SQL = """
    WITH lf AS (
        SELECT l.l_orderkey, l.l_suppkey,
               (l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY) AS late
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_suppkey IS NOT NULL
          AND l.l_orderkey IS NOT NULL
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lf l1 ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (
          SELECT 1 FROM lf l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lf l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.late
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
"""


@register("q_tpch_q21", oracle=_Q21_SQL)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape): for
    finished multi-supplier orders, count the late lines of suppliers
    who were the ONLY late supplier on the order — the classic
    blame-assignment query and the one decorrelation shape nothing
    else in the inventory exercises: a correlated EXISTS and a
    correlated NOT EXISTS against the SAME fact, each carrying a
    non-equi (<>) correlated predicate.

    The fixture has no l_commitdate/l_receiptdate, so "late" is
    l_shipdate more than 75 days after o_orderdate — same per-line
    boolean role, same subquery structure as the published query.

    Physical strategy at 100 TB: both engines run the IDENTICAL SQL
    text; Catalyst decorrelates the EXISTS into a LEFT SEMI and the
    NOT EXISTS into a LEFT ANTI join, both keyed on l_orderkey with
    the <> residual as the join condition. All three lf legs and both
    rewritten joins key on the same l_orderkey, so the lf exchange is
    built once and reused (ReuseExchange) — the plan pin in
    tests/test_plans.py asserts both rewrites are present and the
    l_orderkey exchange count stays minimal. The orderstatus filter
    pushes into the orders scan, shrinking lf before any shuffle;
    supplier is a dimension side (AQE broadcasts it); the final
    top-100 is TakeOrderedAndProject. NULL l_suppkey/l_orderkey rows
    are quarantined identically on both engines: under <> correlation
    a NULL suppkey can never match, but a NULL orderkey would differ
    between groupBy and equi-join handling (SURVEY §7.4)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q21_SQL)


_Q17_SQL = """
    SELECT CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS small_rev_e2,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND p.p_size < 15
      AND 5 * CAST(l.l_quantity AS BIGINT)
              * (SELECT COUNT(*) FROM lineitem l2
                 WHERE l2.l_partkey = l.l_partkey)
          < (SELECT CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS BIGINT)
             FROM lineitem l2
             WHERE l2.l_partkey = l.l_partkey)
"""


@register("q_tpch_q17", oracle=_Q17_SQL)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): revenue from
    lines of one brand's small parts whose quantity is below 20% of
    that part's all-time average quantity — the correlated
    SCALAR-AGGREGATE decorrelation family (Q21 covers correlated
    EXISTS; nothing else in the inventory forces Catalyst through
    ScalarSubquery → Aggregate-then-join rewriting).

    The fixture part table has no p_container, so the inner predicate
    pair is p_brand + p_size; the subquery structure is the published
    one. The knife-edge is removed exactly, not approximately:
    `qty < 0.2 * AVG(qty)` is compared as
    `5 * qty * COUNT(*) < SUM(qty)` in BIGINT (quantities are
    integral), so no float AVG ever crosses an engine boundary
    (SURVEY §7.4 ROUND discipline; the q_llm_domain_mix incident).

    Physical strategy at 100 TB: both engines run the IDENTICAL SQL;
    Catalyst decorrelates each correlated aggregate into a
    map-side-combined groupBy(l_partkey) over lineitem joined back on
    l_partkey (RewriteCorrelatedScalarSubquery) — per-row
    re-execution never happens; the exchanges carry (partkey, bigint)
    partials, never line rows. The plan pin asserts the rewrite:
    per-partkey HashAggregates feeding equi-joins, zero cartesian.
    The brand/size filter reaches the part scan and `part`
    broadcasts. At sf0.01 AQE broadcasts the aggregate legs too; on a
    cluster their size crosses the threshold and the same plan
    becomes a co-partitioned shuffle join on l_partkey — both legs
    and the probe share one key, so one partitioning serves all.
    Final single-row SUM is exact cents."""
    register_views(spark, sf_dir)
    return spark.sql(_Q17_SQL)


_Q20_SQL = """
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT ps.l_suppkey
        FROM (
            SELECT l_suppkey, l_partkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS total_qty
            FROM lineitem
            WHERE l_suppkey IS NOT NULL
            GROUP BY l_suppkey, l_partkey
        ) ps
        WHERE ps.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
        AND ps.total_qty >= 60
        AND 2 * COALESCE(
            (SELECT CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS BIGINT)
             FROM lineitem l2
             WHERE l2.l_partkey = ps.l_partkey
               AND l2.l_suppkey = ps.l_suppkey
               AND l2.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
               AND l2.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'),
            0) > ps.total_qty
    )
    ORDER BY s.s_name, s.s_acctbal
"""


@register("q_tpch_q20", oracle=_Q20_SQL)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentrated-stock suppliers (TPC-H Q20 shape): suppliers with
    a substantial 'small%'-part lane (≥60 units lifetime) where the
    single year 1997 carried the MAJORITY of that lane's volume —
    Q20's "availqty > half of one period's shipments" threshold
    re-aimed at the fixture (no partsupp table, so ps_availqty is
    replaced by the per-(supplier, part) all-time shipped total). The
    published query's structure is kept exactly: IN-subquery →
    IN-subquery → correlated scalar aggregate, with the correlation
    on TWO keys (l_partkey AND l_suppkey) — the multi-key variant of
    the Q17 decorrelation family. Selectivity is real, not vacuous:
    37/100 suppliers qualify at sf0.01.

    COALESCE(…, 0) pins the empty-subquery case (no 1997 shipments →
    SUM is NULL) to the same kept-row semantics on both engines
    rather than relying on NULL-comparison dropout (SURVEY §7.4).

    Physical strategy at 100 TB: Catalyst decorrelates the scalar
    SUM into a groupBy(l_partkey, l_suppkey) aggregate over the
    1997-pruned lineitem (shipdate range reaches the parquet scan),
    LEFT-joined to the outer per-(supplier, part) aggregate on the
    SAME two keys — one key layout for both exchanges, so the join
    co-locates. The part name-filter IN becomes a LeftSemi with a
    broadcast dim side; the outer supplier IN is another LeftSemi on
    a tiny distinct suppkey set. Exchanges carry (keys, bigint)
    partials only — never line rows. All quantities exact BIGINT."""
    register_views(spark, sf_dir)
    return spark.sql(_Q20_SQL)

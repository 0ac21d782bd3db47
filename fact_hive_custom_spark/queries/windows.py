"""Window functions, sorts, limits, set operations (SURVEY.md §2.2.E).

Determinism discipline (§7.4.3): every window/sort order carries a
full tiebreak key chain so results are identical across engines and
across shuffle layouts. Running/moving sums are computed over
DECIMAL so windowed aggregation is exact regardless of each engine's
internal summation tree (DuckDB uses segment trees; Spark a running
accumulator — float association would differ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fact_hive_custom_spark.queries.registry import register
from fact_hive_custom_spark.tables import load_table

def _w_cust():
    """Canonical per-customer order sequence: total order via (date, key).

    Built lazily — Column construction requires an active session.
    """
    return Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )


@register(
    "q_win_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number()   OVER w AS rn,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           ROUND(percent_rank() OVER w, 6) AS prnk,
           ntile(4)       OVER w AS quartile,
           ROUND(cume_dist() OVER w, 6) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over a total per-customer order (date, key tiebreak)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(_w_cust()).alias("rn"),
        F.rank().over(_w_cust()).alias("rnk"),
        F.dense_rank().over(_w_cust()).alias("drnk"),
        F.round(F.percent_rank().over(_w_cust()), 6).alias("prnk"),
        F.ntile(4).over(_w_cust()).alias("quartile"),
        F.round(F.cume_dist().over(_w_cust()), 6).alias("cdist"),
    )


@register(
    "q_win_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day', lag(o_orderdate) OVER w, o_orderdate)  AS days_since_prev,
           date_diff('day', o_orderdate, lead(o_orderdate) OVER w) AS days_to_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: gap in days between consecutive orders per customer."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(_w_cust())).alias("days_since_prev"),
        F.datediff(F.lead("o_orderdate").over(_w_cust()), F.col("o_orderdate")).alias("days_to_next"),
    )


@register(
    "q_win_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DECIMAL(18,2)) AS cum_spend
    FROM orders
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total (ROWS unbounded-preceding frame), DECIMAL-exact."""
    o = load_table(spark, sf_dir, "orders")
    w = _w_cust().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("decimal(18,2)").alias("cum_spend"),
    )


@register(
    "q_win_moving",
    oracle="""
    SELECT event_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w, 4) AS mov_avg3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average of event value per user.

    Expressed as exact DECIMAL sum ÷ count so both engines divide the
    same exact numerator (a windowed double AVG would expose each
    engine's summation association).
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    num = F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
    cnt = F.count(F.lit(1)).over(w)
    return e.select("event_id", F.round(num / cnt, 4).alias("mov_avg3"))


@register(
    "q_win_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DECIMAL(18,2)) AS spend_30d
    FROM orders
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per customer, total spend in the 30 days up to each
    order. The ordering key is epoch-days (numeric) so the RANGE frame
    semantics are engine-independent; peers (same-day orders) aggregate
    together in both engines."""
    o = load_table(spark, sf_dir, "orders")
    epoch_days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch_days.asc())
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("decimal(18,2)").alias("spend_30d"),
    )


@register(
    "q_win_first_last_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value with an explicit full-partition frame
    (the default frame stops at CURRENT ROW — a classic silent-wrong-answer)."""
    o = load_table(spark, sf_dir, "orders")
    w = _w_cust().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first_value(F.col("o_orderkey")).over(w).alias("first_order"),
        F.last_value(F.col("o_orderkey")).over(w).alias("last_order"),
        F.nth_value(F.col("o_orderkey"), 2).over(w).alias("second_order"),
    )


@register(
    "q_sort_multi",
    oracle="""
    SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg, c_acctbal
    FROM customer
    ORDER BY seg DESC NULLS LAST, c_acctbal ASC NULLS FIRST, c_custkey
    LIMIT 50
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS placement + full tiebreak, under a
    LIMIT (where row order actually changes the result set)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
            "c_acctbal",
        )
        .orderBy(
            F.desc_nulls_last("seg"),
            F.asc_nulls_first("c_acctbal"),
            F.asc("c_custkey"),
        )
        .limit(50)
    )


@register(
    "q_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N — Spark plans TakeOrderedAndProject: per-partition
    top-10 then a single-partition merge, never a full global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q_topk_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
    ) t WHERE rn <= 3
    """,
)
def q_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number ≤ k (one shuffle on the group key)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


@register(
    "q_union_all",
    oracle="""
    SELECT c_custkey AS entity_key, c_acctbal AS acctbal, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_key, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup shuffle)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


@register(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics — dedup via hash aggregate)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set) — nationkeys with both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set) — nationkeys with customers but no suppliers.

    `subtract` is Spark's EXCEPT DISTINCT (exceptAll().distinct() would
    wrongly subtract multiplicities before deduping). The supplier side
    is filtered so the difference is non-empty at every fixture scale.
    """
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


@register(
    "q_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset: min of per-side multiplicities)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@register(
    "q_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset: multiplicity difference)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@register(
    "q_win_sessionize",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        WHERE ts IS NOT NULL
    ),
    lagd AS (
        SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        FROM e
    ),
    marked AS (
        SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
                       THEN 1 ELSE 0 END AS new_s
        FROM lagd
    ),
    sess AS (
        SELECT *, CAST(SUM(new_s) OVER (
            PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS BIGINT) AS session_seq
        FROM marked
    )
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           MIN(us) AS start_us, MAX(us) AS end_us,
           MAX(us) - MIN(us) AS duration_us
    FROM sess GROUP BY user_id, session_seq
    """,
)
def q_win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (the batch counterpart of q_stream_session):
    per-user 30-minute-gap sessions via lag → new-session flag →
    running-sum session ids → per-session rollup.

    All three windows and the final aggregation share ONE partitioning
    (user_id), so Spark plans a single exchange and sorts once; time
    arithmetic stays on exact integer microseconds (unix_micros /
    epoch_us) — no float-seconds drift between engines. At 100 TB
    user_id is the natural partition key and no per-user history is
    unbounded (windows are per-partition streams, never materialized
    whole)."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())  # unorderable rows quarantine
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"))
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("us").over(w)
    new_s = F.when(prev.isNull() | ((F.col("us") - prev) > 1_800_000_000), 1).otherwise(0)
    sess = (
        e.withColumn("new_s", new_s)
        .withColumn("session_seq", F.sum("new_s").over(run).cast("bigint"))
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


@register(
    "q_win_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
           ntile(4) OVER w AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank bundle per market segment: ntile(4) quartile,
    percent_rank, cume_dist over account balance.

    The order key is (c_acctbal, c_custkey) — unique, so ntile's
    bucket boundaries and both rank fractions are engine-deterministic
    (an acctbal-only ordering would leave tied rows in
    implementation-defined order). One exchange on c_mktsegment; at
    100 TB a high-cardinality partition key keeps windows parallel —
    segment count here is 5, the demo's limitation, not the plan's."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("acctbal_cents"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "q_win_pattern",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS n1,
               lead(event_type, 2) OVER w AS n2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT user_id, COUNT(*) AS n_matches
    FROM o
    WHERE event_type = 'view' AND (n1 = 'click' OR n2 = 'click')
    GROUP BY user_id
    """,
)
def q_win_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern detection (MATCH_RECOGNIZE-lite): count, per
    user, the 'view' events followed by a 'click' within the next two
    events — order-sensitive micro-sequences that funnels (global
    first-times, q_funnel_steps) and adjacent-pair transitions
    (q_event_transitions) cannot express.

    Fixed-lookahead lead() columns keep the match a pure window
    projection — no self-join, no per-user array materialization; the
    window and the count share ONE user_id exchange. A longer pattern
    widens the lead set (or, beyond a few steps, becomes the
    collect-sorted-array + higher-order-scan shape); the n1/n2
    disjunction here is the 'reluctant quantifier' case in its
    cheapest form. Ordering key (ts, event_id) is unique per user, so
    both engines see identical sequences."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    o = e.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("n1"),
        F.lead("event_type", 2).over(w).alias("n2"),
    )
    return (
        o.filter(
            (F.col("event_type") == "view")
            & ((F.col("n1") == "click") | (F.col("n2") == "click"))
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


@register(
    "q_win_distinct_count",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id, event_id,
           CAST(count(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_distinct_types
    FROM e
    """,
)
def q_win_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over a window — "how many distinct event
    types has this user produced so far". Spark rejects
    COUNT(DISTINCT) in window frames, so the engine composes it as
    size(collect_set() OVER w): the set state dedups inside the frame
    and size() reads its cardinality — same semantics, one window
    shuffle on user_id, no self-join.

    Scale: state per row is the distinct-value set, bounded by the
    event-type vocabulary (not the frame length) — safe for
    low-cardinality attributes; for high-cardinality ones switch to
    the sessionized approx_count_distinct rollup (q_agg_sketch_rollup
    pattern). Order is the unique (us, event_id) chain, so frames are
    engine-identical.
    """
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())  # unorderable rows quarantine
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("us"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("bigint")
        .alias("n_distinct_types"),
    )


@register(
    "q_union_by_name",
    oracle="""
    WITH u AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL BY NAME
        SELECT o_orderstatus, o_orderkey, o_orderpriority AS priority
        FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(COUNT(*) FILTER (WHERE price_cents IS NULL) AS BIGINT)
               AS n_missing_price,
           CAST(COUNT(*) FILTER (WHERE priority IS NULL) AS BIGINT)
               AS n_missing_priority,
           CAST(SUM(COALESCE(price_cents, 0)) AS BIGINT) AS sum_cents
    FROM u GROUP BY o_orderstatus
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-tolerant union: two extracts with DIFFERENT column sets
    and orders combine by NAME with NULL fill for absent columns —
    the append that survives schema evolution, where positional UNION
    would silently pair mismatched columns or fail. (Spark:
    `unionByName(allowMissingColumns=True)`; oracle: DuckDB's
    `UNION ALL BY NAME`.) The missing-column NULL counts are part of
    the output so the fill behavior itself is oracle-checked, not
    just the surviving values.

    Scale: union is a zero-shuffle plan concatenation — partitions of
    both inputs stream independently into the map-side-combined
    groupBy; cost is the one count shuffle."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("price_cents"),
    )
    b = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderstatus",
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
    )
    u = a.unionByName(b, allowMissingColumns=True)
    return u.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("price_cents").isNull(), 1))
        .cast("bigint")
        .alias("n_missing_price"),
        F.count(F.when(F.col("priority").isNull(), 1))
        .cast("bigint")
        .alias("n_missing_priority"),
        F.sum(F.coalesce(F.col("price_cents"), F.lit(0)))
        .cast("bigint")
        .alias("sum_cents"),
    )


@register(
    "q_win_percent_rank",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           percent_rank() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
           ) AS pr,
           cume_dist() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
           ) AS cd
    FROM orders
    """,
)
def q_win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per order within its priority class —
    the relative-standing window surface (§E) the ntile query
    approximates in buckets. Both are exact rationals evaluated as
    ONE double division ((rank−1)/(n−1) and rank/n) over the unique
    (price, orderkey) order, so the engines agree bit-for-bit with no
    rounding pin needed; the full tiebreak chain keeps rank itself
    deterministic.

    Plan: one hash exchange on the partition key, per-partition sort
    — the q_win_ranking shape; at 100 TB each priority class is a
    window partition and nothing else shuffles."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )

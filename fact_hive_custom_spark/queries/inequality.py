"""Concentration / inequality statistics — the revenue-distribution
diagnostics a marketplace analytics team runs per segment and per
market: Theil T index (the decomposable inequality measure; the plain
Gini lives at q_agg_gini, stats.py:508) and the Herfindahl–Hirschman
index (supplier market concentration, the antitrust screen).

House discipline throughout: money stays in exact bigint cents, every
statistic lands in an e6/e12-scaled integer, the ONLY floating-point
op is a single composed-identically-on-both-engines DOUBLE `ln` whose
result is floor-pinned to e6 before any cross-row summation, and the
big final quotients run in DECIMAL(38,0) / HUGEINT via the _dfloor
identity (Spark's bare DIV wraps past 2^63 — the round-10 sf1.0
lesson, stats.py:2203).

Reference analogue: none — the reference (/root/reference/fact-hive,
142 lines of HiveOS miner bash, SURVEY.md §0) has no query surface;
these are charter-derived analytics operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fact_hive_custom_spark.queries.registry import register
from fact_hive_custom_spark.queries.stats import _dfloor
from fact_hive_custom_spark.tables import load_table

_D38 = "DECIMAL(38,0)"


@register(
    "q_stat_theil",
    oracle="""
    WITH spend AS (
        SELECT c.c_mktsegment AS segment,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_custkey IS NOT NULL AND o.o_totalprice IS NOT NULL
          AND c.c_mktsegment IS NOT NULL
        GROUP BY c.c_mktsegment, o.o_custkey
    ),
    tot AS (
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS s
        FROM spend GROUP BY segment
    ),
    terms AS (
        SELECT t.segment, p.x, t.n, t.s,
               CAST(floor(ln(CAST(p.x AS DOUBLE) * t.n
                             / CAST(t.s AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS term_e6
        FROM spend p JOIN tot t USING (segment)
    ),
    num AS (
        SELECT segment,
               CAST(MAX(n) AS BIGINT) AS n_customers,
               CAST(MAX(s) AS HUGEINT) AS s,
               CAST(SUM(CAST(x AS HUGEINT) * term_e6) AS HUGEINT) AS nm
        FROM terms GROUP BY segment
    )
    SELECT segment, n_customers,
           CAST(s AS BIGINT) AS sum_cents,
           CAST(CASE WHEN nm >= 0 THEN nm // s
                     ELSE -((-nm) // s) END AS BIGINT) AS theil_e6
    FROM num ORDER BY segment
    """,
)
def q_stat_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T index of customer spend per segment — the inequality
    measure that (unlike Gini) decomposes additively into
    within-group + between-group parts, so segment scores reconcile
    against a corpus-wide run. T = Σ (x_i/S)·ln(x_i/μ) computed as
    Σ x_i·term_e6 / S with term_e6 = ⌊ln(x_i·n/S)·1e6 + 0.5⌋: one
    DOUBLE ln per customer, composed the same on both engines
    (CAST(x AS DOUBLE)·n / s), floor-pinned to an exact bigint
    BEFORE the cross-row sum (the q_llm_charfreq_kl discipline), so
    the total is order-immune integer arithmetic. The final quotient
    is sign-symmetric truncation spelled as the SAME CASE on both
    engines (T ≥ 0 mathematically, but e6 rounding can nudge a
    near-uniform group a hair negative, and Spark DIV truncates
    where DuckDB // floors — the DIV-wrap lesson's sibling).

    Plan: per-customer spend map-combines to one row each, the
    segment totals are a |segments|-row broadcast back onto the
    spend rows, and the weighted term sum map-combines again —
    two small shuffles, no window, no sort; at 100 TB it is two
    passes of the orders join output."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isNotNull()
    )
    spend = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("x")
        )
        .drop("custkey")
    )
    tot = spend.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    terms = spend.join(F.broadcast(tot), "segment").select(
        "segment",
        "x",
        "n",
        "s",
        F.expr(
            "CAST(floor(ln(CAST(x AS DOUBLE) * n / CAST(s AS DOUBLE))"
            " * 1000000 + 0.5) AS BIGINT)"
        ).alias("term_e6"),
    )
    num = terms.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.max("s").cast("bigint").alias("s"),
        F.sum(F.expr(f"CAST(x AS {_D38}) * term_e6")).cast(_D38).alias("nm"),
    )
    return num.select(
        "segment",
        "n_customers",
        F.col("s").alias("sum_cents"),
        F.expr(
            "CAST(CASE WHEN nm >= 0 THEN "
            + _dfloor("nm", f"CAST(s AS {_D38})")
            + " ELSE -("
            + _dfloor("-nm", f"CAST(s AS {_D38})")
            + ") END AS BIGINT)"
        ).alias("theil_e6"),
    ).orderBy("segment")


@register(
    "q_stat_hhi",
    oracle="""
    WITH rev AS (
        SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
               CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS r
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE l.l_suppkey IS NOT NULL AND l.l_extendedprice IS NOT NULL
          AND s.s_nationkey IS NOT NULL
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_sup,
               CAST(SUM(CAST(r AS HUGEINT)) AS HUGEINT) AS s
        FROM rev GROUP BY nationkey
    ),
    shares AS (
        SELECT r.nationkey, t.n_sup, t.s,
               CAST(CAST(r.r AS HUGEINT) * 1000000000 // t.s AS BIGINT)
                   AS share_e9
        FROM rev r JOIN tot t USING (nationkey)
    )
    SELECT n.n_name AS nation,
           CAST(MAX(sh.n_sup) AS BIGINT) AS n_suppliers,
           CAST(MAX(sh.s) AS BIGINT) AS rev_cents,
           CAST(SUM(CAST(sh.share_e9 AS HUGEINT) * sh.share_e9)
                // 1000000 AS BIGINT) AS hhi_e12
    FROM shares sh JOIN nation n ON sh.nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY nation
    """,
)
def q_stat_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of supplier revenue concentration
    per nation — the antitrust-style market-concentration screen
    (HHI > 0.25 ⇒ highly concentrated). Each supplier's share is
    quantized ONCE to an exact integer share_e9 = r·1e9 DIV S (a
    single deterministic integer division per supplier, identical on
    both engines), then HHI_e12 = Σ share_e9² DIV 1e6 is pure integer
    algebra — bounding every intermediate (Σ share² ≤ n·1e18) without
    the raw Σr²/S² form whose numerator would need ~1e34 at sf1.0.

    Plan: the lineitem→supplier join is a broadcast (supplier is the
    small dim), revenue map-combines per (nation, supplier), the
    nation totals are a 25-row broadcast back, and the share/HHI
    algebra runs on |suppliers| rows; nation names join broadcast at
    the end. One real shuffle (the revenue groupBy) at any scale."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_suppkey").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    sup = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isNotNull()
    )
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("r")
        )
    )
    tot = rev.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sup"),
        F.sum("r").cast("bigint").alias("s"),
    )
    shares = rev.join(F.broadcast(tot), "nationkey").select(
        "nationkey",
        "n_sup",
        "s",
        F.expr(
            "CAST("
            + _dfloor(f"CAST(r AS {_D38}) * 1000000000", f"CAST(s AS {_D38})")
            + " AS BIGINT)"
        ).alias("share_e9"),
    )
    return (
        shares.join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            shares["nationkey"] == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max("n_sup").cast("bigint").alias("n_suppliers"),
            F.max("s").cast("bigint").alias("rev_cents"),
            F.expr(
                "CAST("
                + _dfloor(
                    f"SUM(CAST(share_e9 AS {_D38}) * share_e9)", "1000000"
                )
                + " AS BIGINT)"
            ).alias("hhi_e12"),
        )
        .orderBy("nation")
    )

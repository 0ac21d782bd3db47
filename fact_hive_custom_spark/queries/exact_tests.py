"""Exact (combinatorial) hypothesis tests + multiple-testing control:
Fisher's exact test, the paired sign test, Benjamini–Hochberg FDR
adjustment over the sign-test family, and the paired t-test — the
small-sample / paired companions to the asymptotic z/χ²/Welch family
already in stats.py.

These are the ONLY tests in the inventory whose p-values are exact
rational numbers (binomial / hypergeometric tail sums), so the house
discipline gets to go further than usual: the p-value itself — not
just the test statistic — is an exact integer ppm, computed from
integer binomial coefficients on both engines (no ln, no erf, no CDF
approximation anywhere). Binomials come from exact factorials:
n ≤ 25 here, so n! ≤ 25! ≈ 1.55e25 fits DECIMAL(38,0)/HUGEINT, and
C(n,k) = n! DIV (k!·(n−k)!) is exact integral division on both
engines (worst intermediate k!·(n−k)! = 12!·13! ≈ 3.0e18 < 2^63).

Scale shape shared by all four: the corpus collapses FIRST to a
dimension-bounded relation (25 nations / 5 regions / 12 months — one
map-combined aggregation, the only corpus-wide exchange), and every
combinatorial step runs on that ≤ 300-row relation. Exact tests are
FOR small n — the big-data part is the exact integer revenue
collapse, which is one scan at any corpus size.

Charter-derived capability — the reference
(`/root/reference/fact-hive/h-run.sh:1-106`) is a miner wrapper with
no statistics surface (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fact_hive_custom_spark.queries.registry import register
from fact_hive_custom_spark.tables import load_table

_D38 = "decimal(38,0)"

# Factorial lookup as a constant-folded array literal: fv[i+1] = i!
# (element_at is 1-indexed). BIGINT is enough through 20!; the Fisher
# path needs 25!, so that array is DECIMAL(38,0). The i = 0 guard is
# load-bearing: Spark's sequence(1, 0) is the DESCENDING [1, 0] (not
# empty like DuckDB's generate_series), which would fold 0! to 0.
_FV12 = (
    "transform(sequence(0, 12), i -> CASE WHEN i = 0 THEN CAST(1 AS BIGINT)"
    " ELSE aggregate(sequence(1, i), CAST(1 AS BIGINT), (a, x) -> a * x)"
    " END)"
)
_FV25 = (
    f"transform(sequence(0, 25), i -> CASE WHEN i = 0 THEN CAST(1 AS {_D38})"
    f" ELSE aggregate(sequence(1, i), CAST(1 AS {_D38}),"
    f" (a, x) -> CAST(a * x AS {_D38})) END)"
)

# DuckDB twin: recursive factorial table in HUGEINT.
_FCT_CTE = """fct(i, v) AS (
        SELECT 0, CAST(1 AS HUGEINT)
        UNION ALL
        SELECT i + 1, CAST(v * (i + 1) AS HUGEINT) FROM fct WHERE i < 25
    )"""

# Shared derivation for the paired family: exact monthly revenue cents
# per nation for 1996 vs 1997 on a full 12-month spine (a month with no
# orders is a 0-cent month, not a missing row — zero-vs-zero pairs then
# drop out of the sign test as ties, identically on both engines).
_REV_CTES = """rev AS (
        SELECT c_nationkey AS nk,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
          AND o_custkey IS NOT NULL AND c_nationkey IS NOT NULL
          AND year(o_orderdate) IN (1996, 1997)
        GROUP BY 1, 2, 3
    ),
    spine AS (
        SELECT n_nationkey AS nk, unnest(generate_series(1, 12)) AS mo
        FROM nation WHERE n_nationkey IS NOT NULL
    ),
    diffs AS (
        SELECT s.nk, s.mo,
               COALESCE(MAX(CASE WHEN r.yr = 1997 THEN r.cents END), 0)
             - COALESCE(MAX(CASE WHEN r.yr = 1996 THEN r.cents END), 0)
               AS d
        FROM spine s
        LEFT JOIN rev r ON r.nk = s.nk AND r.mo = s.mo
        GROUP BY 1, 2
    )"""


def _monthly_diffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nk, mo, d): exact 1997−1996 monthly revenue diff in cents per
    nation on the full nation × 12-month spine."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
            & F.col("o_custkey").isNotNull()
        )
        .withColumn("yr", F.year("o_orderdate").cast("bigint"))
        .filter(F.col("yr").isin(1996, 1997))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isNotNull())
        .select("c_custkey", "c_nationkey")
    )
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            "yr",
            F.month("o_orderdate").cast("bigint").alias("mo"),
        )
        .agg(
            F.sum(
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            ).alias("cents")
        )
    )
    spine = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey").isNotNull())
        .select(F.col("n_nationkey").alias("nk"))
        .select("nk", F.explode(F.sequence(F.lit(1), F.lit(12))).alias("mo"))
        .withColumn("mo", F.col("mo").cast("bigint"))
    )
    return (
        spine.join(rev, ["nk", "mo"], "left")
        .groupBy("nk", "mo")
        .agg(
            (
                F.coalesce(
                    F.max(F.when(F.col("yr") == 1997, F.col("cents"))),
                    F.lit(0),
                )
                - F.coalesce(
                    F.max(F.when(F.col("yr") == 1996, F.col("cents"))),
                    F.lit(0),
                )
            ).alias("d")
        )
    )


def _sign_test_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation exact sign test on the monthly diffs: (nk, n_pairs,
    k_pos, p_ppm) where p is the exact two-sided binomial tail,
    p = min(1, 2·Σ_{i≤min(k,n−k)} C(n,i) / 2^n), in exact integer ppm.

    The n = 0 corner (all twelve months tie) needs no special case:
    Σ = C(0,0) = 1, 2·1 capped at 2^0 = 1 gives p = 1 exactly."""
    agg = _monthly_diffs(spark, sf_dir).groupBy("nk").agg(
        F.sum(F.when(F.col("d") != 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pairs"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("k_pos"),
    )
    return (
        agg.withColumn("fv", F.expr(_FV12))
        .withColumn(
            "tail",
            F.expr(
                "aggregate(sequence(0, CAST(least(k_pos, n_pairs - k_pos)"
                " AS INT)), CAST(0 AS BIGINT), (acc, i) -> acc"
                " + element_at(fv, CAST(n_pairs AS INT) + 1)"
                " DIV (element_at(fv, CAST(i AS INT) + 1)"
                " * element_at(fv, CAST(n_pairs - i AS INT) + 1)))"
            ),
        )
        .select(
            "nk",
            "n_pairs",
            "k_pos",
            F.expr(
                "CAST(1000000 * least(2 * tail,"
                " shiftleft(CAST(1 AS BIGINT), CAST(n_pairs AS INT)))"
                " DIV shiftleft(CAST(1 AS BIGINT), CAST(n_pairs AS INT))"
                " AS BIGINT)"
            ).alias("p_ppm"),
        )
    )


_SIGN_CTES = (
    _REV_CTES
    + """,
    sgn AS (
        SELECT nk,
               CAST(COUNT(*) FILTER (WHERE d <> 0) AS BIGINT) AS n_pairs,
               CAST(COUNT(*) FILTER (WHERE d > 0) AS BIGINT) AS k_pos
        FROM diffs GROUP BY 1
    ),
    ch AS (
        SELECT fn.i AS n, fi.i AS i, fn.v // (fi.v * fni.v) AS v
        FROM fct fn
        JOIN fct fi ON fi.i <= fn.i
        JOIN fct fni ON fni.i = fn.i - fi.i
        WHERE fn.i <= 12
    ),
    ptab AS (
        SELECT s.nk, s.n_pairs, s.k_pos,
               CAST(1000000 * least(
                   2 * (SELECT SUM(c.v) FROM ch c
                        WHERE c.n = s.n_pairs
                          AND c.i <= least(s.k_pos, s.n_pairs - s.k_pos)),
                   CAST(1 AS HUGEINT) << CAST(s.n_pairs AS INT))
                   // (CAST(1 AS HUGEINT) << CAST(s.n_pairs AS INT))
                   AS BIGINT) AS p_ppm
        FROM sgn s
    )"""
)


@register(
    "q_stat_sign_test",
    oracle=f"""
    WITH RECURSIVE {_FCT_CTE},
    {_SIGN_CTES}
    SELECT p.nk AS nationkey, n.n_name AS nation, p.n_pairs, p.k_pos,
           p.p_ppm
    FROM ptab p JOIN nation n ON n.n_nationkey = p.nk
    ORDER BY nationkey
    """,
)
def q_stat_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact paired sign test per nation: did monthly order revenue
    shift between 1996 and 1997? n = non-tied months, k = months up,
    and the two-sided p-value is the EXACT binomial tail
    min(1, 2·Σ_{{i≤min(k,n−k)}} C(n,i)/2^n) — an integer rational with
    denominator 2^n where n counts the NON-TIED months (≤ 12; tied
    months drop out of the test), emitted as exact ppm. No normal
    approximation:
    with n ≤ 12 pairs the asymptotic z test (q_stat_prop_ztest's
    regime) is invalid, which is exactly when analysts reach for the
    sign test.

    Binomials: C(n,i) = n!/(i!(n−i)!) from a constant-folded factorial
    array (BIGINT through 12!), exact integral division on both
    engines; DuckDB mirrors with a recursive HUGEINT factorial CTE.
    The n = 0 all-ties corner falls out of the same formula (p = 1).

    Plan: orders⨝customer collapses to (nation, month, year) revenue
    cents in ONE map-combined aggregation — the only corpus-width
    exchange; the 25×12 spine, the pairing, and the tail sum are all
    driver-free arithmetic on a 300-row relation. At 100 TB the cost
    is the scan; the test itself is free."""
    p = _sign_test_rel(spark, sf_dir)
    nat = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey").isNotNull())
        .select(
            F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation")
        )
    )
    return (
        p.join(F.broadcast(nat), "nk")
        .select(
            F.col("nk").alias("nationkey"),
            "nation",
            "n_pairs",
            "k_pos",
            "p_ppm",
        )
        .orderBy("nationkey")
    )


@register(
    "q_stat_bh_fdr",
    oracle=f"""
    WITH RECURSIVE {_FCT_CTE},
    {_SIGN_CTES},
    ranked AS (
        SELECT nk, p_ppm,
               CAST(row_number() OVER (ORDER BY p_ppm, nk) AS BIGINT)
                   AS p_rank,
               CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM ptab
    ),
    adj AS (
        SELECT nk, p_ppm, p_rank, m,
               least(1000000, p_ppm * m // p_rank) AS raw_ppm
        FROM ranked
    )
    SELECT nk AS nationkey, p_ppm, p_rank,
           CAST(MIN(raw_ppm) OVER (
               ORDER BY p_rank
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           ) AS BIGINT) AS p_adj_ppm,
           MIN(raw_ppm) OVER (
               ORDER BY p_rank
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           ) <= 50000 AS reject_fdr05
    FROM adj
    ORDER BY p_rank, nationkey
    """,
)
def q_stat_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR adjustment over the 25-nation sign-test
    family — the multiple-testing control every per-segment test sweep
    (q_stat_sign_test, ttest_welch's pair matrix, …) needs before
    anyone acts on its smallest p-value. p_adj(i) = min_{{j≥i}}
    (p(j)·m/j) capped at 1, computed entirely on the exact ppm
    rationals of the sign-test family: integer multiply, integer DIV,
    and a reverse running MIN — bit-identical across engines, no
    floats anywhere.

    The step-up min is a global window, but its input is the 25-row
    p-value family (one row per nation — collapsed long before any
    window), the bounded-global-window class pinned by
    tests/test_plans.py::TestBoundedGlobalWindows.

    Plan: identical corpus collapse to q_stat_sign_test (shared
    derivation, one scan + one tiny exchange), then rank / adjust on
    25 rows."""
    p = _sign_test_rel(spark, sf_dir).select("nk", "p_ppm")
    w_rank = Window.orderBy("p_ppm", "nk")
    ranked = (
        p.withColumn("p_rank", F.row_number().over(w_rank).cast("bigint"))
        .withColumn("m", F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint"))
        .withColumn(
            "raw_ppm",
            F.least(F.lit(1000000).cast("bigint"), F.expr("p_ppm * m DIV p_rank")),
        )
    )
    w_tail = Window.orderBy("p_rank").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    return ranked.select(
        F.col("nk").alias("nationkey"),
        "p_ppm",
        "p_rank",
        F.min("raw_ppm").over(w_tail).cast("bigint").alias("p_adj_ppm"),
        (F.min("raw_ppm").over(w_tail) <= 50000).alias("reject_fdr05"),
    ).orderBy("p_rank", "nationkey")


@register(
    "q_stat_fisher_exact",
    oracle=f"""
    WITH RECURSIVE {_FCT_CTE},
    bal AS (
        SELECT c_nationkey AS nk,
               SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS cents
        FROM customer
        WHERE c_nationkey IS NOT NULL AND c_acctbal IS NOT NULL
        GROUP BY 1
    ),
    nt AS (
        SELECT n.n_nationkey AS nk,
               r.r_name = 'ASIA' AS is_asia,
               COALESCE(b.cents, 0) AS cents
        FROM nation n
        JOIN region r ON n.n_regionkey = r.r_regionkey
        LEFT JOIN bal b ON b.nk = n.n_nationkey
        WHERE n.n_nationkey IS NOT NULL AND n.n_regionkey IS NOT NULL
    ),
    flagged AS (
        SELECT nk, is_asia,
               row_number() OVER (ORDER BY cents DESC, nk)
                   <= COUNT(*) OVER () // 2 AS above
        FROM nt
    ),
    obs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE is_asia) AS BIGINT) AS r1,
               CAST(COUNT(*) // 2 AS BIGINT) AS c1,
               CAST(COUNT(*) FILTER (WHERE is_asia AND above) AS BIGINT)
                   AS k_obs
        FROM flagged
    ),
    ks AS (
        SELECT o.n, o.r1, o.c1, o.k_obs,
               unnest(generate_series(
                   greatest(0, o.r1 + o.c1 - o.n),
                   least(o.r1, o.c1))) AS k
        FROM obs o
    ),
    terms AS (
        SELECT ks.*,
               (SELECT v FROM fct WHERE i = ks.r1)
                   // ((SELECT v FROM fct WHERE i = ks.k)
                       * (SELECT v FROM fct WHERE i = ks.r1 - ks.k))
               * ((SELECT v FROM fct WHERE i = ks.n - ks.r1)
                   // ((SELECT v FROM fct WHERE i = ks.c1 - ks.k)
                       * (SELECT v FROM fct WHERE i = ks.n - ks.r1
                                                      - ks.c1 + ks.k)))
                   AS nk_tab
        FROM ks
    ),
    obs_term AS (
        SELECT nk_tab AS nk_obs FROM terms WHERE k = k_obs
    ),
    summed AS (
        SELECT MAX(n) AS n, MAX(r1) AS r1, MAX(c1) AS c1,
               MAX(k_obs) AS k_obs,
               SUM(nk_tab) FILTER (WHERE nk_tab <=
                   (SELECT nk_obs FROM obs_term)) AS p_num
        FROM terms
    )
    SELECT s.n AS n_nations, s.r1 AS n_asia, s.c1 AS n_above, s.k_obs,
           CAST(s.p_num AS BIGINT) AS p_num,
           CAST(fn.v // (fc.v * fnc.v) AS BIGINT) AS p_den,
           CAST(1000000 * s.p_num // (fn.v // (fc.v * fnc.v)) AS BIGINT)
               AS p_ppm
    FROM summed s
    JOIN fct fn ON fn.i = s.n
    JOIN fct fc ON fc.i = s.c1
    JOIN fct fnc ON fnc.i = s.n - s.c1
    """,
)
def q_stat_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's exact test on the 2×2 table (nation in ASIA?) ×
    (nation in the top half by total customer account balance?) — the
    exact independence test for the n = 25 contingency regime where
    q_stat_chisq's asymptotics are invalid. Two-sided p by the
    standard point-probability rule: sum the hypergeometric
    probabilities of every table at least as extreme (point prob ≤
    observed's), as EXACT integer rationals — numerator and
    denominator are sums/products of binomial coefficients (max
    C(25,12) = 5 200 300), p_den = C(n, c1), emitted alongside exact
    floored ppm. Probability comparisons happen on the integer
    NUMERATORS (shared denominator), so "at least as extreme" is an
    integer comparison on both engines.

    "Top half by balance" is rank-based (row_number ≤ n DIV 2, ties by
    nationkey), so the margin c1 is fixed by construction and the
    hypergeometric support [max(0, r1+c1−n), min(r1, c1)] is exact on
    any fixture, including drift fixtures with missing nations.

    Factorials: 25! ≈ 1.55e25 in DECIMAL(38,0)/HUGEINT; the worst
    divisor product 12!·13! ≈ 3.0e18 stays inside the DECIMAL(38,0)
    multiply and every DIV result is int64-small.

    Plan: customers collapse to 25 balance rows in one map-combined
    aggregation (the only corpus exchange); ranking, the ≤ 6-term k
    enumeration (explode of a sequence), and the tail sum are
    arithmetic on one tiny relation."""
    bal = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isNotNull() & F.col("c_acctbal").isNotNull())
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(F.expr("CAST(round(c_acctbal * 100) AS BIGINT)")).alias(
                "cents"
            )
        )
    )
    nat = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey").isNotNull() & F.col("n_regionkey").isNotNull())
        .join(
            F.broadcast(load_table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            F.col("n_nationkey").alias("nk"),
            (F.col("r_name") == "ASIA").alias("is_asia"),
        )
    )
    # the groupBy is a semantic no-op (nk is unique) but plans the
    # HashAggregate that proves the global rank window below ranks a
    # per-nation-collapsed relation, never raw rows — the
    # TestBoundedGlobalWindows pin this query is enrolled in
    nt = (
        nat.join(bal, "nk", "left")
        .groupBy("nk", "is_asia")
        .agg(F.coalesce(F.max("cents"), F.lit(0)).alias("cents"))
    )
    w = Window.orderBy(F.col("cents").desc(), "nk")
    flagged = nt.select(
        "nk",
        "is_asia",
        (
            F.row_number().over(w)
            <= F.expr("COUNT(*) OVER () DIV 2")
        ).alias("above"),
    )
    obs = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("is_asia"), 1).otherwise(0))
        .cast("bigint")
        .alias("r1"),
        F.expr("CAST(COUNT(*) DIV 2 AS BIGINT)").alias("c1"),
        F.sum(F.when(F.col("is_asia") & F.col("above"), 1).otherwise(0))
        .cast("bigint")
        .alias("k_obs"),
    )
    terms = (
        obs.withColumn("fv", F.expr(_FV25))
        .select(
            "n",
            "r1",
            "c1",
            "k_obs",
            "fv",
            F.explode(
                F.expr(
                    "sequence(CAST(greatest(0, r1 + c1 - n) AS INT),"
                    " CAST(least(r1, c1) AS INT))"
                )
            ).alias("k"),
        )
        .withColumn(
            "nk_tab",
            F.expr(
                "element_at(fv, CAST(r1 AS INT) + 1)"
                " DIV CAST(element_at(fv, k + 1)"
                f" * element_at(fv, CAST(r1 - k AS INT) + 1) AS {_D38})"
                " * (element_at(fv, CAST(n - r1 AS INT) + 1)"
                " DIV CAST(element_at(fv, CAST(c1 - k AS INT) + 1)"
                " * element_at(fv, CAST(n - r1 - c1 + k AS INT) + 1)"
                f" AS {_D38}))"
            ).cast("bigint"),
        )
        .withColumn(
            "nk_obs",
            F.max(F.when(F.col("k") == F.col("k_obs"), F.col("nk_tab"))).over(
                Window.partitionBy("n")
            ),
        )
    )
    return terms.groupBy().agg(
        F.max("n").alias("n_nations"),
        F.max("r1").alias("n_asia"),
        F.max("c1").alias("n_above"),
        F.max("k_obs").alias("k_obs"),
        F.sum(F.when(F.col("nk_tab") <= F.col("nk_obs"), F.col("nk_tab")))
        .cast("bigint")
        .alias("p_num"),
        F.max(
            F.expr(
                "element_at(fv, CAST(n AS INT) + 1)"
                " DIV CAST(element_at(fv, CAST(c1 AS INT) + 1)"
                f" * element_at(fv, CAST(n - c1 AS INT) + 1) AS {_D38})"
            )
        )
        .cast("bigint")
        .alias("p_den"),
    ).select(
        "n_nations",
        "n_asia",
        "n_above",
        "k_obs",
        "p_num",
        "p_den",
        F.expr("CAST(1000000 * p_num DIV p_den AS BIGINT)").alias("p_ppm"),
    )


@register(
    "q_stat_paired_ttest",
    oracle=f"""
    WITH {_REV_CTES},
    rd AS (
        SELECT r.r_name, d.mo, SUM(d.d) AS d
        FROM diffs d
        JOIN nation n ON n.n_nationkey = d.nk
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    ),
    m AS (
        SELECT r_name,
               CAST(COUNT(*) AS BIGINT) AS n_months,
               SUM(CAST(d AS HUGEINT)) AS sx,
               SUM(CAST(d AS HUGEINT) * CAST(d AS HUGEINT)) AS sxx
        FROM rd GROUP BY 1
    )
    SELECT r_name AS region, n_months,
           CAST(sx AS BIGINT) AS sum_d_cents,
           CASE WHEN n_months < 2 OR n_months * sxx - sx * sx = 0
                THEN NULL
                ELSE CAST(1000000 * (sx * sx) * (n_months - 1)
                     // (n_months * sxx - sx * sx) AS BIGINT)
           END AS t2_ppm,
           CAST(CASE WHEN sx > 0 THEN 1 WHEN sx < 0 THEN -1 ELSE 0 END
                AS BIGINT) AS t_sign,
           CASE WHEN n_months < 2 OR n_months * sxx - sx * sx = 0
                THEN NULL
                ELSE 1000000 * (sx * sx) * (n_months - 1)
                     // (n_months * sxx - sx * sx) > 4844335
           END AS significant_05
    FROM m
    ORDER BY region
    """,
)
def q_stat_paired_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t-test per region: mean monthly revenue change 1996→1997
    against its own variance, t² = (Σd)²(n−1)/(n·Σd²−(Σd)²) in exact
    integer ppm with the sign carried separately — the q_stat_ttest
    _welch / q_agg_corr_exact discipline (no sqrt, no float
    accumulation; both engines floor the same rational). The paired
    design removes the between-month variance that Welch's unpaired
    form would (wrongly) count, which is the textbook reason for
    pairing.

    Significance flags t² against t²_{{0.975, df=11}} = 2.200985² →
    4 844 335 ppm (n is the fixed 12-month spine, so df = 11; the same
    literal on both engines — df stays internal just like Welch's).

    Overflow budget: d is a region-month revenue diff in cents;
    1e6·(Σd)²·11 fits DECIMAL(38,0) while |Σd| ≤ ~3e15 cents ($30 T a
    region-year) — beyond any real corpus; divisors keep every DIV
    result int64 (the Welch lesson: Spark integral division returns
    BIGINT and wraps silently past 2^63).

    Plan: the same single corpus collapse as the sign-test family
    (shared derivation), then a 5×12-row pairing and one 5-row
    moment aggregation; the test matrix is driver-free."""
    d = _monthly_diffs(spark, sf_dir)
    reg = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey").isNotNull())
        .join(
            F.broadcast(load_table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("nk"), "r_name")
    )
    rd = (
        d.join(F.broadcast(reg), "nk")
        .groupBy("r_name", "mo")
        .agg(F.sum("d").alias("d"))
    )
    m = rd.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.sum(F.col("d").cast(_D38)).alias("sx"),
        F.sum((F.col("d").cast(_D38) * F.col("d").cast(_D38))).alias("sxx"),
    )
    t2 = F.expr(
        "CASE WHEN n_months < 2 OR n_months * sxx - sx * sx = 0 THEN NULL"
        " ELSE CAST(1000000 * (sx * sx) * (n_months - 1)"
        " DIV (n_months * sxx - sx * sx) AS BIGINT) END"
    )
    return m.select(
        F.col("r_name").alias("region"),
        "n_months",
        F.col("sx").cast("bigint").alias("sum_d_cents"),
        t2.alias("t2_ppm"),
        F.expr(
            "CAST(CASE WHEN sx > 0 THEN 1 WHEN sx < 0 THEN -1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("t_sign"),
        (t2 > 4844335).alias("significant_05"),
    ).orderBy("region")


_PERM_K = 64  # randomization replicates; p resolution 1/(K+1)


@register(
    "q_stat_permutation_test",
    oracle=f"""
    WITH x AS (
        SELECT event_id, event_type = 'click' AS grp,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
        WHERE event_type IN ('click', 'view') AND value IS NOT NULL
          AND event_id IS NOT NULL
    ),
    obs AS (
        SELECT CAST(COUNT(*) FILTER (WHERE grp) AS HUGEINT) AS na,
               CAST(COUNT(*) FILTER (WHERE NOT grp) AS HUGEINT) AS nb,
               CAST(SUM(cents) FILTER (WHERE grp) AS HUGEINT) AS sa,
               CAST(SUM(cents) FILTER (WHERE NOT grp) AS HUGEINT) AS sb
        FROM x
    ),
    reps AS (
        SELECT j.j,
               CAST(COUNT(*) FILTER (WHERE bit = 0) AS HUGEINT) AS na,
               CAST(COUNT(*) FILTER (WHERE bit = 1) AS HUGEINT) AS nb,
               CAST(SUM(cents) FILTER (WHERE bit = 0) AS HUGEINT) AS sa,
               CAST(SUM(cents) FILTER (WHERE bit = 1) AS HUGEINT) AS sb
        FROM x
        CROSS JOIN (SELECT unnest(generate_series(1, {_PERM_K})) AS j) j
        CROSS JOIN LATERAL (SELECT
            ('0x' || substr(md5('pm:' || CAST(x.event_id AS VARCHAR)
             || ':' || CAST(j.j AS VARCHAR)), 1, 15))::BIGINT % 2 AS bit) b
        GROUP BY 1
    ),
    cmp AS (
        SELECT r.j,
               abs(r.sa * r.nb - r.sb * r.na) * (o.na * o.nb)
               >= abs(o.sa * o.nb - o.sb * o.na) * (r.na * r.nb)
                   AS extreme
        FROM reps r CROSS JOIN obs o
        WHERE r.na > 0 AND r.nb > 0
    )
    SELECT (SELECT CAST(na + nb AS BIGINT) FROM obs) AS n_rows,
           CAST({_PERM_K} AS BIGINT) AS k_perms,
           (SELECT CASE WHEN na * nb = 0 THEN NULL
                   ELSE CAST(sa * nb - sb * na AS DOUBLE)
                        / CAST(na * nb AS DOUBLE) END IS NOT NULL
            FROM obs) AS d_obs_defined,
           CAST(COUNT(*) FILTER (WHERE extreme) AS BIGINT) AS n_extreme,
           CAST(1000000 * (1 + COUNT(*) FILTER (WHERE extreme))
                // ({_PERM_K} + 1) AS BIGINT) AS p_ppm
    FROM cmp
    """,
)
def q_stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (Monte-Carlo permutation) test for the mean event
    value, click vs view: {_PERM_K} deterministic label reassignments
    (each row's group in replicate j is one md5('pm:id:j') bit — the
    Bernoulli randomization-inference design, the distributed-friendly
    sibling of the fixed-margin permutation test, which would need a
    global sort per replicate), p = (1 + #extreme)/(K+1) in exact ppm.
    The null needs NO distributional assumption — the complement to
    q_stat_ttest_welch when values are skewed.

    "At least as extreme" compares |mean_a − mean_b| across replicates
    with different group sizes by cross-multiplying the exact integer
    rationals: |s_a·n_b − s_b·n_a|·(N_a·N_b) vs the observed mirror —
    HUGEINT/DECIMAL(38,0) products, no division until the final ppm.
    Replicates with an empty side (impossible at any real n) drop out
    identically on both engines.

    Plan: the K-fold expansion is the q_stat_bootstrap_ci shape — a
    projection (explode of a constant sequence) fused into the scan,
    never shuffled; the exchange carries K×partitions partial
    (n_a, n_b, s_a, s_b) quadruples. At 100 TB the cost is K extra
    map-side hash-and-adds per row, not K corpus copies."""
    from fact_hive_custom_spark.tables import fan_out

    # fan_out: the K-fold expansion below does 64 md5 evaluations per
    # row BEFORE the first exchange; on a one-row-group fixture that
    # entire expansion ran in ONE task (r16 measured: 8-vs-32-core
    # ratio 1.08 — serial). The 3-column frame is ~2 MB at sf0.1, so
    # the widening shuffle is noise; at scale it is an identity.
    x = fan_out(
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin("click", "view")
            & F.col("value").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select(
            "event_id",
            (F.col("event_type") == "click").alias("grp"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    obs = x.agg(
        F.sum(F.when(F.col("grp"), 1).otherwise(0)).cast(_D38).alias("na"),
        F.sum(F.when(~F.col("grp"), 1).otherwise(0)).cast(_D38).alias("nb"),
        F.sum(F.when(F.col("grp"), F.col("cents")).otherwise(0))
        .cast(_D38)
        .alias("sa"),
        F.sum(F.when(~F.col("grp"), F.col("cents")).otherwise(0))
        .cast(_D38)
        .alias("sb"),
    )
    bit = (
        "CAST(conv(substr(md5(concat('pm:', CAST(event_id AS STRING), ':',"
        " CAST(j AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2"
    )
    reps = (
        x.select(
            "event_id",
            "cents",
            F.explode(F.expr(f"sequence(1, {_PERM_K})")).alias("j"),
        )
        .select("j", "cents", F.expr(bit).alias("bit"))
        .groupBy("j")
        .agg(
            F.sum(F.when(F.col("bit") == 0, 1).otherwise(0))
            .cast(_D38)
            .alias("na"),
            F.sum(F.when(F.col("bit") == 1, 1).otherwise(0))
            .cast(_D38)
            .alias("nb"),
            F.sum(F.when(F.col("bit") == 0, F.col("cents")).otherwise(0))
            .cast(_D38)
            .alias("sa"),
            F.sum(F.when(F.col("bit") == 1, F.col("cents")).otherwise(0))
            .cast(_D38)
            .alias("sb"),
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
    )
    o = obs.select(
        F.col("na").alias("o_na"),
        F.col("nb").alias("o_nb"),
        F.col("sa").alias("o_sa"),
        F.col("sb").alias("o_sb"),
    )
    cmp = reps.crossJoin(F.broadcast(o)).select(
        F.expr(
            "abs(sa * nb - sb * na) * (o_na * o_nb)"
            " >= abs(o_sa * o_nb - o_sb * o_na) * (na * nb)"
        ).alias("extreme"),
    )
    # Totality (r11 ADVICE): source n_rows / d_obs_defined from obs
    # (a global agg — always one row) rather than from cmp, which is
    # EMPTY when a group is absent or every replicate lands one-sided;
    # the extreme-count rides in via a broadcast 1-row global agg with
    # coalesce(·, 0) covering the empty-cmp case, and the observed
    # mean difference is guarded CASE WHEN na*nb = 0 THEN NULL exactly
    # like the oracle (Spark and DuckDB disagree on x/0 otherwise).
    ext = cmp.groupBy().agg(
        F.sum(F.when(F.col("extreme"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_extreme_raw")
    )
    return obs.crossJoin(F.broadcast(ext)).select(
        F.expr("CAST(na + nb AS BIGINT)").alias("n_rows"),
        F.lit(_PERM_K).cast("bigint").alias("k_perms"),
        F.expr(
            "CASE WHEN na * nb = 0 THEN NULL"
            " ELSE CAST(sa * nb - sb * na AS DOUBLE)"
            " / CAST(na * nb AS DOUBLE) END IS NOT NULL"
        ).alias("d_obs_defined"),
        F.expr("coalesce(n_extreme_raw, CAST(0 AS BIGINT))").alias(
            "n_extreme"
        ),
        F.expr(
            "CAST(1000000 * (1 + coalesce(n_extreme_raw, CAST(0 AS BIGINT)))"
            f" DIV ({_PERM_K} + 1) AS BIGINT)"
        ).alias("p_ppm"),
    )

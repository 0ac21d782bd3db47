"""Classifier / score evaluation metrics beyond AUC-ROC: Brier score,
log loss, precision-recall AUC, threshold sweep (P/R/F1), McNemar's
paired test, and Cohen's kappa — the standard offline-eval table for
any model score stored in a column, graded here on `events.value` as
a score for the purchase outcome (the exact protocol q_stat_auc_roc /
q_stat_calibration already use, so the whole eval family shares one
derivation).

House discipline (stats.py): every metric is an exact integer
rational — scores in cents, probabilities min-max-normalized to an
e4 integer grid, ln only ever applied to INTEGER arguments and
immediately pinned to floor(ln(x)·1e6 + 0.5) (bit-identical across
engines for integer x), all divisions engine-identical floored DIV on
non-negative operands (signs carried separately where a metric can be
negative, the q_stat_auc_roc gini convention).

Scale shape shared by all six: ONE map-combined groupBy collapses the
corpus to the |distinct cents|-bounded score relation (≤ ~50 k rows at
any corpus size — value has fixed generator range); every window /
staple / reduction downstream runs on that collapsed relation. The
100 TB cost is one scan + one tiny exchange per metric.

Charter-derived capability — the reference
(`/root/reference/fact-hive/h-run.sh:1-106`) has no statistics or
model-eval surface (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fact_hive_custom_spark.queries.registry import register
from fact_hive_custom_spark.tables import load_table

_D38 = "decimal(38,0)"

# Shared oracle CTE: per-(cents, outcome) counts — the corpus
# collapsed to the bounded score relation both engines grade on.
_SCORE_CTE = """g AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS s,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events
        WHERE value IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2
    )"""


def _score_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s, y, cnt): per-(cents, outcome) counts — the single
    map-combined aggregate every metric in this module starts from."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.round(F.col("value") * 100).cast("bigint").alias("s"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        )
        .groupBy("s", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


@register(
    "q_stat_brier",
    oracle=f"""
    WITH {_SCORE_CTE},
    mm AS (SELECT MIN(s) AS smin, MAX(s) AS smax FROM g),
    p AS (
        SELECT g.y, g.cnt,
               CASE WHEN mm.smax > mm.smin THEN
                   ((g.s - mm.smin) * 10000) // (mm.smax - mm.smin)
               ELSE 0 END AS p_e4
        FROM g CROSS JOIN mm
    ),
    t AS (
        SELECT CAST(SUM(cnt) AS HUGEINT) AS n,
               CAST(SUM(CAST(cnt AS HUGEINT)
                        * (p_e4 - 10000 * y) * (p_e4 - 10000 * y))
                    AS HUGEINT) AS sd2
        FROM p
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(sd2 AS BIGINT) AS sum_sq_err_e8,
           CAST(sd2 // (100 * n) AS BIGINT) AS brier_e6
    FROM t
    """,
)
def q_stat_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of `value` (min-max-normalized to an e4 probability
    grid) against the purchase outcome: mean squared error of the
    probability, the proper scoring rule every calibration audit
    starts from. Exact integers end to end — p_e4 = (s−smin)·1e4 DIV
    (smax−smin), each term (p_e4 − 1e4·y)² ≤ 1e8, and brier_e6 =
    Σcnt·d² DIV (100·n) (Σd²/(n·1e8) rescaled to e6). Sums run in
    DECIMAL(38,0)/HUGEINT — headroom ~1e22 rows.

    Plan: the corpus collapses to the |distinct cents|×2 relation in
    ONE map-combined groupBy; min/max is a 1-row staple crossJoined
    in (never a data×data join); the reduction is one tiny aggregate."""
    g = _score_groups(spark, sf_dir)
    mm = g.agg(F.min("s").alias("smin"), F.max("s").alias("smax"))
    p = g.crossJoin(F.broadcast(mm)).select(
        "y",
        "cnt",
        F.expr(
            "CASE WHEN smax > smin THEN ((s - smin) * 10000) DIV (smax - smin)"
            " ELSE 0 END"
        ).alias("p_e4"),
    )
    t = p.agg(
        F.sum(F.col("cnt").cast(_D38)).alias("n"),
        F.sum(
            F.expr(
                f"CAST(cnt AS {_D38})"
                " * (p_e4 - 10000 * y) * (p_e4 - 10000 * y)"
            )
        ).alias("sd2"),
    )
    return t.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("sd2").cast("bigint").alias("sum_sq_err_e8"),
        F.expr("CAST(sd2 DIV (100 * n) AS BIGINT)").alias("brier_e6"),
    )


@register(
    "q_stat_log_loss",
    oracle=f"""
    WITH {_SCORE_CTE},
    mm AS (SELECT MIN(s) AS smin, MAX(s) AS smax FROM g),
    p AS (
        SELECT g.y, g.cnt,
               LEAST(GREATEST(CASE WHEN mm.smax > mm.smin THEN
                   ((g.s - mm.smin) * 10000) // (mm.smax - mm.smin)
               ELSE 0 END, 1), 9999) AS pc
        FROM g CROSS JOIN mm
    ),
    t AS (
        SELECT CAST(SUM(cnt) AS HUGEINT) AS n,
               CAST(SUM(CAST(cnt AS HUGEINT) * (
                   CAST(floor(ln(10000) * 1000000 + 0.5) AS BIGINT)
                   - CASE WHEN y = 1
                          THEN CAST(floor(ln(pc) * 1000000 + 0.5) AS BIGINT)
                          ELSE CAST(floor(ln(10000 - pc) * 1000000 + 0.5)
                                    AS BIGINT)
                     END)) AS HUGEINT) AS sl
        FROM p
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(sl AS BIGINT) AS sum_loss_e6,
           CAST(sl // n AS BIGINT) AS log_loss_e6
    FROM t
    """,
)
def q_stat_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-entropy (log loss) of the min-max e4 probability against
    the purchase outcome, with the standard eps-clamp to [1e-4,
    1−1e-4] (integer grid [1, 9999]) so no term is infinite. Each
    term is −ln(p) = ln(1e4) − ln(pc) (or the 1−p mirror): ln only
    ever sees an INTEGER argument, pinned to floor(·1e6 + 0.5) — the
    q_llm_token_entropy discipline, bit-identical across engines.
    log_loss_e6 = Σcnt·term_e6 DIV n, sums in DECIMAL(38,0)/HUGEINT.

    Plan: identical to q_stat_brier — one map-combined corpus
    collapse, a 1-row min/max staple, one reduction; ln runs ≤
    2·|distinct cents| times per engine, never per corpus row."""
    g = _score_groups(spark, sf_dir)
    mm = g.agg(F.min("s").alias("smin"), F.max("s").alias("smax"))
    p = g.crossJoin(F.broadcast(mm)).select(
        "y",
        "cnt",
        F.expr(
            "LEAST(GREATEST(CASE WHEN smax > smin THEN"
            " ((s - smin) * 10000) DIV (smax - smin) ELSE 0 END, 1), 9999)"
        ).alias("pc"),
    )
    t = p.agg(
        F.sum(F.col("cnt").cast(_D38)).alias("n"),
        F.sum(
            F.expr(
                f"CAST(cnt AS {_D38}) * ("
                "CAST(floor(ln(10000) * 1000000 + 0.5) AS BIGINT)"
                " - CASE WHEN y = 1"
                " THEN CAST(floor(ln(pc) * 1000000 + 0.5) AS BIGINT)"
                " ELSE CAST(floor(ln(10000 - pc) * 1000000 + 0.5) AS BIGINT)"
                " END)"
            )
        ).alias("sl"),
    )
    return t.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("sl").cast("bigint").alias("sum_loss_e6"),
        F.expr("CAST(sl DIV n AS BIGINT)").alias("log_loss_e6"),
    )


@register(
    "q_stat_pr_auc",
    oracle=f"""
    WITH {_SCORE_CTE},
    sc AS (
        SELECT s, CAST(SUM(cnt) AS BIGINT) AS cnt,
               CAST(SUM(y * cnt) AS BIGINT) AS pos
        FROM g GROUP BY s
    ),
    w AS (
        SELECT s, pos,
               CAST(SUM(pos) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
               CAST(SUM(cnt) OVER (ORDER BY s DESC) AS BIGINT) AS pp
        FROM sc
    ),
    t AS (
        SELECT CAST(SUM(CAST(pos AS HUGEINT)
                        * ((tp * 1000000) // pp)) AS HUGEINT) AS ap_num,
               CAST(MAX(tp) AS HUGEINT) AS n_pos,
               CAST(MAX(pp) AS HUGEINT) AS n
        FROM w
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n - n_pos AS BIGINT) AS n_neg,
           CAST(CASE WHEN n_pos > 0 THEN ap_num // n_pos END AS BIGINT)
               AS pr_auc_ppm,
           CAST((n_pos * 1000000) // n AS BIGINT) AS prevalence_ppm
    FROM t
    """,
)
def q_stat_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall AUC (average precision, step interpolation
    with score-group tie handling): AP = Σ over distinct scores s of
    pos_s · P(after s) / n_pos, where P is cumulative precision at the
    threshold — the standard imbalanced-outcome companion to AUC-ROC
    (random baseline = prevalence, reported beside it). Every term is
    an exact integer: cumulative TP/PP windows over the score
    relation, precision in ppm via DIV, the positive-weighted sum in
    HUGEINT/DECIMAL(38,0), one final DIV by n_pos.

    Plan: the q_stat_auc_roc skeleton exactly — map-combined corpus
    collapse to |distinct cents| rows, cumulative rank windows on the
    collapsed relation (the plan-pinned bounded-global-window class),
    one scalar reduction."""
    g = _score_groups(spark, sf_dir)
    sc = g.groupBy("s").agg(
        F.sum("cnt").cast("bigint").alias("cnt"),
        F.sum(F.col("y") * F.col("cnt")).cast("bigint").alias("pos"),
    )
    wdesc = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w = sc.select(
        "s",
        "pos",
        F.sum("pos").over(wdesc).cast("bigint").alias("tp"),
        F.sum("cnt").over(wdesc).cast("bigint").alias("pp"),
    )
    t = w.agg(
        F.sum(
            F.expr(f"CAST(pos AS {_D38}) * ((tp * 1000000) DIV pp)")
        ).alias("ap_num"),
        F.max("tp").cast(_D38).alias("n_pos"),
        F.max("pp").cast(_D38).alias("n"),
    )
    return t.select(
        F.col("n_pos").cast("bigint").alias("n_pos"),
        (F.col("n") - F.col("n_pos")).cast("bigint").alias("n_neg"),
        F.expr(
            "CAST(CASE WHEN n_pos > 0 THEN ap_num DIV n_pos END AS BIGINT)"
        ).alias("pr_auc_ppm"),
        F.expr("CAST((n_pos * 1000000) DIV n AS BIGINT)").alias(
            "prevalence_ppm"
        ),
    )


@register(
    "q_stat_f1_sweep",
    oracle=f"""
    WITH {_SCORE_CTE},
    sc AS (
        SELECT s, CAST(SUM(cnt) AS BIGINT) AS cnt,
               CAST(SUM(y * cnt) AS BIGINT) AS pos
        FROM g GROUP BY s
    ),
    tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS n_pos FROM sc),
    w AS (
        SELECT s AS thr_cents,
               CAST(SUM(pos) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
               CAST(SUM(cnt) OVER (ORDER BY s DESC) AS BIGINT) AS pp
        FROM sc
    )
    SELECT thr_cents, tp,
           pp - tp AS fp,
           t.n_pos - tp AS fn,
           CAST((tp * 1000000) // pp AS BIGINT) AS precision_ppm,
           CAST(CASE WHEN t.n_pos > 0 THEN (tp * 1000000) // t.n_pos END
                AS BIGINT) AS recall_ppm,
           CAST(CASE WHEN pp + t.n_pos > 0 THEN
                (2 * tp * 1000000) // (pp + t.n_pos) END AS BIGINT) AS f1_ppm
    FROM w CROSS JOIN tot t
    ORDER BY thr_cents DESC
    """,
)
def q_stat_f1_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 at EVERY distinct score threshold
    (predict positive iff score ≥ t): the operating-point sweep behind
    threshold selection, one exact-integer row per distinct cents
    value. F1 uses the identity 2TP/(PP + n_pos) = 2PR/(P+R) so a
    single DIV suffices (no nested rounded quotients). TP/PP are
    cumulative sums down the score order; FN = n_pos − TP.

    Plan: map-combined collapse to |distinct cents| rows, two
    cumulative windows on that bounded relation (plan-pinned class),
    a 1-row n_pos staple crossJoined in. Output is threshold-sized,
    never corpus-sized."""
    g = _score_groups(spark, sf_dir)
    sc = g.groupBy("s").agg(
        F.sum("cnt").cast("bigint").alias("cnt"),
        F.sum(F.col("y") * F.col("cnt")).cast("bigint").alias("pos"),
    )
    tot = sc.agg(F.sum("pos").cast("bigint").alias("n_pos"))
    wdesc = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w = sc.select(
        F.col("s").alias("thr_cents"),
        F.sum("pos").over(wdesc).cast("bigint").alias("tp"),
        F.sum("cnt").over(wdesc).cast("bigint").alias("pp"),
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "thr_cents",
            "tp",
            (F.col("pp") - F.col("tp")).alias("fp"),
            (F.col("n_pos") - F.col("tp")).alias("fn"),
            F.expr("CAST((tp * 1000000) DIV pp AS BIGINT)").alias(
                "precision_ppm"
            ),
            F.expr(
                "CAST(CASE WHEN n_pos > 0 THEN (tp * 1000000) DIV n_pos END"
                " AS BIGINT)"
            ).alias("recall_ppm"),
            F.expr(
                "CAST(CASE WHEN pp + n_pos > 0 THEN"
                " (2 * tp * 1000000) DIV (pp + n_pos) END AS BIGINT)"
            ).alias("f1_ppm"),
        )
        .orderBy(F.desc("thr_cents"))
    )


@register(
    "q_stat_mcnemar",
    oracle=f"""
    WITH {_SCORE_CTE},
    cls AS (
        SELECT cnt,
               CASE WHEN (CASE WHEN s >= 10000 THEN 1 ELSE 0 END) = y
                    THEN 1 ELSE 0 END AS ok_a,
               CASE WHEN (CASE WHEN s % 100 >= 50 THEN 1 ELSE 0 END) = y
                    THEN 1 ELSE 0 END AS ok_b
        FROM g
    ),
    t AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN ok_a = 1 AND ok_b = 0 THEN cnt
                        ELSE 0 END) AS BIGINT) AS b,
               CAST(SUM(CASE WHEN ok_a = 0 AND ok_b = 1 THEN cnt
                        ELSE 0 END) AS BIGINT) AS c
        FROM cls
    )
    SELECT n, b, c,
           CAST(CASE WHEN b + c > 0 THEN
               (CAST((b - c) * (b - c) AS HUGEINT) * 1000000) // (b + c)
           END AS BIGINT) AS chi2_e6,
           CAST(CASE WHEN b + c > 0 AND ABS(b - c) >= 1 THEN
               (CAST((ABS(b - c) - 1) * (ABS(b - c) - 1) AS HUGEINT)
                * 1000000) // (b + c)
           END AS BIGINT) AS chi2_cc_e6
    FROM t
    """,
)
def q_stat_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for two paired classifiers on the same examples:
    A predicts purchase iff score ≥ 10000 cents, B iff the cents'
    sub-dollar part ≥ 50 (a deliberately weak comparator) — the
    discordant-pair counts b (A right, B wrong) and c (A wrong, B
    right) drive χ² = (b−c)²/(b+c), with the continuity-corrected
    (|b−c|−1)²/(b+c) variant beside it (1 df; 3.841459 is the 5%
    line, the q_stat_ttest_welch pin). Both statistics are exact e6
    integers — squares are non-negative so DIV is engine-identical.

    Plan: both classifiers are pure functions of the cents value, so
    the whole test reduces ON the collapsed score relation: one
    map-combined groupBy, one tiny reduction, zero windows."""
    g = _score_groups(spark, sf_dir)
    cls = g.select(
        "cnt",
        F.expr(
            "CASE WHEN (CASE WHEN s >= 10000 THEN 1 ELSE 0 END) = y"
            " THEN 1 ELSE 0 END"
        ).alias("ok_a"),
        F.expr(
            "CASE WHEN (CASE WHEN s % 100 >= 50 THEN 1 ELSE 0 END) = y"
            " THEN 1 ELSE 0 END"
        ).alias("ok_b"),
    )
    t = cls.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.when((F.col("ok_a") == 1) & (F.col("ok_b") == 0), F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("ok_a") == 0) & (F.col("ok_b") == 1), F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("c"),
    )
    return t.select(
        "n",
        "b",
        "c",
        F.expr(
            "CAST(CASE WHEN b + c > 0 THEN"
            f" (CAST((b - c) * (b - c) AS {_D38}) * 1000000) DIV (b + c)"
            " END AS BIGINT)"
        ).alias("chi2_e6"),
        F.expr(
            "CAST(CASE WHEN b + c > 0 AND ABS(b - c) >= 1 THEN"
            f" (CAST((ABS(b - c) - 1) * (ABS(b - c) - 1) AS {_D38})"
            " * 1000000) DIV (b + c) END AS BIGINT)"
        ).alias("chi2_cc_e6"),
    )


@register(
    "q_stat_cohens_kappa",
    oracle=f"""
    WITH {_SCORE_CTE},
    cm AS (
        SELECT CAST(SUM(cnt) AS HUGEINT) AS n,
               CAST(SUM(CASE WHEN s >= 10000 AND y = 1 THEN cnt ELSE 0 END)
                    AS HUGEINT) AS n11,
               CAST(SUM(CASE WHEN s >= 10000 AND y = 0 THEN cnt ELSE 0 END)
                    AS HUGEINT) AS n10,
               CAST(SUM(CASE WHEN s < 10000 AND y = 1 THEN cnt ELSE 0 END)
                    AS HUGEINT) AS n01,
               CAST(SUM(CASE WHEN s < 10000 AND y = 0 THEN cnt ELSE 0 END)
                    AS HUGEINT) AS n00
        FROM g
    ),
    k AS (
        SELECT n, n11, n10, n01, n00,
               n * (n11 + n00)
                 - ((n11 + n10) * (n11 + n01)
                    + (n01 + n00) * (n10 + n00)) AS num,
               n * n - ((n11 + n10) * (n11 + n01)
                        + (n01 + n00) * (n10 + n00)) AS den
        FROM cm
    )
    SELECT CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
           CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
           CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
                AS INTEGER) AS kappa_sign,
           CAST(CASE WHEN den > 0 THEN (ABS(num) * 1000000) // den END
                AS BIGINT) AS kappa_abs_ppm
    FROM k
    """,
)
def q_stat_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between classifier A (score ≥ 10000 cents) and
    the purchase outcome: chance-corrected agreement κ = (pₒ − pₑ)/
    (1 − pₑ), computed as the single exact rational (n·agree − Σ
    marginal products)/(n² − Σ marginal products) so no intermediate
    quotient rounds. κ can be negative (worse than chance) and Spark's
    DIV truncates toward zero while DuckDB's // floors, so the sign is
    carried separately and DIV only ever sees |num| ≥ 0 — the
    q_stat_auc_roc gini convention. n² runs in DECIMAL(38,0)/HUGEINT
    (headroom ~1e16 rows).

    Plan: one map-combined corpus collapse, one 2×2 reduction, pure
    scalar algebra — nothing downstream of the first exchange is
    larger than one row."""
    g = _score_groups(spark, sf_dir)
    cm = g.agg(
        F.sum(F.col("cnt").cast(_D38)).alias("n"),
        F.sum(
            F.when((F.col("s") >= 10000) & (F.col("y") == 1), F.col("cnt"))
            .otherwise(0)
            .cast(_D38)
        ).alias("n11"),
        F.sum(
            F.when((F.col("s") >= 10000) & (F.col("y") == 0), F.col("cnt"))
            .otherwise(0)
            .cast(_D38)
        ).alias("n10"),
        F.sum(
            F.when((F.col("s") < 10000) & (F.col("y") == 1), F.col("cnt"))
            .otherwise(0)
            .cast(_D38)
        ).alias("n01"),
        F.sum(
            F.when((F.col("s") < 10000) & (F.col("y") == 0), F.col("cnt"))
            .otherwise(0)
            .cast(_D38)
        ).alias("n00"),
    )
    k = cm.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr(
            "n * (n11 + n00) - ((n11 + n10) * (n11 + n01)"
            " + (n01 + n00) * (n10 + n00))"
        ).alias("num"),
        F.expr(
            "n * n - ((n11 + n10) * (n11 + n01)"
            " + (n01 + n00) * (n10 + n00))"
        ).alias("den"),
    )
    return k.select(
        F.col("n11").cast("bigint").alias("n11"),
        F.col("n10").cast("bigint").alias("n10"),
        F.col("n01").cast("bigint").alias("n01"),
        F.col("n00").cast("bigint").alias("n00"),
        F.expr(
            "CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END"
            " AS INT)"
        ).alias("kappa_sign"),
        F.expr(
            "CAST(CASE WHEN den > 0 THEN (ABS(num) * 1000000) DIV den END"
            " AS BIGINT)"
        ).alias("kappa_abs_ppm"),
    )

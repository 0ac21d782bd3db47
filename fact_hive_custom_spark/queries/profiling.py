"""Data-profiling and content-policy queries: the ingest-time audit
surface (SURVEY.md §2.2 quality group, alongside q_quality_fk_audit).

The reference (`/root/reference/fact-hive`, 142 lines of process
orchestration — SURVEY.md §0) has no query surface; these are the
charter-derived probes a warehouse/LLM-corpus team runs on every new
drop BEFORE queries trust it: a per-column statistical profile and a
rule-attributed content filter.

Determinism: numeric min/max are emitted as exact integer cents /
plain bigints rendered to strings through one shared CAST rule;
distinct and null counts are exact. No float crosses an engine
boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fact_hive_custom_spark.queries.registry import register
from fact_hive_custom_spark.tables import load_table

# (profile column, value expression rendered to string) — one shared
# spec string per engine keeps the rendering rule identical.
_PROFILE_COLS = [
    ("o_orderkey", "CAST(o_orderkey AS STRING)"),
    ("o_custkey", "CAST(o_custkey AS STRING)"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority"),
    ("totalprice_cents", "CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)"),
    ("order_date", "CAST(CAST(o_orderdate AS DATE) AS STRING)"),
]


# supplier profile spec: exercises the negative-value rendering path
# (s_acctbal can be negative — the cents string keeps its sign and the
# lexicographic min/max rule stays engine-identical because the SAME
# rendered strings are compared on both sides).
_SUPPLIER_PROFILE_COLS = [
    ("s_suppkey", "CAST(s_suppkey AS STRING)"),
    ("s_name", "s_name"),
    ("s_nationkey", "CAST(s_nationkey AS STRING)"),
    ("acctbal_cents", "CAST(CAST(round(s_acctbal * 100) AS BIGINT) AS STRING)"),
]


def _profile_oracle(table: str, cols: list[tuple[str, str]]) -> str:
    parts = []
    for name, expr in cols:
        sql_expr = expr.replace("AS STRING", "AS VARCHAR")
        parts.append(
            f"""
    SELECT '{name}' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({sql_expr}) AS n_nulls,
           COUNT(DISTINCT {sql_expr}) AS n_distinct,
           MIN({sql_expr}) AS min_value,
           MAX({sql_expr}) AS max_value
    FROM {table}"""
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY column_name"


def _profile(spark: SparkSession, sf_dir: str, table: str,
             cols: list[tuple[str, str]]) -> DataFrame:
    """Single-pass per-column profile, unpivot-FIRST (shared by
    q_profile_table / q_profile_supplier): render every column, stack
    the table to (column_name, value) rows, then one grouped
    aggregate per column name computes rows/nulls/exact-distinct/
    min/max.

    Why unpivot-first instead of the previous wide-aggregate + stack
    (round 14): N countDistincts in one global aggregate plan an
    EXPAND — the same |cols|× row inflation — but its dedup exchange
    is planner-internal, carries mostly-null expanded rows that look
    byte-tiny to AQE, and got coalesced to ~one read (measured 37.9 s
    vs 22.2 s wide at sf1.0 — the SCALING §Round-14 width-pin class,
    unreachable by any DataFrame-level pin in the old shape).

    Round 15 (ADVICE): the first unpivot-first cut shuffled the FULL
    stacked table (|cols| × rows rendered strings) through an explicit
    repartition with no map-side reduction. Now the stacked rows go
    through a partial-count groupBy(column_name, value) FIRST — the
    map-side combine dedupes to distinct (col, value) pairs per task
    before the exchange, so shuffle bytes are O(distinct pairs) again
    (the wide shape's only virtue) while keeping the Expand-free plan.
    The per-pair counts make every downstream stat exact: n_rows =
    Σcnt, n_nulls = Σcnt where value IS NULL, n_distinct = count of
    non-null pair rows, min/max unchanged. Post-shuffle work here is
    bytes-proportional (pure JVM hash agg — no Python, no row
    inflation), so AQE byte-based coalescing of this exchange is
    CORRECT sizing, not the round-14 pathology; no width pin needed.
    Still one scan at 100 TB."""
    t = load_table(spark, sf_dir, table)
    rendered = t.select(
        *[F.expr(expr).alias(name) for name, expr in cols]
    )
    stack_args = ", ".join(f"'{name}', `{name}`" for name, _ in cols)
    unp = rendered.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, value)"
        )
    )
    pairs = unp.groupBy("column_name", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        pairs.groupBy("column_name")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.sum(
                F.when(F.col("value").isNull(), F.col("cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("n_nulls"),
            F.count("value").alias("n_distinct"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("column_name")
    )


@register("q_profile_table", oracle=_profile_oracle("orders", _PROFILE_COLS))
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile over `orders`: row count, NULL count,
    exact distinct count, and lexicographic min/max of the rendered
    value — the new-drop audit that catches schema drift, key
    collapse, and truncated loads before any downstream query does.

    Plan: ONE pass over the table computes every column's statistics
    as a single wide aggregate row (count/count-distinct per column,
    min/max over the rendered strings); the per-column layout is then
    an unpivot (`stack`) of that one row — at 100 TB this is a single
    scan + one multi-distinct aggregation, not |columns| passes. The
    rendering rule is shared with the oracle: money as exact integer
    cents, dates as ISO strings, ids as digit strings — so min/max
    compare lexicographically the same way on both engines (digit
    strings of like magnitude; the profile is about drift detection,
    not numeric ordering)."""
    return _profile(spark, sf_dir, "orders", _PROFILE_COLS)


@register(
    "q_profile_supplier",
    oracle=_profile_oracle("supplier", _SUPPLIER_PROFILE_COLS),
)
def q_profile_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same single-pass profiler over `supplier` — proving the
    operator is a reusable audit (one spec list per table), and
    exercising the signed-money rendering path: s_acctbal goes
    negative, and the rendered cents string keeps its sign so both
    engines compare identical strings."""
    return _profile(spark, sf_dir, "supplier", _SUPPLIER_PROFILE_COLS)


# Ordered blocklist: first matching rule wins (priority = list order).
# Terms are chosen from the synthetic corpus vocabulary so the filter
# exercises real matches; a production list would load from config.
_SAFETY_RULES = [
    ("r1_error_content", "error"),
    ("r2_slow_content", "slow"),
    ("r3_drop_content", "drop"),
]


def _safety_case_sql() -> str:
    whens = "\n".join(
        f"        WHEN text LIKE '%{term}%' THEN '{rule}'"
        for rule, term in _SAFETY_RULES
    )
    return f"CASE\n{whens}\n        ELSE 'pass' END"


@register(
    "q_llm_safety_filter",
    oracle=f"""
    WITH flagged AS (
        SELECT lang,
               {_safety_case_sql()} AS verdict,
               n_chars
        FROM documents
    )
    SELECT verdict, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM flagged
    GROUP BY verdict, lang
    ORDER BY verdict, lang
    """,
)
def q_llm_safety_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-attributed content filter: every document gets the FIRST
    matching blocklist rule (priority-ordered) or 'pass', reported as
    per-(rule, lang) document and character counts — the quarantine
    accounting step of a corpus-cleaning pipeline, where "what did we
    drop and why" must be auditable.

    Plan: the rule cascade is one CASE expression evaluated in
    whole-stage codegen during the scan (substring LIKE — no regex
    backtracking, no Python), followed by one map-side-combined
    aggregation to |rules|×|langs| rows. At 100 TB: a single narrow
    shuffle of partials; rule priority is total and explicit, so the
    verdict is deterministic however the data is partitioned. The
    production variant swaps the literal list for a broadcast config
    table feeding the same cascade."""
    d = load_table(spark, sf_dir, "documents")
    expr = None
    for rule, term in _SAFETY_RULES:
        cond = F.col("text").contains(term)
        expr = (
            F.when(cond, F.lit(rule))
            if expr is None
            else expr.when(cond, F.lit(rule))
        )
    verdict = expr.otherwise(F.lit("pass"))
    return (
        d.select("lang", verdict.alias("verdict"), "n_chars")
        .groupBy("verdict", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("verdict", "lang")
    )


_DP_N = 1048576  # 2^20 uniform grid for the inverse-CDF draw


@register(
    "q_llm_dp_histogram",
    oracle=f"""
    WITH g AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE source IS NOT NULL AND n_chars IS NOT NULL
        GROUP BY 1
    ),
    noise AS (
        SELECT source, n_docs, sum_chars,
               ('0x' || substr(md5('dp:' || source || ':docs'), 1, 15))
                   ::BIGINT AS h_docs,
               ('0x' || substr(md5('dp:' || source || ':chars'), 1, 15))
                   ::BIGINT AS h_chars
        FROM g
    ),
    drawn AS (
        SELECT source, n_docs, sum_chars,
               (CASE WHEN (h_docs // {_DP_N}) % 2 = 0 THEN 1 ELSE -1 END)
               * (CAST(floor(ln({_DP_N}) * 1000000 + 0.5) AS BIGINT)
                  - CAST(floor(ln(CAST(h_docs % {_DP_N} + 1 AS DOUBLE))
                        * 1000000 + 0.5) AS BIGINT)) AS noise_docs_e6,
               (CASE WHEN (h_chars // {_DP_N}) % 2 = 0 THEN 1 ELSE -1 END)
               * (CAST(floor(ln({_DP_N}) * 1000000 + 0.5) AS BIGINT)
                  - CAST(floor(ln(CAST(h_chars % {_DP_N} + 1 AS DOUBLE))
                        * 1000000 + 0.5) AS BIGINT)) AS noise_chars_e6
        FROM noise
    )
    SELECT source, n_docs,
           greatest(CAST(0 AS BIGINT), n_docs * 1000000 + noise_docs_e6)
               AS noisy_docs_e6,
           sum_chars,
           greatest(CAST(0 AS BIGINT),
                    sum_chars * 1000000 + noise_chars_e6)
               AS noisy_chars_e6,
           CAST(1000000 AS BIGINT) AS epsilon_e6
    FROM drawn
    ORDER BY source
    """,
)
def q_llm_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism histogram release: per-source document and
    character counts with Laplace(1/ε) noise, ε = 1 — the
    differential-privacy release shape for publishing corpus
    composition in a dataset card. The ε-DP calibration claim applies
    to the DOC-COUNT cell only: COUNT(*) is a sensitivity-1 query, so
    Laplace(1/ε) gives ε-DP for that cell. The sum_chars cell has
    sensitivity max(n_chars) (one document can move the sum by its
    whole length), so its identically-scaled noise is NOT ε-DP-
    calibrated — a production release would clamp n_chars to a cap C
    and scale the noise by C. And the exact n_docs/sum_chars columns
    ride along beside the noisy ones because this is a differential-
    testing fixture (both engines must agree on the pre-noise values),
    not a privacy release — no privacy property holds for the row as
    emitted. Noise is drawn by inverse CDF from the md5-derived
    uniform: |X| = −(1/ε)·ln(u/N) = (L(N) − L(u))/1e6 with u uniform
    on [1, 2^20] and the sign a further hash bit — every ln is of an
    EXACT INTEGER and pinned to floor(ln·1e6 + 0.5) (the survival_km /
    chisq single-double discipline), so the draw is bit-identical
    across engines and the mechanism itself is oracle-checked.

    Honesty note (in lieu of a security claim): a hash-seeded draw is
    REPRODUCIBLE noise — the right property for a differential-testing
    fixture, the wrong one for production privacy, where the uniform
    must come from a secret RNG. The operator's value is the
    distributed mechanism shape: noise is a per-GROUP scalar
    projection after the aggregate, so the DP release costs nothing
    beyond the count query itself at any corpus size.

    Plan: one map-combined groupBy(source) — the only corpus exchange —
    then constant-width arithmetic on the ≤ |sources| result rows."""
    g = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull() & F.col("n_chars").isNotNull())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )

    def _h(metric: str) -> str:
        return (
            f"CAST(conv(substr(md5(concat('dp:', source, ':{metric}')),"
            " 1, 15), 16, 10) AS BIGINT)"
        )

    def _noise(h: str) -> str:
        return (
            f"(CASE WHEN ({h} DIV {_DP_N}) % 2 = 0 THEN 1 ELSE -1 END)"
            f" * (CAST(floor(ln({_DP_N}) * 1000000 + 0.5) AS BIGINT)"
            f" - CAST(floor(ln(CAST({h} % {_DP_N} + 1 AS DOUBLE))"
            " * 1000000 + 0.5) AS BIGINT))"
        )

    return g.select(
        "source",
        "n_docs",
        F.expr(
            "greatest(CAST(0 AS BIGINT),"
            f" n_docs * 1000000 + {_noise(_h('docs'))})"
        ).alias("noisy_docs_e6"),
        "sum_chars",
        F.expr(
            "greatest(CAST(0 AS BIGINT),"
            f" sum_chars * 1000000 + {_noise(_h('chars'))})"
        ).alias("noisy_chars_e6"),
        F.lit(1000000).cast("bigint").alias("epsilon_e6"),
    ).orderBy("source")

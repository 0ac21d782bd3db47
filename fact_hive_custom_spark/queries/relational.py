"""Projection / filter / predicate operators (SURVEY.md §2.2.B).

Everything here is a narrow transformation — no shuffle. Catalyst
collapses adjacent projects/filters, pushes predicates into the
Parquet scan, and runs the whole pipeline inside one
WholeStageCodegen span, so these cost one pass over the pruned
columns at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fact_hive_custom_spark.queries.registry import register
from fact_hive_custom_spark.tables import load_table


@register(
    "q_project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic projection with alias — row-level revenue."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
    )


@register(
    "q_filter_cmp",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity > 45 AND l_discount <= 0.02 AND l_linenumber <> 1
      AND l_extendedprice >= 1000 AND l_tax < 0.08
    """,
)
def q_filter_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunction of <, <=, >, >=, <> comparison predicates."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45)
        & (F.col("l_discount") <= 0.02)
        & (F.col("l_linenumber") != 1)
        & (F.col("l_extendedprice") >= 1000)
        & (F.col("l_tax") < 0.08)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "q_filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@register(
    "q_filter_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
    """,
)
def q_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN predicate (inclusive both ends)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(10, 20))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "q_filter_like",
    oracle="""
    SELECT p_partkey, p_type
    FROM part
    WHERE p_type LIKE '%BRASS%' OR p_type LIKE 'SMALL%'
    """,
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern predicates (contains + prefix)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_type").like("%BRASS%") | F.col("p_type").like("SMALL%")).select(
        "p_partkey", "p_type"
    )


@register(
    "q_filter_rlike",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE regexp_matches(c_name, '[048]$')
    """,
)
def q_filter_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate (RE2-compatible pattern per SURVEY.md §7.4.3)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_name").rlike("[048]$"))
        .select("c_custkey", "c_name")
    )


@register(
    "q_filter_null",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_discount, 0.0) AS disc_or_null,
           (NULLIF(l_discount, 0.0) IS NULL) AS is_free,
           (NULLIF(l_discount, 0.0) IS NOT DISTINCT FROM NULLIF(l_tax, 0.0)) AS null_safe_eq
    FROM lineitem
    WHERE l_quantity < 3
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: NULLIF-generated nulls, IS NULL, null-safe equality (<=>)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 3)
    disc = F.nullif(F.col("l_discount"), F.lit(0.0))
    tax = F.nullif(F.col("l_tax"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("disc_or_null"),
        disc.isNull().alias("is_free"),
        disc.eqNullSafe(tax).alias("null_safe_eq"),
    )


@register(
    "q_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS price_band
    FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN conditional projection (price bands)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
        .alias("price_band"),
    )


@register(
    "q_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice AS DECIMAL(12,2)) AS price_dec,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(SUBSTR(CAST(o_orderkey AS VARCHAR), 1, 1) AS INTEGER) AS first_digit
    FROM orders
    """,
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts: double→decimal(12,2), int↔string, timestamp→date."""
    o = load_table(spark, sf_dir, "orders")
    key_str = F.col("o_orderkey").cast("string")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price_dec"),
        key_str.alias("key_str"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.substring(key_str, 1, 1).cast("int").alias("first_digit"),
    )


@register(
    "q_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (hash-aggregate underneath; partial+final at scale)."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()

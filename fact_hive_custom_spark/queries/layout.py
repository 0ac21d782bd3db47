"""Data-layout & table-lifecycle operators: snapshot diffing,
Z-order clustering keys, deterministic dataset sharding.

These are the table-maintenance operations a 100 TB lakehouse needs
around the query engine proper: detecting what changed between two
snapshots of a table (CDC without a log), computing multi-dimensional
clustering keys so correlated predicates prune files, and carving a
corpus into balanced, reproducible training shards.

The reference (`/root/reference/fact-hive/h-run.sh:1-106`) contains no
table lifecycle at all — charter-derived capability (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fact_hive_custom_spark.queries.registry import register
from fact_hive_custom_spark.tables import load_table


# ---------------------------------------------------------------------------
# Snapshot diff
# ---------------------------------------------------------------------------

@register(
    "q_snapshot_diff",
    oracle="""
    WITH old_snap AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders WHERE o_orderkey % 97 <> 0
    ),
    new_snap AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT)
                   + CASE WHEN o_orderkey % 7 = 0 THEN 500 ELSE 0 END
                   AS price_cents
        FROM orders WHERE o_orderkey % 89 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           o.price_cents AS old_price_cents,
           n.price_cents AS new_price_cents
    FROM old_snap o FULL OUTER JOIN new_snap n
        ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.price_cents IS DISTINCT FROM n.price_cents
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC without a changelog): classify every key as
    added / removed / changed between two table snapshots via one
    full-outer join, emitting only the differing rows.

    The two snapshots are derived deterministically from `orders`
    (old drops keys ≡0 mod 97, new drops ≡0 mod 89 and bumps prices
    on keys ≡0 mod 7 by 500 cents) so both engines diff identical
    inputs. Prices compare in exact integer cents.

    Scale: one shuffle on the join key for each side — the same cost
    as any fact⋈fact equi-join; AQE handles skew. At 100 TB you would
    additionally partition both snapshots identically at rest
    (bucketBy, cf. q_join_bucketed) to make the nightly diff
    exchange-free. Output is proportional to the churn, not the table.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    # explicit presence markers: a NULL price must not masquerade as a
    # missing ROW (a NULL-totalprice drift row taught us the
    # difference), and prices compare null-safely — NULL==NULL is
    # "unchanged", NULL vs value is "changed"
    old_snap = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            cents.alias("price_cents"),
            F.lit(1).alias("in_old"),
        )
    )
    new_snap = (
        o.filter(F.col("o_orderkey") % 89 != 0)
        .select(
            "o_orderkey",
            (
                cents
                + F.when(F.col("o_orderkey") % 7 == 0, F.lit(500)).otherwise(0)
            ).alias("price_cents"),
            F.lit(1).alias("in_new"),
        )
    )
    joined = old_snap.alias("o").join(
        new_snap.alias("n"), on="o_orderkey", how="full_outer"
    )
    old_pc = F.col("o.price_cents")
    new_pc = F.col("n.price_cents")
    in_old = F.col("o.in_old")
    in_new = F.col("n.in_new")
    return (
        joined.select(
            "o_orderkey",
            F.when(in_old.isNull(), "added")
            .when(in_new.isNull(), "removed")
            .otherwise("changed")
            .alias("change"),
            old_pc.alias("old_price_cents"),
            new_pc.alias("new_price_cents"),
            in_old,
            in_new,
        )
        .filter(
            in_old.isNull() | in_new.isNull() | ~old_pc.eqNullSafe(new_pc)
        )
        .drop("in_old", "in_new")
    )


# ---------------------------------------------------------------------------
# Z-order clustering key
# ---------------------------------------------------------------------------

def _interleave_sql(xcol: str, ycol: str, bits: int = 4, idiv: str = "//") -> str:
    """SQL expression interleaving the low `bits` bits of two ints:
    x contributes odd bit positions, y even — the Morton (Z-order)
    code, written as integer div/mod arithmetic (no engine-specific
    bit intrinsics). Only the integer-division spelling differs per
    engine (`//` DuckDB, `div` Spark) — pass it via `idiv`. Operands
    are non-negative here, so floor- and truncating-division agree."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol}) {idiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((({ycol}) {idiv} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


@register(
    "q_zorder_key",
    oracle=f"""
    WITH dims AS (
        SELECT o_orderkey,
               CAST(o_custkey % 16 AS BIGINT) AS dx,
               CAST(o_orderkey % 16 AS BIGINT) AS dy
        FROM orders
    )
    SELECT CAST({_interleave_sql('dx', 'dy')} AS BIGINT) AS z_key,
           COUNT(*) AS n_rows,
           MIN(dx) AS min_dx, MAX(dx) AS max_dx,
           MIN(dy) AS min_dy, MAX(dy) AS max_dy
    FROM dims
    GROUP BY 1
    """,
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key: interleave the bits of two
    dimension columns so that sorting by the single z_key co-locates
    rows that are close in BOTH dimensions — the standard lakehouse
    layout trick (Delta/Iceberg `ZORDER BY`) that lets min/max file
    stats prune scans for predicates on either dimension.

    The per-z-key min/max of each dimension in the output IS the
    file-skipping evidence: every z bucket spans exactly one (dx, dy)
    cell, so a filter on either dim touches at most 16 of 256 buckets.

    The interleave is plain integer div/mod arithmetic (no bit
    intrinsics) so both engines fold it in codegen; Spark evaluates it
    entirely inside WholeStageCodegen with one exchange for the final
    groupBy. At 100 TB the same expression feeds
    `df.repartitionByRange(F.col("z_key")).sortWithinPartitions(...)`
    before the parquet write — the compute cost is a map-side scan.
    """
    o = load_table(spark, sf_dir, "orders")
    dims = o.select(
        (F.col("o_custkey") % 16).cast("bigint").alias("dx"),
        (F.col("o_orderkey") % 16).cast("bigint").alias("dy"),
    )
    z = (
        F.expr(_interleave_sql("dx", "dy", idiv="div"))
        .cast("bigint")
        .alias("z_key")
    )
    return (
        dims.select(z, "dx", "dy")
        .groupBy("z_key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("dx").alias("min_dx"),
            F.max("dx").alias("max_dx"),
            F.min("dy").alias("min_dy"),
            F.max("dy").alias("max_dy"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic dataset sharding
# ---------------------------------------------------------------------------

_N_SHARDS = 16


@register(
    "q_dataset_shard",
    oracle=f"""
    WITH sharded AS (
        SELECT doc_id, n_chars,
               CAST((ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
                     + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)))
                    % {_N_SHARDS} AS BIGINT) AS shard
        FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM sharded
    GROUP BY shard
    """,
)
def q_dataset_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment: each document is
    mapped to one of 16 shards by the first two hex chars of
    md5(doc_id) — reproducible across engines, runs, and cluster
    sizes (unlike hash()/spark_partition_id(), which are
    engine-/layout-dependent). The output is the shard manifest:
    per-shard doc count, byte mass, and id range — the balance report
    a training-data pipeline checks before writing shards.

    md5 is uniform, so shard sizes concentrate tightly around n/16
    regardless of doc_id distribution — no hot shard at 100 TB. The
    same expression feeds `df.write.partitionBy("shard")` for the
    actual shard write (cf. q_sink_partitioned); this query is the
    map-side scan + one groupBy(shard) with partial aggregation.
    """
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = (
        (F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1)))
        % _N_SHARDS
    ).cast("bigint")
    return (
        d.select(shard.alias("shard"), "doc_id", "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )

"""Catalog statistics for the cost-based optimizer (SURVEY.md §4).

CBO join reordering needs table + column statistics in the catalog;
`register_with_stats` is the one-call path: save a parquet table as a
managed catalog table and run ANALYZE TABLE ... COMPUTE STATISTICS FOR
ALL COLUMNS over it. On a production metastore the ANALYZE runs once
per load, not per query — here it is per-call so every entry point is
self-contained and idempotent.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from fact_hive_custom_spark.tables import load_table


def register_with_stats(
    spark: SparkSession, sf_dir: str, tables: list[str], prefix: str = "fhcs_cbo_"
) -> dict[str, str]:
    """Save each table as a managed catalog table with full statistics.

    Returns {logical_name: catalog_name}. Drops any stale table (and its
    leftover warehouse dir — the in-memory catalog forgets tables across
    sessions but the warehouse dir persists, see q_sink_table).
    """
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    names: dict[str, str] = {}
    for t in tables:
        name = f"{prefix}{t}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(
            os.path.join(warehouse.removeprefix("file:"), name), ignore_errors=True
        )
        load_table(spark, sf_dir, t).write.mode("overwrite").saveAsTable(name)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")
        names[t] = name
    return names

"""Format round-trip plumbing shared by the §A source/sink queries.

Staging lives under the system temp dir (never the repo), writes are
mode=overwrite so every entry point is idempotent under driver
re-runs, and re-reads always pass the original explicit schema —
schema inference is banned on the read side (nondeterministic typing
on CSV/JSON, and a full extra pass over the data at scale).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_STAGE_ROOT = os.path.join(tempfile.gettempdir(), "fact_hive_custom_spark_stage")


def stage_dir(name: str) -> str:
    """A per-purpose staging directory under /tmp."""
    os.makedirs(_STAGE_ROOT, exist_ok=True)
    return os.path.join(_STAGE_ROOT, name)


def round_trip(spark: SparkSession, df: DataFrame, fmt: str, name: str, **options) -> DataFrame:
    """Write `df` in `fmt`, read it back with the original schema.

    Returns the re-read DataFrame; content equality against the source
    is the oracle's job (queries/sources_sinks.py).
    """
    path = stage_dir(name)
    df.write.mode("overwrite").options(**options).format(fmt).save(path)
    reader = spark.read.options(**options)
    if fmt != "orc":  # ORC embeds exact types; CSV/JSON need the schema
        reader = reader.schema(df.schema)
    return reader.format(fmt).load(path)

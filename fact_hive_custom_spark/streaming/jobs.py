"""Structured Streaming plumbing (SURVEY.md §2.2.G).

Pattern: every streaming operator is a normal DataFrame transformation
applied to a `readStream` source; for the correctness gate we drive
the stream synchronously to completion with Trigger.AvailableNow into
a memory sink and hand back the settled table — the batch-mode oracle
then checks the same semantics. Late-data / watermark behavior (which
batch mode cannot express) is exercised in tests/test_streaming.py
with explicitly injected late rows.

In production the same code points at a directory of arriving files
(or Kafka) with a continuous trigger + checkpointLocation; state lives
in executor state stores.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Streaming readers need an explicit schema; the fixture's ts encoding
# has varied across driver versions (int64 nanos vs parquet
# timestamp[us] → TIMESTAMP_NTZ), so the schema is built around a
# footer probe instead of a hardcoded type — mirroring
# tables.load_table's adaptive batch read.


def events_raw_schema(ts_dtype: T.DataType) -> T.StructType:
    """events schema with `ts` in the fixture's physical encoding."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_dtype, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


def events_ts_dtype(spark: SparkSession, sf_dir: str) -> T.DataType:
    """Probe how the fixture encodes events.ts (parquet footer only)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return df.schema["ts"].dataType


def streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet, normalized like the batch read."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # see tables.load_table
    ts_dtype = events_ts_dtype(spark, sf_dir)
    raw = (
        spark.readStream.schema(events_raw_schema(ts_dtype))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(ts_dtype, T.LongType):
        # Integer division (`div`) — double division loses µs precision
        # on int64 nanos (> 2^53); see tables.load_table.
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def run_stream_to_memory(
    spark: SparkSession,
    streaming_df: DataFrame,
    name: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drive a streaming DataFrame to completion (AvailableNow) into a
    memory sink; return the settled result as a batch DataFrame."""
    table = f"{name}_{uuid.uuid4().hex[:8]}"
    checkpoint = os.path.join(
        tempfile.gettempdir(), "fact_hive_custom_spark_ckpt", table
    )
    q = (
        streaming_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(table)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)


def run_stream_foreach_batch_parquet(
    spark: SparkSession, streaming_df: DataFrame, out_dir: str
) -> None:
    """foreachBatch sink: append each micro-batch to a parquet dir —
    the exactly-once-with-idempotent-writes production pattern."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    checkpoint = os.path.join(
        tempfile.gettempdir(), "fact_hive_custom_spark_ckpt", f"feb_{uuid.uuid4().hex[:8]}"
    )
    q = (
        streaming_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

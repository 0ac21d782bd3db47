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

# The events parquet is nanosecond-timestamped; streaming readers need
# an explicit schema, so ts arrives as long-nanos and is rebuilt to a
# µs timestamp exactly like tables.load_table does for batch.
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # nanos since epoch
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the batch-identical schema."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # see tables.load_table
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Integer division (`div`) — double division loses µs precision on
    # int64 nanos (> 2^53); see tables.load_table.
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


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

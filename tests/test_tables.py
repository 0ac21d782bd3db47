"""Fixture-ingestion contract: events.ts must normalize to the SAME
UTC TimestampType column regardless of the parquet encoding the driver
ships (int64 nanos in early rounds, timestamp[us] since round 4 —
the round-3 CORRECTNESS gate went red on exactly this drift)."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fact_hive_custom_spark.streaming.jobs import events_ts_dtype, streaming_events
from fact_hive_custom_spark.tables import load_table

_BASE_US = [1_706_600_000_000_000, 1_706_600_001_500_000]


def _write_events(dirpath, unit: str) -> str:
    vals = _BASE_US if unit == "us" else [v * 1000 for v in _BASE_US]
    table = pa.table(
        {
            "event_id": pa.array([0, 1], pa.int64()),
            "ts": pa.array(vals, pa.timestamp(unit)),
            "user_id": pa.array([7, 8], pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, str(dirpath / "events.parquet"), version="2.6")
    return str(dirpath)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_table_normalizes_any_ts_encoding(spark, tmp_path, unit):
    d = tmp_path / f"enc_{unit}"
    d.mkdir()
    df = load_table(spark, _write_events(d, unit), "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = [r.ts for r in df.orderBy("event_id").collect()]
    assert got == [
        datetime.datetime(2024, 1, 30, 7, 33, 20),
        datetime.datetime(2024, 1, 30, 7, 33, 21, 500000),
    ]


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_streaming_reader_matches_batch_normalization(spark, tmp_path, unit):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    d = tmp_path / f"senc_{unit}"
    d.mkdir()
    sf_dir = _write_events(d, unit)
    probed = events_ts_dtype(spark, sf_dir)
    expected = T.LongType() if unit == "ns" else T.TimestampNTZType()
    assert probed == expected

    from fact_hive_custom_spark.streaming.jobs import run_stream_to_memory

    agg = streaming_events(spark, sf_dir).agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    )
    out = run_stream_to_memory(spark, agg, f"ts_enc_{unit}", "complete").collect()
    assert out[0].lo == datetime.datetime(2024, 1, 30, 7, 33, 20)
    assert out[0].hi == datetime.datetime(2024, 1, 30, 7, 33, 21, 500000)

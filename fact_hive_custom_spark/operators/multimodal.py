"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.2.I).

Raw media rides in DataFrames as an opaque `BinaryType` column next to
typed metadata (the same pattern the `embeddings.embedding` array uses
for vectors). Decode / feature-extraction runs as Arrow-batched
`mapInPandas` so bytes move JVM↔Python once per batch, not per row,
and each task only ever holds one batch of media in memory — the shape
that scales to 100 TB of media shards.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this environment, so
`decode_image_batch` is a clearly-marked deterministic stub — the
Spark-side contract (schema, batching, partitioning) is real and
tested in tests/test_operators.py.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata carried beside the opaque payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, payload_hash long, feature array<float>"
)


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder.

    Real deployments replace this body with PIL/torchvision/librosa;
    everything around it (Arrow batching, schema, partitioning) is the
    production path. NOT a real decode — see module docstring.
    """
    if payload is None:
        return []
    # 8 pseudo-features from byte statistics — stable across runs.
    n = len(payload)
    if n == 0:
        return [0.0] * 8
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 997),
        float(max(payload)),
        float(min(payload)),
        float(payload[n // 2]),
        float(n % 251),
    ]


def extract_features(
    media: DataFrame,
    decode: Callable[[bytes | None], list[float]] | None = None,
) -> DataFrame:
    """media frame (MEDIA_SCHEMA) → per-item feature vectors.

    `mapInPandas`: each Arrow batch of payloads is decoded in one
    Python call; output carries a payload hash so downstream exact
    dedup of media works without re-shipping bytes.

    `decode` is the pluggable decoder seam: a picklable callable
    `bytes | None -> list[float]` shipped to executors inside the UDF
    closure (e.g. a module-level function wrapping PIL/librosa).
    Defaults to the deterministic stub — production injects its real
    decoder here instead of editing this operator.
    """
    if decode is None:
        decode = _fake_decode

    # payload_hash is ALWAYS the JVM xxhash64 (it's a column op anyway):
    # a Python-side hash library would make the dedup key depend on what
    # happens to be importable on each executor — same media, different
    # keys. The JVM hash is one codegen expression, environment-free.
    hashed = media.withColumn("payload_hash", F.xxhash64(F.col("payload")))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "payload_hash": pdf["payload_hash"],
                    "feature": pdf["payload"].map(decode),
                }
            )

    return hashed.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (the decode itself is the stub above). Pure Spark:
    sequence + explode, no Python."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ),
        )
        .select("media_id", "frame_ms", "payload")
    )

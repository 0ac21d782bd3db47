"""Reusable composite operators the engine adds on top of stock Spark.

Each operator here is something Spark lacks as a single primitive
(as-of join, LSH dedup, ANN search, MERGE, media decode) expressed as
a composition of declarative DataFrame ops, so Catalyst still owns the
physical plan.
"""

from fact_hive_custom_spark.operators.asof import asof_join_backward
from fact_hive_custom_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_pairs,
    shingles,
    simhash_64,
)
from fact_hive_custom_spark.operators.graph import connected_components
from fact_hive_custom_spark.operators.merge import cdc_latest, scd2_close, upsert
from fact_hive_custom_spark.operators.multimodal import extract_features, sample_frames
from fact_hive_custom_spark.operators.similarity import cosine, cosine_topk, signlsh_topk
from fact_hive_custom_spark.operators.skew import salted_aggregate, salted_join

__all__ = [
    "asof_join_backward",
    "shingles",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_64",
    "connected_components",
    "upsert",
    "scd2_close",
    "cdc_latest",
    "extract_features",
    "sample_frames",
    "cosine",
    "cosine_topk",
    "signlsh_topk",
    "salted_join",
    "salted_aggregate",
]

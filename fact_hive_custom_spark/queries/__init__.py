"""Query modules — importing this package populates the registry."""

from fact_hive_custom_spark.queries import (  # noqa: F401
    aggregates,
    analytics,
    clustering,
    corpus,
    exact_tests,
    inequality,
    ir_metrics,
    joins,
    layout,
    llm_ops,
    llm_text,
    media,
    misc,
    ml_eval,
    optimizer,
    profiling,
    relational,
    reshape,
    scalar_functions,
    scans,
    sources_sinks,
    stats,
    streaming_queries,
    timeseries,
    tpch_more,
    udfs,
    windows,
)
from fact_hive_custom_spark.queries.registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]

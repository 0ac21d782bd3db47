"""Source/sink helpers (SURVEY.md §2.2.A)."""

from fact_hive_custom_spark.sources.io import round_trip, stage_dir

__all__ = ["stage_dir", "round_trip"]

"""fact_hive_custom_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capability surface
charted in SURVEY.md for Xefier/FACT-Hive-Custom (the reference repo at
/root/reference is a HiveOS miner wrapper with no query semantics —
see SURVEY.md §0 — so the surface is charter-derived: Spark SQL /
DataFrame relational algebra + LLM-data-pipeline operators, designed
for 100 TB scale).

Architecture: declarative-first. Every operator is expressed with the
DataFrame / Spark SQL API so Catalyst + Tungsten own the physical
strategy (predicate pushdown, column pruning, whole-stage codegen,
AQE). Python touches the data path only through Arrow-batched Pandas
UDFs, and only where built-ins cannot express the semantics.
"""

from fact_hive_custom_spark.session import get_session
from fact_hive_custom_spark.tables import TABLES, load_table, register_views

__all__ = ["get_session", "TABLES", "load_table", "register_views"]

__version__ = "0.1.0"

"""Reusable composite operators the engine adds on top of stock Spark.

Each operator here is something Spark lacks as a single primitive
(as-of join, range join, LSH dedup, ANN search) expressed as a
composition of declarative DataFrame ops, so Catalyst still owns the
physical plan.
"""

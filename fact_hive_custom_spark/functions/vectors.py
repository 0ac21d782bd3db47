"""Vector column expressions over array<numeric>.

Higher-order functions only (zip_with + aggregate fold): the math runs
inside whole-stage codegen — no UDF, no Python, no ML-lib vector
boxing. The fold is left-to-right, which matches sequential oracles
bit-for-bit (matters for 6-dp rounding parity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """Euclidean norm ‖a‖₂."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity. For pairwise scoring at scale, precompute
    `norm()` per row before the pair join (see operators/similarity.py)
    so each pair costs one dot product, not three."""
    return dot(a, b) / (norm(a) * norm(b))

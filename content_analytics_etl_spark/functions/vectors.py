"""Vector math over ``array<float>`` embedding columns.

Built-in higher-order functions only (``zip_with`` + ``aggregate`` fold):
JVM-side, no Python crossing, and the left-to-right fold makes the double
accumulation bit-deterministic — the same value every run and the same
value DuckDB's sequential list_sum produces (verified). A Pandas-UDF
batch-matmul variant exists in ``operators/similarity.py`` for the
throughput path; it is NOT bit-identical (BLAS reassociates), so the
oracle-checked queries use these.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["to_double_array", "dot_product", "l2_norm", "cosine_similarity"]


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))

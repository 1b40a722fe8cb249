"""Vector math over `array<float>` columns — pure builtin expressions.

Everything here compiles to Catalyst higher-order functions (zip_with /
aggregate / transform) → JVM-side codegen, no Python in the hot path.
Accumulation is left-to-right, matching DuckDB's list_sum order, so oracle
comparisons are bit-stable after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product: zip_with multiply + left-to-right aggregate sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns."""
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))

"""Vector (embedding) column builders — JVM-side array math.

Embeddings are ``array<float>`` columns; all math casts to double and
stays in Catalyst higher-order functions (``zip_with`` + ``aggregate``)
— no Python in the distance hot path, so brute-force scoring runs in
whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    """array<float> → array<double> (one widening cast per element)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + left-fold aggregate.

    DuckDB oracle equivalent: positional unnest + SUM of products
    (64-element fold: cross-engine drift < 1e-12, rounded downstream).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pre(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with precomputed norms — bitwise-identical to
    :func:`cosine` (same fold, same operation order) but evaluates
    each vector's norm ONCE per row instead of once per pair: in a
    k-candidate scorer that's 2k norm folds saved per row."""
    return dot(a, b) / (norm_a * norm_b)

"""Helpers that make double-typed aggregates bitwise-reproducible
across engines (Spark vs the DuckDB oracle) and across partitionings.

Floating-point summation is order-dependent; at sf0.1 a 600k-row
double sum can differ between engines by ~1e-4 — enough to break a
value-hash at any rounding. The fix: the test data's money-like
columns are exact 2-decimal values, so casting to DECIMAL before
SUM turns the aggregation into exact integer arithmetic (identical in
every engine and under every partitioning), and the final
decimal→double cast is a single correctly-rounded conversion, also
identical. AVG is expressed as exact-sum / count in double (one
deterministic division).

This also matters at 100 TB: a result that changes with partition
count is untestable; these helpers pin it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Deterministic SUM of a money-like double column.

    Oracle-side equivalent: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Deterministic AVG: exact decimal sum divided by count, in double.

    Oracle: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x)``.
    """
    col = F.col(col) if isinstance(col, str) else col
    return dsum(col, scale, precision) / F.count(col)


def oracle_dsum(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB SQL text matching :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB SQL text matching :func:`davg`."""
    return f"({oracle_dsum(expr, scale, precision)} / COUNT({expr}))"

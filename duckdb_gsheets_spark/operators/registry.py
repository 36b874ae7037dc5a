"""Registry of engine queries and their DuckDB oracle SQL.

Every operator the engine claims (SURVEY.md §2) registers here as a
``QueryDef``: a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
plus, when the semantics are ANSI-SQL-expressible, the equivalent
DuckDB SQL the driver runs side-by-side as the correctness oracle.

Determinism contract (this is what makes cross-engine value-hashing
work — see operators/determinism.py):

* Aggregates over doubles go through scaled-long casts so the sum is
  exact integer arithmetic in both engines, then one correctly-rounded
  conversion back to double (bitwise identical).
* Per-row double expressions are written with the same operation order
  on both sides (IEEE 754 is deterministic given identical inputs).
* Every LIMIT/top-k is preceded by a total order with a unique-key
  tiebreak.
* Temporal outputs are cast to strings with identical formatting.
* Column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    """One engine query: Spark builder + optional DuckDB oracle SQL."""

    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    description: str = ""


def all_queries() -> dict[str, QueryDef]:
    """Collect every registered query across operator modules."""
    from duckdb_gsheets_spark.operators import (
        dedup,
        events,
        multimodal,
        pipeline,
        relational,
        similarity,
        skew,
        text,
        tpch_extra,
        udtf_ops,
        windows,
    )

    merged: dict[str, QueryDef] = {}
    for module in (
        relational,
        tpch_extra,
        windows,
        events,
        dedup,
        similarity,
        text,
        multimodal,
        pipeline,
        skew,
        udtf_ops,
    ):
        for qd in module.QUERIES:
            if qd.name in merged:
                raise ValueError(f"duplicate query name {qd.name!r}")
            merged[qd.name] = qd
    return merged

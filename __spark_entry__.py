"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (TPC-H Q1-style pricing summary) at
sf0.001; ``queries``/``oracle_sql`` expose the full operator battery
from duckdb_gsheets_spark.operators (SURVEY.md §2) with DuckDB oracle
SQL wherever the semantics are ANSI-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from duckdb_gsheets_spark.operators import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = all_queries()
    return qs["q1_pricing_summary"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.spark_fn for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {
        name: qd.oracle for name, qd in all_queries().items() if qd.oracle is not None
    }

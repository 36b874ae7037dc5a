"""Bucketed-table layout for shuffle-free repeated joins.

At 100 TB the biggest recurring cost is re-shuffling the same fact
table on the same key for every join. Spark's answer is BUCKETING:
write the table hash-partitioned AND sorted by the join key into a
fixed number of buckets; every later equi-join (or aggregation) on
that key then reads co-located buckets and skips the Exchange
entirely. This module is the engine's managed-layout layer: a
``bucketize`` writer and a reader that returns bucket-aware
DataFrames — the physical design a production deployment would apply
to ``documents``/``embeddings`` (join key ``doc_id``/``vec_id``) and
``lineitem``/``orders`` (join key orderkey) before running the
operator battery.

Why not bucket the driver testdata itself: the correctness harness
reads plain parquet paths (TESTDATA.md is read-only), and bucketing
is a Spark-catalog feature — a saveAsTable layout, not a parquet
property. So the layout layer lives here, exercised by its own plan
tests (tests/test_bucketing.py) that assert the central claim: the
bucketed join plans with ZERO Exchange on the bucketed sides, while
the identical plain-parquet join shuffles both.

Bucket-count guidance at scale: pick ``n_buckets`` so one bucket of
the LARGEST co-bucketed table is ~128–512 MB (e.g. 100 TB of
lineitem at 256 MB/bucket → ~400k buckets); all tables joined on the
key must share the SAME bucket count, or Spark falls back to a
shuffle on the mismatched side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from duckdb_gsheets_spark.plans.catalog import load_table


def bucketize(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    n_buckets: int,
    database: str = "bucketed",
    location: str | None = None,
) -> str:
    """Write ``table`` from ``sf_dir`` as a bucketed+sorted managed
    table keyed on ``key``; returns the qualified table name.

    One full shuffle-write now buys every later join/agg on ``key`` a
    shuffle-free plan — the classic write-once/join-many trade. The
    writer clusters AND sorts by the key so sort-merge joins also skip
    their per-task sort. ``location`` overrides the database path
    (``spark.sql.warehouse.dir`` is a STATIC conf — unsettable on a
    live session — but a database LOCATION is per-database DDL).
    """
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}{loc}")
    qualified = f"{database}.{table}_by_{key}"
    (
        load_table(spark, sf_dir, table)
        .write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(qualified)
    )
    return qualified


def read_bucketed(spark: SparkSession, qualified: str) -> DataFrame:
    """Read a bucketed table with its bucket metadata intact (a plain
    ``spark.read.parquet`` of the same files would LOSE the bucket
    spec — the catalog carries it)."""
    return spark.table(qualified)

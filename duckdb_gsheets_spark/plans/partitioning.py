"""Hive-partitioned parquet layout for scan pruning.

Bucketing (plans/bucketing.py) eliminates join shuffles; PARTITIONING
eliminates reading irrelevant data at all. Writing a table
directory-partitioned by a coarse, low-cardinality key (ingest date,
language, source) turns every equality/IN/range predicate on that key
into directory-level pruning: the scan plans only the matching
partitions' files, so a one-language query over a 100 TB multilingual
corpus reads only that language's bytes. Two pruning modes ride the
layout:

* **Static pruning** — a literal predicate on the partition key is
  resolved at planning time (``PartitionFilters`` on the scan node,
  never per-row work);
* **Dynamic partition pruning (DPP)** — when the predicate arrives
  through a join (fact partitioned on the key, dim filtered at
  runtime), Spark injects a ``dynamicpruningexpression`` that builds
  the partition list from the dim side before scanning the fact — the
  star-schema pattern where the 100 TB side's scan is cut by a filter
  Spark only learns mid-query.

Partition-key guidance at scale: pick keys with enough distinct
values to prune meaningfully but few enough that each partition still
holds ≥ ~1 GB (a 100 TB corpus partitioned by (date, lang) at 365 ×
30 ≈ 11k partitions → ~9 GB each — healthy; partitioning by doc_id
would create billions of tiny files and destroy the scan). High-
cardinality keys belong in bucketing, not partitioning.

Why the driver testdata is not partitioned: TESTDATA.md's parquet is
read-only single files; the layout layer lives here and is exercised
by its own plan tests (tests/test_partitioning.py) asserting the
pruning claims directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from duckdb_gsheets_spark.plans.catalog import load_table


def partition_layout(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    keys: list[str],
    out_dir: str,
) -> str:
    """Write ``table`` from ``sf_dir`` hive-partitioned by ``keys``
    into ``out_dir``; returns the layout path.

    One full rewrite now buys every later query with a predicate on
    ``keys`` a directory-pruned scan. The write shuffles nothing (the
    partitioning is directory fan-out per task, not a hash exchange);
    at scale, repartition on the keys first if tasks would otherwise
    each open one file per partition value.
    """
    load_table(spark, sf_dir, table).write.mode("overwrite").partitionBy(
        *keys
    ).parquet(out_dir)
    return out_dir


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout (partition keys come back as columns
    reconstructed from the directory names)."""
    return spark.read.parquet(path)

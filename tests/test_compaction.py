"""Compaction tests: a fragmented directory (many KB-scale part
files) rewrites into the byte-budgeted file count with identical
content, and the default path plans no shuffle."""

import os

from pyspark.sql import functions as F

from duckdb_gsheets_spark.plans.catalog import load_table
from duckdb_gsheets_spark.plans.compaction import (
    compact,
    dir_bytes,
    plan_file_count,
)

SF = "/root/testdata/sf0.001"


def _data_files(path):
    out = []
    for root, _dirs, files in os.walk(path):
        out += [
            os.path.join(root, f)
            for f in files
            if not f.startswith(("_", ".")) and f.endswith(".parquet")
        ]
    return out


def test_plan_file_count_is_ceiling_div():
    assert plan_file_count(0, 256) == 1
    assert plan_file_count(1, 256) == 1
    assert plan_file_count(256, 256) == 1
    assert plan_file_count(257, 256) == 2
    assert plan_file_count(10 * 256, 256) == 10


def test_compact_restores_sane_file_count_and_content(spark, tmp_path):
    frag = str(tmp_path / "fragmented")
    # Simulate the incremental-ingest failure mode: 32 tiny files.
    load_table(spark, SF, "documents").repartition(32).write.parquet(frag)
    n_before = len(_data_files(frag))
    assert n_before >= 32
    out = str(tmp_path / "compacted")
    total = dir_bytes(frag)
    target = -(-total // 3)  # aim for ~3 files on the tiny fixture
    planned = compact(spark, frag, out, target_bytes=target)
    got_files = _data_files(out)
    assert planned == 3
    assert len(got_files) == planned < n_before
    # Content identical (order-insensitive).
    a = sorted(
        map(tuple, spark.read.parquet(out).select("doc_id", "n_chars").collect())
    )
    b = sorted(
        map(
            tuple,
            load_table(spark, SF, "documents")
            .select("doc_id", "n_chars")
            .collect(),
        )
    )
    assert a == b


def test_default_compaction_plans_no_shuffle(spark, tmp_path):
    frag = str(tmp_path / "frag2")
    load_table(spark, SF, "documents").repartition(16).write.parquet(frag)
    df = spark.read.parquet(frag).coalesce(2)
    plan = df._jdf.queryExecution().toString().split("== Physical Plan ==")[-1]
    assert "Exchange" not in plan  # coalesce concatenates, never shuffles
    df_bal = spark.read.parquet(frag).repartition(2)
    plan_bal = (
        df_bal._jdf.queryExecution().toString().split("== Physical Plan ==")[-1]
    )
    assert "Exchange" in plan_bal  # balanced mode pays exactly one

"""Small-file compaction for parquet layouts.

The operational failure mode of every long-running 100 TB pipeline:
incremental jobs (hourly ingests, streaming micro-batches, per-task
partition fan-out) leave millions of KB-scale files, and from then on
every scan pays per-file open/footer costs that dwarf the data read —
NameNode/listing pressure included. The fix is periodic compaction:
rewrite a directory into ⌈input_bytes / target⌉ files of a sane size
(128–512 MB in production; parameterized here).

``compact`` sizes the rewrite from the ACTUAL input bytes rather than
a fixed file count, so the same call works on a 10 MB test directory
and a 10 TB partition. The rewrite uses ``coalesce`` when shrinking
(narrow — no shuffle: tasks concatenate input splits) and
``repartition`` only when the caller asks for balanced output from
skewed inputs (one shuffle, uniform row distribution).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def dir_bytes(path: str) -> int:
    """Total bytes of the data files under ``path`` (non-recursive
    parquet part files + nested partition dirs)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_file_count(input_bytes: int, target_bytes: int) -> int:
    """⌈input / target⌉, at least 1 — the compaction width."""
    return max(1, -(-input_bytes // max(1, target_bytes)))


def compact(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_bytes: int = 256 * 1024 * 1024,
    balanced: bool = False,
) -> int:
    """Rewrite the parquet directory ``in_dir`` into ``out_dir`` with
    ⌈bytes/target⌉ files; returns the planned file count.

    ``balanced=False`` (default) coalesces — zero shuffle, tasks
    concatenate whole input files, which is what a pure compaction
    wants. ``balanced=True`` repartitions — one shuffle buying
    uniformly-sized outputs when the inputs themselves are skewed.
    """
    n = plan_file_count(dir_bytes(in_dir), target_bytes)
    df = spark.read.parquet(in_dir)
    df = df.repartition(n) if balanced else df.coalesce(n)
    df.write.mode("overwrite").parquet(out_dir)
    return n

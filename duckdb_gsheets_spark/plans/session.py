"""SparkSession construction tuned for the engine.

Defaults are chosen for correctness-vs-oracle first (UTC session
timezone, ANSI off so arithmetic matches DuckDB's permissive mode) and
for scale second: AQE on (runtime re-planning, skew-join splitting,
partition coalescing) so the same logical plans survive a 1000-executor
cluster, and Arrow enabled so any Pandas-UDF path is batch-transferred.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "duckdb_gsheets_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster pass ``None`` and let spark-submit decide.  Configs set
    here are safe cluster-side defaults, not local hacks.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Correctness knobs: deterministic cross-engine comparison.
        .config("spark.sql.session.timeZone", "UTC")
        # Scale knobs: AQE re-plans shuffles at runtime (coalesces tiny
        # partitions, splits skewed ones, converts SMJ->BHJ when a side
        # turns out small). These are the settings we'd run at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for any pandas-UDF / toPandas path (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Read timestamps without timezone as TIMESTAMP_NTZ, matching
        # DuckDB's naive-timestamp semantics for the test parquet.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # Some test parquet files carry TIMESTAMP(NANOS) which the
        # vectorized reader rejects; read them as long and convert in
        # the catalog loader (micros precision is preserved).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()

"""Adaptive Query Execution proofs: the runtime re-planning the 100 TB
story leans on, demonstrated against this session's engine defaults.

Three behaviors, each asserted on the FINAL adaptive plan (the one
actually executed, not the static estimate):

* skew-join splitting — a hot join key is split into parallel subtasks
  (``SortMergeJoin(skew=true)``) instead of serializing one straggler;
* partition coalescing — hundreds of near-empty shuffle partitions
  collapse into a few right-sized reads (``AQEShuffleRead coalesced``);
* runtime join-strategy switch — a side the optimizer could not prove
  small at plan time broadcasts once runtime statistics show it is
  (static plan says SortMergeJoin, final plan says BroadcastHashJoin).

Each test saves/restores the confs it tunes — the session is shared.
"""

import contextlib

import pytest
from pyspark.sql import functions as F


@contextlib.contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join_partitions(spark):
    """95% of the fact rows share one key: AQE must mark the join
    skewed and split the hot partition rather than run it as one
    straggler task."""
    with _confs(
        spark,
        **{
            "spark__sql__adaptive__skewJoin__enabled": "true",
            "spark__sql__adaptive__skewJoin__skewedPartitionFactor": "2",
            "spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes": "8KB",
            "spark__sql__adaptive__advisoryPartitionSizeInBytes": "8KB",
            "spark__sql__adaptive__coalescePartitions__enabled": "false",
            "spark__sql__autoBroadcastJoinThreshold": "-1",
        },
    ):
        left = spark.range(0, 500_000).select(
            F.when(F.col("id") % 100 < 95, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("x" * 50), F.col("id").cast("string")).alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right, "k")
        plan = _final_plan(joined)
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan.splitlines()[:8]


def test_aqe_coalesces_tiny_shuffle_partitions(spark):
    """An aggregation whose shuffle lands far under the advisory size
    must read coalesced partitions, not one task per configured
    shuffle partition."""
    with _confs(
        spark,
        **{
            "spark__sql__adaptive__coalescePartitions__enabled": "true",
            "spark__sql__adaptive__advisoryPartitionSizeInBytes": "64MB",
            "spark__sql__shuffle__partitions": "64",
        },
    ):
        df = (
            spark.range(0, 10_000)
            .groupBy((F.col("id") % 97).alias("g"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _final_plan(df)
    assert "isFinalPlan=true" in plan
    assert "AQEShuffleRead" in plan and "coalesced" in plan, (
        plan.splitlines()[:8]
    )


def test_aqe_switches_join_strategy_at_runtime(spark):
    """A filtered side the static optimizer can't size (estimate too
    big to broadcast) must switch to a broadcast join once runtime
    stats reveal it is tiny."""
    with _confs(
        spark,
        **{
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__adaptive__autoBroadcastJoinThreshold": "10MB",
        },
    ):
        big = spark.range(0, 200_000).select(
            (F.col("id") % 5000).alias("k"), F.col("id").alias("v")
        )
        # Runtime-tiny side: the filter keeps 10 rows, but the static
        # estimate (no stats on range+filter) can't prove smallness
        # with the static broadcast threshold disabled.
        small = spark.range(0, 100_000).where(F.col("id") < 10).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("w")
        )
        joined = big.join(small, "k")
        static = joined._jdf.queryExecution().executedPlan().toString()
        plan = _final_plan(joined)
    assert "SortMergeJoin" in static or "isFinalPlan=false" in static
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan, plan.splitlines()[:10]

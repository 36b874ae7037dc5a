"""Best-of-N wall/exec timer for named queries — bench.py's exact
session config, plan-cache clearing, noop sink and accounting, for
A/B probes during optimization rounds (the numbers recorded in
OPTIMIZATION_r15.md's per-item evidence).

Usage: python tools/time_queries.py <sf_dir> <query> [query ...]
       SPARK_GRAFT_RUNS=N  (default 3)
"""

from __future__ import annotations

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    n_runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))

    from duckdb_gsheets_spark.operators import all_queries, clear_plan_caches
    from duckdb_gsheets_spark.plans.session import get_spark

    spark = get_spark(
        "time_queries",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2097152",
            "spark.sql.files.openCostInBytes": "262144",
        },
    )
    jvm = spark.sparkContext._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        jvm.org.apache.logging.log4j.Level.ERROR,
    )
    qs = all_queries()
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    from pyspark.sql import functions as F

    from duckdb_gsheets_spark.functions.vectors import dot_np

    arr = F.array(*[F.lit(float(i)) for i in range(8)])
    spark.range(256).select(dot_np(arr, arr).alias("d")).selectExpr(
        "sum(d)"
    ).write.format("noop").mode("overwrite").save()
    for name in names:
        walls, execs = [], []
        df = None
        for _ in range(n_runs):
            clear_plan_caches()
            df = None
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df = qs[name].spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - t0)
        print(
            f"{name}: wall min {min(walls):.2f} "
            f"[{', '.join(f'{w:.2f}' for w in walls)}] "
            f"exec min {min(execs):.2f} "
            f"[{', '.join(f'{e:.2f}' for e in execs)}]",
            flush=True,
        )


if __name__ == "__main__":
    main()

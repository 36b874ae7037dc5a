"""Job-floor decomposition for floor-bound bench rows.

For each named query: run it once cold (plan+execute), then twice
warm, and count the Spark JOBS each warm run schedules (statusTracker
delta). Separately measure this box's empty-job floor — the wall cost
of scheduling a job that does nothing — by timing a burst of trivial
``spark.range(1).count()`` jobs. A row whose warm wall-clock ≈
jobs × floor is scheduling-bound, not plan-bound: the fix is fewer
jobs (or acceptance), never a faster shuffle.

Usage: python tools/floor_decompose.py <sf_dir> <query> [query ...]
Prints one markdown table row per query, BASELINE.md-ready.
"""

from __future__ import annotations

import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    from duckdb_gsheets_spark.operators.registry import all_queries
    from duckdb_gsheets_spark.plans.session import get_spark

    spark = get_spark("floor_decompose")
    sc = spark.sparkContext
    qs = all_queries()

    # empty-job floor: warm the scheduler first (executor spin-up and
    # first-job codegen are NOT the steady-state floor), then time a
    # burst of trivial jobs. The product jobs x floor is an UPPER
    # bound on scheduling cost — consecutive jobs overlap planning
    # with execution — so floor share is capped at 100%.
    for _ in range(5):
        spark.range(1).count()
    t0 = time.perf_counter()
    for _ in range(20):
        spark.range(1).count()
    floor = (time.perf_counter() - t0) / 20
    print(f"empty-job floor (warm): {floor * 1000:.0f} ms/job\n")
    print("| query | jobs (warm) | floor = jobs x f | warm wall | floor share |")
    print("|---|---|---|---|---|")

    # Job counts via max(jobId) deltas, NOT list-length deltas: the
    # statusTracker only retains spark.ui.retainedJobs ids (default
    # 1000), so len() plateaus once a session's total job count
    # crosses it and every subsequent delta undercounts. Job ids are
    # monotonically increasing and never evicted from the COUNTER, so
    # max-id deltas stay exact for any session length.
    def _max_job_id() -> int:
        ids = sc.statusTracker().getJobIdsForGroup(None)
        return max(ids) if ids else -1

    for name in names:
        fn = qs[name].spark_fn
        fn(spark, sf_dir).collect()  # cold: plan + artifact caches
        walls, jobs = [], []
        for _ in range(2):
            before = _max_job_id()
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            walls.append(time.perf_counter() - t0)
            jobs.append(_max_job_id() - before)
        wall = min(walls)
        nj = jobs[-1]
        est = nj * floor
        print(
            f"| `{name}` | {nj} | {est:.2f} s | {wall:.2f} s "
            f"| {min(1.0, est / wall) * 100:.0f}% |"
        )


if __name__ == "__main__":
    main()

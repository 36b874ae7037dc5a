"""Range-clustered layout: footer-envelope proofs for row-group
skipping (plans/clustering.py)."""

from pyspark.sql import functions as F

from duckdb_gsheets_spark.plans.catalog import load_table
from duckdb_gsheets_spark.plans.clustering import (
    cluster_layout,
    file_envelopes,
    skip_ratio,
)

SF = "/root/testdata/sf0.001"
N_FILES = 4


def test_clustered_envelopes_are_disjoint_and_prunable(spark, tmp_path):
    """The clustered write must give (a) files whose sort-key
    envelopes are pairwise DISJOINT (range repartition assigns
    disjoint key ranges) while a naive round-robin write of the same
    data leaves every file spanning ~the full key range, and (b) a
    narrow range predicate that a stats reader can satisfy from ONE
    file — skip ratio (N-1)/N — where the naive layout skips
    nothing. Results stay identical on both layouts."""
    events = load_table(spark, SF, "events").select(
        "event_id", F.col("ts").cast("string").alias("ts_s"), "value"
    )
    clustered = str(tmp_path / "clustered")
    naive = str(tmp_path / "naive")
    cluster_layout(events, clustered, "ts_s", N_FILES)
    events.repartition(N_FILES).write.mode("overwrite").parquet(naive)

    env_c = file_envelopes(clustered, "ts_s")
    env_n = file_envelopes(naive, "ts_s")
    assert len(env_c) == N_FILES and len(env_n) == N_FILES

    # (a) clustered: STRICTLY disjoint envelopes (repartitionByRange
    # keeps equal keys in one partition, so adjacent files can never
    # share a boundary value) — strictness is what the (N-1)/N skip
    # assertion in (b) relies on; naive: all overlap.
    for (_, mx1, _), (mn2, _, _) in zip(env_c, env_c[1:]):
        assert mx1 < mn2, "range clustering produced overlapping files"
    # naive: every file's envelope overlaps every other's (they share
    # a common region: the largest min sits below the smallest max).
    assert max(mn for mn, _, _ in env_n) < min(mx for _, mx, _ in env_n)

    # (b) a predicate inside ONE clustered file's envelope.
    lo = env_c[1][0]
    probe_lo = lo
    probe_hi = lo  # single-point range at the file's min
    assert skip_ratio(env_c, probe_lo, probe_hi) >= (N_FILES - 1) / N_FILES
    assert skip_ratio(env_n, probe_lo, probe_hi) == 0.0

    # Same answers on both layouts (layout is transparent).
    pred = (F.col("ts_s") >= probe_lo) & (F.col("ts_s") <= probe_hi)
    n_c = spark.read.parquet(clustered).where(pred).count()
    n_n = spark.read.parquet(naive).where(pred).count()
    assert n_c == n_n > 0


def test_clustered_scan_pushes_the_range_filter(spark, tmp_path):
    """The ranged read over the clustered layout must show the
    predicate in PushedFilters (footer-level evaluation), not as a
    post-scan Filter only."""
    events = load_table(spark, SF, "events").select(
        "event_id", F.col("ts").cast("string").alias("ts_s")
    )
    path = str(tmp_path / "clustered")
    cluster_layout(events, path, "ts_s", N_FILES)
    env = file_envelopes(path, "ts_s")
    df = spark.read.parquet(path).where(F.col("ts_s") >= env[-1][0])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(ts_s" in plan

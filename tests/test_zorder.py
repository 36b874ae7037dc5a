"""Z-ordered layout: multi-column footer-envelope skipping proofs
(plans/zorder.py)."""

from pyspark.sql import functions as F

from duckdb_gsheets_spark.plans.catalog import load_table
from duckdb_gsheets_spark.plans.clustering import (
    cluster_layout,
    file_envelopes,
    skip_ratio,
)
from duckdb_gsheets_spark.plans.zorder import zorder_layout, zvalue

SF = "/root/testdata/sf0.001"
N_FILES = 16


def test_morton_code_unit_pins(spark):
    """Bit-interleave pins on a 4-cell grid (bits=2, span=grid so the
    normalized value IS the coordinate): dim 0 owns even bit lanes,
    dim 1 odd — (1,0)->1, (0,1)->2, (1,1)->3, (2,3)->0b1110=14."""
    df = spark.createDataFrame([(1, 0), (0, 1), (1, 1), (2, 3)], ["x", "y"])
    bounds = [(0.0, 4.0), (0.0, 4.0)]
    got = [
        r.z
        for r in df.select(
            zvalue([F.col("x"), F.col("y")], bounds, bits=2).alias("z")
        ).collect()
    ]
    assert got == [1, 2, 3, 14]


def test_zorder_skips_on_both_columns(spark, tmp_path):
    """The contrast the module exists for: a point predicate on EACH
    of the two z-columns must skip files under the z-layout, while
    range clustering on event_id skips only on event_id (every file
    spans ~the full value range) and the naive layout skips on
    neither. Query answers are identical on all three layouts."""
    events = load_table(spark, SF, "events").select(
        "event_id", "value", "user_id"
    )
    zp, rp, np_ = (str(tmp_path / n) for n in ("z", "r", "n"))
    zorder_layout(events, zp, ["event_id", "value"], N_FILES)
    cluster_layout(events, rp, "event_id", N_FILES)
    events.repartition(N_FILES).write.mode("overwrite").parquet(np_)

    env = {
        (name, col): file_envelopes(path, col)
        for name, path in (("z", zp), ("r", rp), ("n", np_))
        for col in ("event_id", "value")
    }
    assert all(len(e) == N_FILES for e in env.values())

    # Point probe on event_id (uniform key): z-files tile the key
    # plane in blocks, so most blocks exclude any one event_id.
    eid = 500
    assert skip_ratio(env[("z", "event_id")], eid, eid) >= 0.5
    assert skip_ratio(env[("r", "event_id")], eid, eid) >= (N_FILES - 1) / N_FILES
    assert skip_ratio(env[("n", "event_id")], eid, eid) == 0.0

    # Point probe on value at its MEDIAN — the worst reasonable spot
    # for the z-layout (value is heavily right-skewed, so linear
    # gridding compresses the mass; the docstring owns this
    # trade-off) and the best possible spot for the baselines (62
    # random draws per file straddle the median almost surely). The
    # z-layout still must skip SOME files; both baselines skip none.
    med = events.approxQuantile("value", [0.5], 0.0)[0]
    assert skip_ratio(env[("z", "value")], med, med) > 0.0
    assert skip_ratio(env[("r", "value")], med, med) == 0.0
    assert skip_ratio(env[("n", "value")], med, med) == 0.0

    # High-value band (top ~10% of the range): skew works FOR the
    # z-layout here — the sparse tail occupies most of the grid.
    hi = 0.9 * max(mx for _, mx, _ in env[("z", "value")])
    assert skip_ratio(env[("z", "value")], hi, 1e18) >= 0.5

    # The layout is invisible to queries: same answers everywhere,
    # and the helper __z column must not have been written.
    pred = (F.col("event_id") <= eid) & (F.col("value") <= med)
    counts = {
        p: spark.read.parquet(p).where(pred).count() for p in (zp, rp, np_)
    }
    assert len(set(counts.values())) == 1 and counts[zp] > 0
    assert spark.read.parquet(zp).columns == ["event_id", "value", "user_id"]


def test_zorder_scan_pushes_filters(spark, tmp_path):
    """Both z-column predicates must reach the parquet footer as
    PushedFilters — the skip is free only if the reader sees it."""
    events = load_table(spark, SF, "events").select("event_id", "value")
    path = str(tmp_path / "z")
    zorder_layout(events, path, ["event_id", "value"], N_FILES)
    df = spark.read.parquet(path).where(
        (F.col("event_id") >= 900) & (F.col("value") >= 300.0)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(event_id,900)" in plan
    # toString truncates long PushedFilters lists, so the value
    # predicate is asserted via the (untruncated) DataFilters — the
    # source both lists are built from.
    assert "DataFilters" in plan and ">= 300.0)" in plan


def test_zvalue_guards(spark):
    """Dimension/overflow guards fail loudly, and a constant column
    contributes nothing (span 0 must not divide by zero)."""
    import pytest

    with pytest.raises(ValueError, match="1..4"):
        zvalue([F.col("x")] * 5, [(0.0, 1.0)] * 5)
    with pytest.raises(ValueError, match="overflows"):
        zvalue([F.col("x")] * 4, [(0.0, 1.0)] * 4, bits=16)
    with pytest.raises(ValueError, match="no non-null values"):
        zorder_layout(
            spark.createDataFrame([], "x int, y int"),
            "/tmp/zorder_never_written",
            ["x", "y"],
            2,
        )
    df = spark.createDataFrame([(7, 3)], ["x", "y"])
    got = df.select(
        zvalue(
            [F.col("x"), F.col("y")], [(7.0, 7.0), (0.0, 4.0)], bits=2
        ).alias("z")
    ).collect()[0].z
    # x is constant (span 0) => only y=3 contributes on odd lanes:
    # 0b1010 = 10.
    assert got == 10


def test_zvalue_null_keys_place_nulls_first(spark):
    """NULLS-FIRST contract: a NULL z-key maps to grid cell 0 of its
    dimension — the same Morton code as the dimension's minimum value
    — so null rows cluster at the curve origin by design instead of
    by greatest()'s accidental NULL-skipping."""
    from pyspark.sql import functions as F

    from duckdb_gsheets_spark.plans.zorder import zvalue

    df = spark.createDataFrame(
        [(None, 3), (0, 3), (3, None), (3, 0)],
        "x int, y int",
    )
    z = [
        r.z
        for r in df.select(
            zvalue(
                [F.col("x"), F.col("y")], [(0.0, 4.0), (0.0, 4.0)], bits=2
            ).alias("z")
        ).collect()
    ]
    assert z[0] == z[1]  # NULL x == min x
    assert z[2] == z[3]  # NULL y == min y

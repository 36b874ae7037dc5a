"""Bucketed-layout plan tests: the write-once/join-many claim.

The central assertion: joining two tables co-bucketed on the join key
plans with ZERO Exchange (no shuffle at all), while the identical
plain-parquet join exchanges both sides. This is the physical design
that amortizes at 100 TB — every repeated join on the bucket key rides
the layout for free.
"""

import pytest

from duckdb_gsheets_spark.plans.bucketing import bucketize, read_bucketed
from duckdb_gsheets_spark.plans.catalog import load_table

SF = "/root/testdata/sf0.001"
N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    loc = f"file://{warehouse}"
    docs = bucketize(
        spark, SF, "documents", "doc_id", N_BUCKETS, location=loc
    )
    emb = bucketize(
        spark, SF, "embeddings", "vec_id", N_BUCKETS, location=loc
    )
    yield docs, emb
    spark.sql(f"DROP TABLE IF EXISTS {docs}")
    spark.sql(f"DROP TABLE IF EXISTS {emb}")
    spark.sql("DROP DATABASE IF EXISTS bucketed")


def _physical(df):
    return (
        df._jdf.queryExecution()
        .toString()
        .split("== Physical Plan ==")[-1]
    )


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    """documents ⋈ embeddings on the shared id: both sides bucketed on
    the key at the same count ⇒ no shuffle anywhere in the plan."""
    docs_t, emb_t = bucketed_pair
    docs = read_bucketed(spark, docs_t)
    emb = read_bucketed(spark, emb_t).withColumnRenamed("vec_id", "doc_id")
    # At the design scale both sides are fact-sized: disable the
    # broadcast shortcut the planner takes on a KB-scale fixture so
    # the plan exercises the bucket-aware sort-merge path.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _physical(
            docs.join(emb, "doc_id").select("doc_id", "lang", "label")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan


def test_plain_parquet_join_shuffles_both_sides(spark):
    """The identical join over plain parquet exchanges both sides —
    the baseline the bucketed layout eliminates."""
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings").withColumnRenamed(
        "vec_id", "doc_id"
    )
    # Force the shuffle comparison (a broadcast would hide it at this
    # tiny SF; at the design scale both sides are fact-sized).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _physical(
            docs.join(emb, "doc_id").select("doc_id", "lang", "label")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert plan.count("Exchange hashpartitioning") >= 2


def test_bucketed_agg_skips_exchange(spark, bucketed_pair):
    """A groupBy on the bucket key also rides the layout: no Exchange
    before the aggregate."""
    docs_t, _ = bucketed_pair
    docs = read_bucketed(spark, docs_t)
    plan = _physical(docs.groupBy("doc_id").count())
    assert "Exchange" not in plan


def test_bucketed_join_results_match_plain(spark, bucketed_pair):
    """Layout is execution strategy only — results are identical to
    the plain-parquet join."""
    docs_t, emb_t = bucketed_pair
    b = (
        read_bucketed(spark, docs_t)
        .join(
            read_bucketed(spark, emb_t).withColumnRenamed(
                "vec_id", "doc_id"
            ),
            "doc_id",
        )
        .select("doc_id", "lang", "label")
    )
    p = (
        load_table(spark, SF, "documents")
        .join(
            load_table(spark, SF, "embeddings").withColumnRenamed(
                "vec_id", "doc_id"
            ),
            "doc_id",
        )
        .select("doc_id", "lang", "label")
    )
    assert sorted(map(tuple, b.collect())) == sorted(map(tuple, p.collect()))

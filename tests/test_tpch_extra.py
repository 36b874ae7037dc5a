"""Tests for the extended TPC-H battery: structural invariants that
the DuckDB parity gate can't see (approx-distinct error bounds,
grouping-set flag shapes, non-empty selections at the smoke SF)."""

from pyspark.sql import functions as F

from duckdb_gsheets_spark.operators.tpch_extra import (
    approx_count_distinct_users,
    grouping_sets_sales,
    q7_volume_shipping,
    q13_customer_distribution,
    q22_global_customers,
)

SF = "/root/testdata/sf0.001"


def test_approx_count_distinct_within_rsd(spark):
    rows = approx_count_distinct_users(spark, SF).collect()
    assert rows, "events table yielded no groups"
    for r in rows:
        assert r.exact_users > 0
        # rsd=0.02 → generous 10% envelope (HLL++ error is probabilistic).
        assert abs(r.approx_users - r.exact_users) <= max(2, 0.10 * r.exact_users)


def test_grouping_sets_contains_grand_total(spark):
    rows = grouping_sets_sales(spark, SF).collect()
    grand = [r for r in rows if r.o_orderstatus is None and r.o_orderpriority is None]
    assert len(grand) == 1
    per_status = [
        r for r in rows if r.o_orderstatus is not None and r.o_orderpriority is None
    ]
    assert sum(r.n_orders for r in per_status) == grand[0].n_orders


def test_q13_histogram_accounts_for_every_customer(spark):
    from duckdb_gsheets_spark.plans.catalog import load_table

    hist = q13_customer_distribution(spark, SF).collect()
    n_customers = load_table(spark, SF, "customer").count()
    assert sum(r.custdist for r in hist) == n_customers


def test_q22_threshold_filters(spark):
    df = q22_global_customers(spark, SF)
    total = df.agg(F.sum("numcust")).collect()[0][0]
    # Anti join on recent orders keeps the query selective but nonempty
    # at every SF (sf0.001 has no post-2000 orders → all high-balance
    # customers survive; larger SFs prune).
    assert total is not None and total > 0


def test_q7_nation_pair_symmetric_filter(spark):
    rows = q7_volume_shipping(spark, "/root/testdata/sf0.01").collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert pairs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    assert pairs, "nation-pair predicate selected nothing at sf0.01"

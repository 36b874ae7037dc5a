"""Relational operator battery (SURVEY.md §2.2).

The reference delegates every relational operator to DuckDB core; this
module expresses the same surface — scans, projection, filter, limit,
joins of every flavor, aggregation (plain/distinct/rollup/cube),
having, set ops, scalar functions, subqueries — as declarative
DataFrame plans so Catalyst supplies pushdown, join selection, AQE and
codegen.  Each query carries the DuckDB oracle SQL the driver runs for
the correctness hash-match.

Scale notes (100 TB design intent):
* Fact-fact joins (orders⋈lineitem) are plain equi-joins on their
  natural keys — Spark picks sort-merge with AQE skew splitting; no
  hint needed, nothing here forces a broadcast of a big table.
* Fixed-size dims (region=5, nation=25 rows at *every* SF) are
  explicitly ``F.broadcast``-hinted: replicating 25 rows beats
  shuffling a fact table at any scale.
* Filters are expressed directly on scan columns so they reach the
  parquet reader (PushedFilters), and aggregations are partial
  (map-side combine) by construction of groupBy.agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_gsheets_spark.operators.determinism import (
    davg,
    dsum,
    oracle_davg,
    oracle_dsum,
)
from duckdb_gsheets_spark.operators.registry import QueryDef
from duckdb_gsheets_spark.plans.catalog import load_table


# --------------------------------------------------------------------------
# TPC-H-style analytical queries
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter → groupBy → 8 aggregates.

    Parity: the agg/scan pipeline the reference's users run through
    DuckDB core (SURVEY §2.2 'Aggregation').
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, scale=4).alias("sum_disc_price"),
            dsum(charge, scale=6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_dsum('l_quantity')} AS sum_qty,
  {oracle_dsum('l_extendedprice')} AS sum_base_price,
  {oracle_dsum('l_extendedprice * (1.0 - l_discount)', scale=4)} AS sum_disc_price,
  {oracle_dsum('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)', scale=6)} AS sum_charge,
  {oracle_davg('l_quantity')} AS avg_qty,
  {oracle_davg('l_extendedprice')} AS avg_price,
  {oracle_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + agg + deterministic top-10."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < "1998-06-01 00:00:00")
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > "1998-06-01 00:00:00")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, scale=4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_ORACLE = f"""
SELECT
  l_orderkey,
  {oracle_dsum('l_extendedprice * (1.0 - l_discount)', scale=4)} AS revenue,
  CAST(o_orderdate AS VARCHAR) AS o_orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS subquery → left-semi join with non-equi term."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    semi = orders.join(
        lineitem,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        semi.where(
            (F.col("o_orderdate") >= "1996-01-01 00:00:00")
            & (F.col("o_orderdate") < "1996-10-01 00:00:00")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join with broadcast dims + local-supplier predicate."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(
            (F.col("o_orderdate") >= "1996-01-01 00:00:00")
            & (F.col("o_orderdate") < "1997-01-01 00:00:00")
        )
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(dsum(revenue, scale=4).alias("revenue"))
    )


Q5_ORACLE = f"""
SELECT n_name, {oracle_dsum('l_extendedprice * (1.0 - l_discount)', scale=4)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: tight filter + single aggregate (pushdown showcase)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-01-01 00:00:00")
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_ORACLE = f"""
SELECT
  {oracle_dsum('l_extendedprice * l_discount', scale=4)} AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.02 AND l_discount <= 0.04
  AND l_quantity < 24.0
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: join + agg + deterministic top-20 by revenue."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(
            (F.col("o_orderdate") >= "1996-01-01 00:00:00")
            & (F.col("o_orderdate") < "1996-07-01 00:00:00")
        )
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_returnflag") == "R")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue, scale=4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = f"""
SELECT
  c_custkey, c_name, c_acctbal, n_name,
  {oracle_dsum('l_extendedprice * (1.0 - l_discount)', scale=4)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregation ratio over a join."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    joined = lineitem.where(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1996-04-01 00:00:00")
    ).join(part, F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (
            F.lit(100.0)
            * dsum(promo, scale=4)
            / dsum(disc_price, scale=4)
        ).alias("promo_revenue_pct"),
        dsum(promo, scale=4).alias("promo_revenue"),
        dsum(disc_price, scale=4).alias("total_revenue"),
    )


Q14_ORACLE = f"""
SELECT
  100.0 * {oracle_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END", scale=4)}
        / {oracle_dsum('l_extendedprice * (1.0 - l_discount)', scale=4)} AS promo_revenue_pct,
  {oracle_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END", scale=4)} AS promo_revenue,
  {oracle_dsum('l_extendedprice * (1.0 - l_discount)', scale=4)} AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: agg-subquery filter (HAVING over a join key) + join."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 200.0)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


Q18_ORACLE = f"""
SELECT
  c_custkey, c_name, o_orderkey,
  CAST(o_orderdate AS VARCHAR) AS o_orderdate,
  o_totalprice, total_qty
FROM (
  SELECT l_orderkey, {oracle_dsum('l_quantity')} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {oracle_dsum('l_quantity')} > 200.0
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# Core operator coverage: sorts, limits, set ops, joins, grouping variants
# --------------------------------------------------------------------------


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: total order + limit → Spark TakeOrderedAndProject."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
        )
        .limit(25)
    )


TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS VARCHAR) AS o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""


def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.select("l_returnflag", "l_linestatus").distinct()


DISTINCT_ORACLE = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + MIN/MAX per group."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


AGG_DISTINCT_ORACLE = """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders GROUP BY o_orderstatus
"""


def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP with grouping-set totals."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
    )


ROLLUP_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       {oracle_dsum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over a broadcast-dim join."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .cube("c_mktsegment", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
        )
    )


CUBE_ORACLE = f"""
SELECT c_mktsegment, n_name,
       COUNT(*) AS n_customers,
       {oracle_dsum('c_acctbal')} AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE (c_mktsegment, n_name)
"""


def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered projections (reference: copy_to.test:19-26)."""
    customer = load_table(spark, sf_dir, "customer")
    building = customer.where(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    auto = customer.where(F.col("c_mktsegment") == "AUTOMOBILE").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return building.unionAll(auto)


UNION_ALL_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
"""


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations having both customers and suppliers."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customer nations with no supplier."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


EXCEPT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers who ordered in 1997."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    o97 = orders.where(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1998-01-01 00:00:00")
    )
    return customer.join(
        o97, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join + agg: per-customer order count including zeros."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


JOIN_OUTER_ORACLE = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join between per-nation customer and supplier counts."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    s = supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


JOIN_FULL_ORACLE = """
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
USING (nationkey)
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny dims (explicit crossJoin)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation.select("n_nationkey", "n_name")).select(
        "r_regionkey", "r_name", "n_nationkey", "n_name"
    )


JOIN_CROSS_ORACLE = """
SELECT r_regionkey, r_name, n_nationkey, n_name FROM region CROSS JOIN nation
"""


def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the raw SQL surface: each
    customer joined to their top-2 orders by value — the "top-N per
    group via LATERAL" idiom, submitted as SQL text (the one API
    surface the DataFrame-built battery doesn't otherwise exercise).

    Catalyst DE-CORRELATES the lateral: the per-customer LIMIT becomes
    a partitioned row_number window over orders plus one equi-join on
    custkey — no per-row subquery execution, so the 100 TB plan is the
    same two-shuffle shape a hand-written window version gets
    (verified by the plan test). DuckDB runs the identical SQL.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(JOIN_LATERAL_ORACLE)


JOIN_LATERAL_ORACLE = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
"""


# --------------------------------------------------------------------------
# Scalar functions, conditionals, subqueries
# --------------------------------------------------------------------------


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math/date scalar function battery over part+orders.

    Parity: the host-engine scalar surface exercised by the reference's
    types test (SURVEY §2.2 'String/date/math scalar fns').
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("name_snake"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dev"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        (F.col("p_partkey") % 7).alias("key_mod7"),
        F.greatest("p_size", F.lit(25)).alias("size_floor25"),
        F.when(F.col("p_size") > 25, "big").otherwise("small").alias("size_class"),
    )


SCALAR_ORACLE = """
SELECT
  p_partkey,
  UPPER(p_name) AS name_upper,
  LOWER(p_brand) AS brand_lower,
  CAST(LENGTH(p_name) AS INTEGER) AS name_len,
  SUBSTR(p_name, 1, 8) AS name_prefix,
  CONCAT_WS('|', p_brand, p_type) AS brand_type,
  REGEXP_REPLACE(p_name, ' ', '_', 'g') AS name_snake,
  ABS(p_retailprice - 1000.0) AS price_dev,
  CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
  CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
  p_partkey % 7 AS key_mod7,
  CAST(GREATEST(p_size, 25) AS INTEGER) AS size_floor25,
  CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS size_class
FROM part
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal extraction/truncation battery over orders."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).cast("string").alias("month_start"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_date_str"),
    )


DATE_ORACLE = """
SELECT
  o_orderkey,
  CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
  CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
  CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS order_day,
  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
  CAST(CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS VARCHAR) AS month_start,
  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date_str
FROM orders
"""


def case_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (CASE inside SUM/COUNT)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        dsum(
            F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")).otherwise(0.0)
        ).alias("urgent_value"),
    )


CASE_AGG_ORACLE = f"""
SELECT
  CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
  COUNT(*) AS n_orders,
  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
  {oracle_dsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END")} AS urgent_value
FROM orders
GROUP BY 1
"""


def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING on an exact count."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
        .where(F.col("n_orders") >= 15)
    )


HAVING_ORACLE = f"""
SELECT o_custkey, COUNT(*) AS n_orders, {oracle_dsum('o_totalprice')} AS total_spend
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
"""


def correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern: customers above their nation's mean
    balance. Decorrelated Spark-side into an agg + broadcast join — the
    plan Catalyst (and DuckDB) both produce for the correlated SQL.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation_avg = customer.groupBy("c_nationkey").agg(
        davg("c_acctbal").alias("nation_avg")
    )
    return (
        customer.join(F.broadcast(nation_avg), "c_nationkey")
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_name", "c_acctbal", "nation_avg")
    )


CORRELATED_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, nation_avg
FROM customer
JOIN (
  SELECT c_nationkey, {oracle_davg('c_acctbal')} AS nation_avg
  FROM customer GROUP BY c_nationkey
) n USING (c_nationkey)
WHERE c_acctbal > nation_avg
"""


def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery): orders from BUILDING-segment customers (semi join)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return orders.join(
        building, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


IN_SUBQUERY_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


def string_like_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / IN-list / BETWEEN filter battery (pushdown-friendly)."""
    part = load_table(spark, sf_dir, "part")
    return part.where(
        F.col("p_name").like("%ivory%")
        | (
            F.col("p_brand").isin("Brand#11", "Brand#22")
            & F.col("p_size").between(10, 20)
        )
    ).select("p_partkey", "p_name", "p_brand", "p_size")


LIKE_ORACLE = """
SELECT p_partkey, p_name, p_brand, p_size FROM part
WHERE p_name LIKE '%ivory%'
   OR (p_brand IN ('Brand#11', 'Brand#22') AND p_size BETWEEN 10 AND 20)
"""


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order function battery: construction, sort,
    min/max, transform+aggregate fold, filter, membership — the
    nested-type surface Spark adds over the reference's flat model
    (exercised JVM-side; DuckDB list_* functions are the oracle).

    Array-typed outputs are serialized to comma-joined strings on BOTH
    engine and oracle sides: the driver's pandas canonicalizer
    sort_values/hashes rows and raises ``unhashable type: 'list'`` on
    array columns, so the HOF battery stays exercised but the result
    schema is scalar-only."""
    part = load_table(spark, sf_dir, "part")
    arr = F.array(
        F.col("p_size").cast("long"),
        F.length("p_name").cast("long"),
        (F.col("p_partkey") % 10).cast("long"),
    )
    return part.select(
        "p_partkey",
        F.concat_ws(",", F.sort_array(arr).cast("array<string>")).alias("sorted_arr"),
        F.array_max(arr).alias("arr_max"),
        F.array_min(arr).alias("arr_min"),
        F.aggregate(
            F.transform(arr, lambda x: x * 2),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("doubled_sum"),
        F.concat_ws(
            ",", F.filter(arr, lambda x: x % 2 == 0).cast("array<string>")
        ).alias("evens"),
        F.array_contains(arr, F.lit(5)).alias("has_five"),
        F.size(arr).alias("arr_len"),
    )


ARRAY_FUNCTIONS_ORACLE = """
WITH base AS (
  SELECT p_partkey,
         [CAST(p_size AS BIGINT), CAST(LENGTH(p_name) AS BIGINT), p_partkey % 10] AS arr
  FROM part
)
SELECT p_partkey,
       array_to_string(list_sort(arr), ',') AS sorted_arr,
       list_max(arr) AS arr_max,
       list_min(arr) AS arr_min,
       CAST(list_sum(list_transform(arr, x -> x * 2)) AS BIGINT) AS doubled_sum,
       COALESCE(array_to_string(list_filter(arr, x -> x % 2 = 0), ','), '') AS evens,
       list_contains(arr, 5) AS has_five,
       CAST(len(arr) AS INTEGER) AS arr_len
FROM base
"""


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type operator battery: construction (create_map +
    from_json), map_concat merge, element_at lookup, map_keys /
    map_values, map_filter, transform_values, size — the key-value
    surface Spark adds over the reference's flat model.

    Like the array battery, every map-typed output is scalarized
    (sorted-key csv / looked-up values) so the driver's pandas
    canonicalizer can hash rows; the ORACLE recomputes the same
    scalars from the props JSON (DuckDB's MAP constructors differ
    syntactically — value equality is the contract, as everywhere).
    Data contract: props keys must be disjoint from the injected
    'type'/'uid' keys — Spark's map_concat raises DUPLICATE_MAP_KEY
    (loudly) if a fixture change ever violates it — and NULL props
    rows are excluded on both sides (from_json(NULL) and the json_*
    oracle functions disagree on NULL semantics).
    """
    events = load_table(spark, sf_dir, "events").where(
        F.col("props").isNotNull()
    )
    parsed = F.from_json(
        F.col("props"), "map<string,string>"
    ).alias("pm")
    m = F.map_concat(
        F.create_map(
            F.lit("type"), F.col("event_type"),
            F.lit("uid"), F.col("user_id").cast("string"),
        ),
        parsed,
    )
    with_m = events.select("event_id", m.alias("m"))
    return with_m.select(
        "event_id",
        F.size("m").alias("n_entries"),
        F.concat_ws(",", F.array_sort(F.map_keys("m"))).alias("keys_csv"),
        F.element_at(F.col("m"), F.lit("type")).alias("type_val"),
        F.element_at(F.col("m"), F.lit("k")).cast("long").alias("k_val"),
        F.size(
            F.map_filter("m", lambda k, _: k.startswith("t"))
        ).alias("n_t_keys"),
        F.element_at(
            F.transform_values("m", lambda k, v: F.concat(k, F.lit("="), v)),
            F.lit("uid"),
        ).alias("uid_tagged"),
    )


MAP_FUNCTIONS_ORACLE = """
SELECT event_id,
       CAST(2 + len(json_keys(props)) AS INTEGER) AS n_entries,
       array_to_string(
         list_sort(list_concat(json_keys(props), ['type', 'uid'])), ','
       ) AS keys_csv,
       event_type AS type_val,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       CAST(len(list_filter(list_concat(json_keys(props), ['type', 'uid']),
                            k -> k LIKE 't%')) AS INTEGER) AS n_t_keys,
       'uid=' || CAST(user_id AS VARCHAR) AS uid_tagged
FROM events
WHERE props IS NOT NULL
"""


def unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): part's numeric attributes melt into
    (key, attr, value) rows via DataFrame.unpivot — a generate, no
    shuffle."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "attr", "value")


UNPIVOT_ORACLE = """
SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS value FROM part
"""


QUERIES: list[QueryDef] = [
    QueryDef("array_functions", array_functions, ARRAY_FUNCTIONS_ORACLE, "array/HOF battery"),
    QueryDef("map_functions", map_functions, MAP_FUNCTIONS_ORACLE, "map-type operator battery (construct/merge/lookup/filter/transform)"),
    QueryDef("unpivot_part_attrs", unpivot_part_attrs, UNPIVOT_ORACLE, "UNPIVOT wide-to-long"),
    QueryDef("q1_pricing_summary", q1_pricing_summary, Q1_ORACLE, "TPC-H Q1 agg"),
    QueryDef("q3_shipping_priority", q3_shipping_priority, Q3_ORACLE, "TPC-H Q3 join+topk"),
    QueryDef("q4_order_priority", q4_order_priority, Q4_ORACLE, "TPC-H Q4 EXISTS"),
    QueryDef("q5_local_supplier_volume", q5_local_supplier_volume, Q5_ORACLE, "TPC-H Q5 6-way join"),
    QueryDef("q6_revenue_forecast", q6_revenue_forecast, Q6_ORACLE, "TPC-H Q6 filter+agg"),
    QueryDef("q10_returned_items", q10_returned_items, Q10_ORACLE, "TPC-H Q10 topk"),
    QueryDef("q14_promo_revenue", q14_promo_revenue, Q14_ORACLE, "TPC-H Q14 ratio"),
    QueryDef("q18_large_orders", q18_large_orders, Q18_ORACLE, "TPC-H Q18 having-join"),
    QueryDef("topk_orders", topk_orders, TOPK_ORACLE, "order+limit top-k"),
    QueryDef("distinct_projection", distinct_projection, DISTINCT_ORACLE, "DISTINCT"),
    QueryDef("agg_distinct", agg_distinct, AGG_DISTINCT_ORACLE, "COUNT DISTINCT"),
    QueryDef("rollup_returns", rollup_returns, ROLLUP_ORACLE, "ROLLUP"),
    QueryDef("cube_segment_nation", cube_segment_nation, CUBE_ORACLE, "CUBE"),
    QueryDef("setop_union_all", setop_union_all, UNION_ALL_ORACLE, "UNION ALL"),
    QueryDef("setop_intersect", setop_intersect, INTERSECT_ORACLE, "INTERSECT"),
    QueryDef("setop_except", setop_except, EXCEPT_ORACLE, "EXCEPT"),
    QueryDef("join_semi", join_semi, JOIN_SEMI_ORACLE, "left-semi join"),
    QueryDef("join_anti", join_anti, JOIN_ANTI_ORACLE, "left-anti join"),
    QueryDef("join_outer", join_outer, JOIN_OUTER_ORACLE, "left-outer join"),
    QueryDef("join_full_outer", join_full_outer, JOIN_FULL_ORACLE, "full-outer join"),
    QueryDef("join_cross", join_cross, JOIN_CROSS_ORACLE, "cross join"),
    QueryDef("join_lateral_topn", join_lateral_topn, JOIN_LATERAL_ORACLE, "correlated LATERAL top-N per group via the raw SQL surface (Catalyst de-correlates to window+join)"),
    QueryDef("scalar_functions", scalar_functions, SCALAR_ORACLE, "scalar fn battery"),
    QueryDef("date_functions", date_functions, DATE_ORACLE, "temporal fn battery"),
    QueryDef("case_conditional_agg", case_conditional_agg, CASE_AGG_ORACLE, "CASE in agg"),
    QueryDef("having_filter", having_filter, HAVING_ORACLE, "HAVING"),
    QueryDef("correlated_above_avg", correlated_above_avg, CORRELATED_ORACLE, "correlated subquery"),
    QueryDef("in_subquery", in_subquery, IN_SUBQUERY_ORACLE, "IN subquery"),
    QueryDef("string_like_filters", string_like_filters, LIKE_ORACLE, "LIKE/IN/BETWEEN"),
]

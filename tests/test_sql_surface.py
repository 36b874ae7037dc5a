"""SQL-string entry point: the same queries users type into the
reference's host engine must run through ``spark.sql`` over the
registered views and produce exactly the DataFrame results.

Only dialect-portable oracles are run (no QUALIFY / VARCHAR casts /
DuckDB list functions); the full oracle battery runs on DuckDB via
tools/parity.py.
"""

import math

import pytest

from duckdb_gsheets_spark.operators import all_queries
from duckdb_gsheets_spark.plans.catalog import register_views

SF = "/root/testdata/sf0.001"

#: Oracles written in the ANSI subset both engines parse.
PORTABLE = [
    "q1_pricing_summary",
    "q12_priority_class",
    "q13_customer_distribution",
    "q19_disjunctive_predicates",
    "having_filter",
    "join_semi",
    "join_anti",
    "setop_union_all",
    "setop_intersect",
    "setop_except",
    "in_subquery",
    "string_like_filters",
    "events_histogram",
    "events_anomaly_zscore",
]


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


def _multiset(df):
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    return sorted(
        (tuple(_norm(x) for x in r) for r in rows),
        key=lambda t: tuple(repr(x) for x in t),
    )


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_matches_dataframe(spark, name):
    register_views(spark, SF)
    qd = all_queries()[name]
    via_sql = spark.sql(qd.oracle)
    via_df = qd.spark_fn(spark, SF)
    assert _multiset(via_sql) == _multiset(via_df)


def test_driver_contract_shape():
    """__spark_entry__ exposes the exact driver contract: every oracle
    belongs to a registered query, the checked window is exactly 50
    oracle-bearing entries occupying the first 50 registry positions,
    and the oracle-less tail sits strictly after the window."""
    import __spark_entry__ as e
    from duckdb_gsheets_spark.operators import all_queries
    from duckdb_gsheets_spark.operators.registry import (
        _ORACLELESS_TAIL,
        _WINDOW,
    )

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(_WINDOW) == 50  # the driver checks EXACTLY the first 50
    ordered = list(all_queries())
    assert ordered[:50] == list(_WINDOW)
    registry = all_queries()
    assert all(registry[n].oracle is not None for n in _WINDOW)
    # Oracle-less queries can never burn a checked slot.
    for name in _ORACLELESS_TAIL:
        assert ordered.index(name) >= len(ordered) - len(_ORACLELESS_TAIL)
    # Every oracle is non-empty SQL mentioning a registered table.
    for name, sql in oracles.items():
        assert isinstance(sql, str) and len(sql.strip()) > 20, name

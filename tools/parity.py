"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf dir, then compares row count, column names,
**pandas dtypes** and the order-insensitive multiset of row values
(exact equality — floats must match bitwise, which the determinism
contract guarantees).

Both sides are materialized through pandas (Spark ``toPandas()`` vs
DuckDB ``.df()``) because that is the driver's canonicalization path
and its value hash is dtype-sensitive: a DuckDB HUGEINT that pandas
widens to float64 hash-mismatches a Spark int64 even when every value
is equal (this exact bug shipped in round 2 — ``list_sum`` over a
BIGINT list).  Datetime columns compare on the ``datetime64`` kind
only (Arrow gives ns units, DuckDB us) — the determinism contract
casts temporal outputs to strings anyway, so a native datetime column
in a checked query is already suspect.

Usage: python tools/parity.py [sf_dir] [query ...]
       python tools/parity.py --window [sf_dir]   # first-50 driver gate
       python tools/parity.py --exclude a,b [sf_dir]  # skip named queries
                                                      # (O(n^2)-oracle shapes
                                                      # at larger SFs)
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from duckdb_gsheets_spark.plans.catalog import TABLES
from duckdb_gsheets_spark.plans.session import get_spark


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    try:
        if pd.isna(v):  # pandas NaT / pd.NA from nullable frames
            return None
    except (TypeError, ValueError):
        pass
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar -> python scalar
        return _norm_cell(v.item())
    return v


def _norm_dtype(dt) -> str:
    s = str(dt)
    if s.startswith("datetime64"):
        return "datetime64"  # unit differs by engine (ns vs us); kind must match
    return s


def _frame_to_multiset(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = (
        tuple(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return sorted(rows, key=lambda t: tuple(repr(x) for x in t))


def _dtype_map(pdf: pd.DataFrame) -> dict[str, str]:
    return {c: _norm_dtype(pdf[c].dtype) for c in pdf.columns}


def main() -> int:
    args = sys.argv[1:]
    window_only = "--window" in args
    args = [a for a in args if a != "--window"]
    excluded: set[str] = set()
    if "--exclude" in args:
        i = args.index("--exclude")
        if i + 1 >= len(args):
            sys.exit("--exclude requires a comma-separated query list")
        excluded = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    if window_only:
        # Simulate the driver's gate exactly: sf0.01 and the first 50
        # registry entries (the checked window). Explicit query names
        # narrow WITHIN the window rather than being discarded.
        if not args:
            sf_dir = "/root/testdata/sf0.01"
        from duckdb_gsheets_spark.operators import all_queries

        window = set(list(all_queries())[:50])
        only = (only & window) if only else window

    import __spark_entry__ as e

    spark = get_spark("parity", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in excluded:
            print(f"skip  {name}: excluded on the command line")
            continue
        checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(
                f"ok    {name}: rows-only ({len(spark_pdf)} rows, "
                f"{time.time()-t0:.1f}s)"
            )
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(ex).__name__}: {ex}")
            continue
        problems = []
        if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
            problems.append(
                f"cols spark={sorted(spark_pdf.columns)} "
                f"duck={sorted(duck_pdf.columns)}"
            )
        if len(spark_pdf) != len(duck_pdf):
            problems.append(
                f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}"
            )
        if not problems:
            sd, dd = _dtype_map(spark_pdf), _dtype_map(duck_pdf)
            drift = {
                c: (sd[c], dd[c]) for c in sd if sd[c] != dd[c]
            }
            if drift:
                problems.append(f"dtype drift (spark, duck): {drift}")
        if not problems:
            ms = _frame_to_multiset(spark_pdf)
            md = _frame_to_multiset(duck_pdf)
            if ms != md:
                diff = [(a, b) for a, b in zip(ms, md) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(
                f"ok    {name}: {len(spark_pdf)} rows match "
                f"({time.time()-t0:.1f}s)"
            )
    print(f"\n{checked - len(failures)}/{checked} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

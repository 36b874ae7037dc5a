"""Connector micro-bench (BASELINE.md §2 last row): 10k-row write +
full readback through the gsheets DataSource against the in-process
fake Sheets server — mirrors the reference's largest live workload
(`test/sql/copy_multiple_vectors.test:42-47`).

Reports rows/s for each direction and asserts the HTTP-call-count
formulas the reference fixes:

* write: ceil(rows/2048) values.append + 1 clear + 1 header append
  (+1 metadata GET)  — `src/gsheets_copy.cpp:100-119,180`
* read:  1 values GET + 1 metadata GET — `src/gsheets_read.cpp:165,187`

Usage: python tools/connector_bench.py [n_rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")

from duckdb_gsheets_spark.plans.session import get_spark
from duckdb_gsheets_spark.sources.gsheets import read_gsheet, write_gsheet
from tests.fake_sheets import FakeSheetsServer

BATCH_ROWS = 2048  # reference STANDARD_VECTOR_SIZE (src/gsheets_read.cpp:44)


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    server = FakeSheetsServer().start()
    try:
        store = server.new_spreadsheet("bench-sheet")
        store.add_sheet("Sheet1", [])
        spark = get_spark("connector-bench", shuffle_partitions=8)
        df = spark.range(n_rows).selectExpr("id AS a")

        server.request_log.clear()
        t0 = time.perf_counter()
        write_gsheet(
            df.coalesce(1), "bench-sheet", token="t", api_base=server.base_url
        )
        write_s = time.perf_counter() - t0
        write_calls = list(server.request_log)

        server.request_log.clear()
        t0 = time.perf_counter()
        back = read_gsheet(spark, "bench-sheet", token="t", api_base=server.base_url)
        n_read = back.count()
        read_s = time.perf_counter() - t0
        read_calls = list(server.request_log)

        assert n_read == n_rows, f"readback {n_read} != {n_rows}"
        appends = [p for m, p in write_calls if ":append" in p]
        clears = [p for m, p in write_calls if ":clear" in p]
        expected_appends = math.ceil(n_rows / BATCH_ROWS) + 1  # +1 header
        assert len(appends) == expected_appends, (
            f"{len(appends)} appends != ceil({n_rows}/{BATCH_ROWS})+header"
        )
        assert len(clears) == 1, f"{len(clears)} clears != 1 (overwrite_sheet)"
        values_gets = [
            p for m, p in read_calls if m == "GET" and "/values/" in p
        ]
        assert len(values_gets) == 1, f"{len(values_gets)} values GETs != 1"

        print(
            json.dumps(
                {
                    "metric": "connector_roundtrip",
                    "rows": n_rows,
                    "write_rows_per_sec": round(n_rows / write_s, 1),
                    "read_rows_per_sec": round(n_rows / read_s, 1),
                    "write_http_calls": len(write_calls),
                    "read_http_calls": len(read_calls),
                    "appends": len(appends),
                    "unit": "rows/sec",
                }
            )
        )
        return 0
    finally:
        server.stop()


if __name__ == "__main__":
    raise SystemExit(main())

"""End-to-end wide-type write→read round-trip through the connector —
mirrors test/sql/types.test:22-51: a DataFrame spanning the engine's
scalar types goes out through the sink and comes back with the
documented BOOLEAN/DOUBLE/VARCHAR collapse (plus the ``all_varchar``
force-to-string variant).

The collapse rule (SURVEY §2.1 T1/T2): booleans survive as BOOLEAN
(Sheets' USER_ENTERED parsing canonicalizes them to TRUE/FALSE —
emulated by the fake server), every numeric — integer widths, floats,
decimals — becomes DOUBLE (the sheet stores a number; the first-row
predicate can't tell widths apart), and everything else (dates,
timestamps, text) collapses to VARCHAR.
"""

from datetime import date, datetime
from decimal import Decimal

from duckdb_gsheets_spark.sources.gsheets import read_gsheet, write_gsheet


def url_for(sid: str) -> str:
    return f"https://docs.google.com/spreadsheets/d/{sid}/edit"


WIDE_SCHEMA = (
    "bool boolean, tiny tinyint, small smallint, i int, big bigint, "
    "f float, d double, dec decimal(18,6), dt date, ts timestamp, "
    "s string, maybe string"
)

ROWS = [
    (
        False,
        -128,
        -32768,
        -2147483648,
        -9223372036854775808,
        -3.5,
        -1.7976931348623157e308,
        Decimal("-123456789012.654321"),
        date(1990, 1, 31),
        datetime(2000, 1, 2, 3, 4, 5),
        "plain text",
        None,  # blank first cell → VARCHAR column
    ),
    (
        True,
        127,
        32767,
        2147483647,
        9223372036854775807,
        3.5,
        1.7976931348623157e308,
        Decimal("987654321098.123456"),
        date(2038, 12, 31),
        datetime(2038, 1, 19, 3, 14, 7),
        "2nd row",
        "present",
    ),
]


def _roundtrip(spark, sheets_server, **read_opts):
    sid = f"types-{len(sheets_server.stores)}"
    sheets_server.new_spreadsheet(sid).add_sheet("Sheet1", [[]])
    df = spark.createDataFrame(ROWS, WIDE_SCHEMA).coalesce(1)
    write_gsheet(
        df,
        url_for(sid),
        token="test-token",
        api_base=sheets_server.base_url,
    )
    return read_gsheet(
        spark,
        url_for(sid),
        token="test-token",
        api_base=sheets_server.base_url,
        **read_opts,
    )


def test_wide_types_collapse_on_roundtrip(spark, sheets_server):
    """types.test:22-45: write the wide frame, read it back, assert
    the three-type collapse and the exact surviving values."""
    back = _roundtrip(spark, sheets_server)
    assert [f.name for f in back.schema.fields] == [
        "bool", "tiny", "small", "i", "big", "f", "d", "dec", "dt",
        "ts", "s", "maybe",
    ]
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "boolean",  # TRUE/FALSE cells
        "double", "double", "double", "double", "double", "double",
        "double",   # decimals are numbers in a sheet
        "string",   # dates stringify
        "string",   # timestamps stringify
        "string",
        "string",   # blank first data cell → VARCHAR
    ]
    rows = back.collect()
    assert len(rows) == 2
    lo, hi = rows
    assert lo.bool is False and hi.bool is True
    # Numerics round-trip through str() → double: exact for anything
    # a double represents, widened for int64 extremes (same collapse
    # as the reference: -9.22337e+18 in types.test:45).
    assert lo.tiny == -128.0 and hi.tiny == 127.0
    assert lo.i == -2147483648.0 and hi.i == 2147483647.0
    assert lo.big == float(str(-9223372036854775808))
    assert hi.big == float(str(9223372036854775807))
    assert lo.f == -3.5 and hi.f == 3.5  # exact dyadics survive float32
    assert lo.d == -1.7976931348623157e308
    assert lo.dec == float(str(Decimal("-123456789012.654321")))
    # Temporal + text columns come back as their canonical strings.
    assert lo.dt == "1990-01-31" and hi.dt == "2038-12-31"
    assert lo.ts == "2000-01-02 03:04:05"
    assert hi.ts == "2038-01-19 03:14:07"
    assert lo.s == "plain text"
    assert lo.maybe is None and hi.maybe == "present"


def test_wide_types_all_varchar_roundtrip(spark, sheets_server):
    """types.test:46-51: the all_varchar escape hatch returns every
    column as VARCHAR with the raw cell text — full-precision
    integers, canonical TRUE/FALSE."""
    back = _roundtrip(spark, sheets_server, all_varchar=True)
    assert [f.dataType.simpleString() for f in back.schema.fields] == (
        ["string"] * 12
    )
    lo, hi = back.collect()
    assert lo.bool == "FALSE" and hi.bool == "TRUE"
    # VARCHAR keeps what double cannot: the full int64 digits.
    assert lo.big == "-9223372036854775808"
    assert hi.big == "9223372036854775807"
    assert lo.dec == "-123456789012.654321"
    assert hi.dt == "2038-12-31"
    assert lo.maybe is None  # empty cell → NULL even as VARCHAR

"""URL/id extraction — parity with src/gsheets_utils.cpp behavior."""

import pytest

from duckdb_gsheets_spark.sources.gsheets.urls import (
    extract_sheet_id,
    extract_sheet_range,
    extract_spreadsheet_id,
    random_state,
    url_encode,
)

SHEET_URL = (
    "https://docs.google.com/spreadsheets/d/11QdEasMWbETbFVxry-SsD8jVcdYIT1zBQszcF84MdE8"
    "/edit?gid=644613997#gid=644613997"
)


def test_id_from_url():
    assert (
        extract_spreadsheet_id(SHEET_URL)
        == "11QdEasMWbETbFVxry-SsD8jVcdYIT1zBQszcF84MdE8"
    )


def test_id_from_bare_id():
    assert extract_spreadsheet_id("abc-DEF_123") == "abc-DEF_123"


def test_id_failure_raises():
    with pytest.raises(ValueError):
        extract_spreadsheet_id("https://example.com/nothing/here")


def test_gid_extraction():
    assert extract_sheet_id(SHEET_URL) == 644613997
    assert extract_sheet_id("https://docs.google.com/spreadsheets/d/x/edit") is None


def test_range_extraction():
    url = "https://docs.google.com/spreadsheets/d/x/edit?range=B1%3AC6&gid=2"
    assert extract_sheet_range(url) == "B1:C6"
    assert extract_sheet_range("https://docs.google.com/spreadsheets/d/x") is None


def test_url_encode():
    assert url_encode("My Sheet!A1:B2") == "My%20Sheet%21A1%3AB2"
    assert url_encode("plain-name_1.~") == "plain-name_1.~"


def test_random_state():
    a, b = random_state(), random_state()
    assert a != b
    assert len(a) == 32

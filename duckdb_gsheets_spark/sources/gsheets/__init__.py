from duckdb_gsheets_spark.sources.gsheets.api import (
    read_gsheet,
    register,
    register_sheet_catalog,
    sheets,
    sheets_sql,
    write_gsheet,
    write_gsheet_stream,
)
from duckdb_gsheets_spark.sources.gsheets.datasource import GSheetsDataSource

__all__ = [
    "GSheetsDataSource",
    "read_gsheet",
    "register",
    "register_sheet_catalog",
    "sheets",
    "sheets_sql",
    "write_gsheet",
    "write_gsheet_stream",
]

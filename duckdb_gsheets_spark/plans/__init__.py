from duckdb_gsheets_spark.plans.session import get_spark
from duckdb_gsheets_spark.plans.catalog import TABLES, load_table, register_views

__all__ = ["get_spark", "TABLES", "load_table", "register_views"]

from duckdb_gsheets_spark.operators.registry import QueryDef, all_queries

__all__ = ["QueryDef", "all_queries"]

from duckdb_gsheets_spark.operators.registry import QueryDef, all_queries


def clear_plan_caches() -> None:
    """Drop the session-scoped shared-artifact memos (the prefix-ANN
    exact baseline and the suffix-sort spine). The memos exist so
    composed audits and the correctness harness build each shared
    index ONCE per (session, corpus); bench.py calls this before
    every timed run so benchmark numbers are cold-plan honest — a
    memo hit would time a no-op."""
    from duckdb_gsheets_spark.operators import dedup, similarity

    similarity._EXACT_BASELINE_CACHE.clear()
    dedup._LRS_SPINE_CACHE.clear()


__all__ = ["QueryDef", "all_queries", "clear_plan_caches"]

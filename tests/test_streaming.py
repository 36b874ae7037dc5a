"""Structured Streaming ops verified against their batch twins."""

from duckdb_gsheets_spark.streaming.events_stream import (
    batch_equivalent_hourly,
    streaming_dedupe_count,
    streaming_hourly_counts,
)

SF = "/root/testdata/sf0.001"


def test_streaming_hourly_matches_batch(spark):
    stream_result = streaming_hourly_counts(spark, SF)
    batch_result = batch_equivalent_hourly(spark, SF)
    s = {
        (r.hour_start, r.event_type): (r.n_events, r.sum_value)
        for r in stream_result.collect()
    }
    b = {
        (r.hour_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch_result.collect()
    }
    assert s == b
    assert len(s) > 0


def test_streaming_dedupe(spark):
    out = streaming_dedupe_count(spark, SF).collect()
    n = out[0].n_distinct_events
    import duckdb

    expected = duckdb.sql(
        f"SELECT COUNT(DISTINCT event_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert n == expected

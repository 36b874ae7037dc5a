"""User-facing helpers: registration + replacement-scan parity.

The reference rewrites a bare spreadsheet URL in FROM into
``read_gsheet(url)`` (src/gsheets_extension.cpp:29-46). Spark has no
replacement-scan hook, so the parity surface is:

* ``register(spark)`` once, then
  ``spark.read.format("gsheets").load(url)``, or
* ``read_gsheet(spark, url, **options)`` — the table function shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from duckdb_gsheets_spark.sources.gsheets.datasource import GSheetsDataSource


def register(spark: SparkSession) -> None:
    """Register the ``gsheets`` format on this session."""
    spark.dataSource.register(GSheetsDataSource)


def read_gsheet(spark: SparkSession, url_or_id: str, **options) -> DataFrame:
    """``read_gsheet(...)`` table-function parity
    (src/gsheets_extension.cpp:55-59): named params header, sheet,
    range, all_varchar plus credential options."""
    register(spark)
    reader = spark.read.format("gsheets")
    for key, value in options.items():
        reader = reader.option(key, value)
    return reader.load(url_or_id)


def write_gsheet(
    df: DataFrame,
    url_or_id: str,
    mode: str = "overwrite",
    parallel: bool = True,
    **options,
) -> None:
    """COPY TO parity: ``COPY t TO '<url>' (FORMAT gsheet, ...)``.

    The reference appends one ordered stream
    (src/gsheets_copy.cpp:129-181). The sink buffers each partition's
    stringified rows in its commit message and the driver appends them
    once, in partition order, at commit time — so row order matches the
    frame's partition order even with parallel tasks, and task
    retries/speculative attempts can never double-append.

    ``parallel`` is kept for API compatibility: ``False`` coalesces to
    one partition first, which is never needed for ordering anymore and
    only serializes the (cheap) stringify stage.
    """
    register(df.sparkSession)
    if not parallel:
        df = df.coalesce(1)
    writer = df.write.format("gsheets").mode(mode)
    for key, value in options.items():
        writer = writer.option(key, value)
    writer.save(url_or_id)


def write_gsheet_stream(
    stream_df: DataFrame,
    url_or_id: str,
    checkpoint_dir: str,
    mode: str = "overwrite",
    timeout_s: float = 120.0,
    **options,
):
    """Streaming sink twin of :func:`write_gsheet`: continuously COPY
    a streaming DataFrame TO a sheet via ``foreachBatch`` — the shape
    a live ingest-gate dashboard publishes through (the reference's
    COPY is batch-only; this is the Spark-native extension of the same
    sink, one ordered append stream per micro-batch,
    src/gsheets_copy.cpp:129-181 semantics per batch).

    Batch 0 honors ``mode`` (overwrite clears + writes the header
    once); every later micro-batch appends rows only — the multi-batch
    header-once invariant the batch writer already enforces per job,
    extended across the stream's lifetime. Durability contract: the
    checkpoint gives foreachBatch at-least-once delivery, and Sheets
    appends are not idempotent — a batch retried after a sink-side
    failure can duplicate rows, exactly as re-running the reference's
    COPY would. Dedup by key belongs in the sheet's consumer or in a
    pre-sink ``dropDuplicates``.

    Runs with an ``availableNow`` trigger (drain-all semantics, same
    as the other streaming twins) and blocks until the drain finishes;
    returns the terminated query handle.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Batch 0 always runs, even empty: the overwrite/clear +
        # header must happen exactly once at stream start, not at the
        # first batch that happens to carry rows (an empty batch 0
        # followed by data would otherwise append headerless rows
        # onto stale sheet content).
        if batch_df.isEmpty() and batch_id > 0:
            return
        batch_mode = mode if batch_id == 0 else "append"
        batch_opts = dict(options)
        if batch_id > 0:
            batch_opts["header"] = False
        write_gsheet(batch_df, url_or_id, mode=batch_mode, **batch_opts)

    query = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise TimeoutError(
            f"gsheets streaming sink did not drain within {timeout_s}s; "
            "query stopped — re-trigger with the same checkpoint to resume"
        )
    return query

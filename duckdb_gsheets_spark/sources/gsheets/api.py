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


def write_gsheet(df: DataFrame, url_or_id: str, mode: str = "overwrite", **options) -> None:
    """COPY TO parity: ``COPY t TO '<url>' (FORMAT gsheet, ...)``."""
    register(df.sparkSession)
    writer = df.write.format("gsheets").mode(mode)
    for key, value in options.items():
        writer = writer.option(key, value)
    writer.save(url_or_id)

"""Composed training-data pipeline: the flagship end-to-end shape a
100 TB corpus build actually runs — language filter → quality gate →
exact dedup → per-source corpus stats — as ONE declarative plan, so
Catalyst fuses the scalar stages into the scan and the whole thing
costs two shuffles (dedup fingerprint, final rollup).

Every stage reuses the oracle-locked builders from functions.text and
operators.determinism, so the full composition stays hash-checkable
against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_gsheets_spark.functions import text as T
from duckdb_gsheets_spark.operators.determinism import davg, oracle_davg
from duckdb_gsheets_spark.operators.registry import QueryDef
from duckdb_gsheets_spark.plans.catalog import load_table

QUALITY_THRESHOLD = 0.5


def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """English, above-threshold-quality, deduplicated corpus rolled up
    per source: docs kept, BPE tokens kept, mean quality.

    Dedup keeps the lowest doc_id per fingerprint (deterministic
    survivor rule) — expressed as ``min_by`` aggregation rather than a
    row_number window: the hash aggregate combines map-side, so the
    fingerprint shuffle carries one partial row per (fingerprint,
    mapper) instead of the window's full sorted row stream.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    enriched = docs.select(
        "doc_id",
        "source",
        T.language_id(c).alias("detected_lang"),
        T.quality_score(c).alias("quality"),
        T.fingerprint(c).alias("fingerprint"),
        T.bpe_token_count(c).alias("n_bpe_tokens"),
    )
    gated = enriched.where(
        (F.col("detected_lang") == "en")
        & (F.col("quality") >= QUALITY_THRESHOLD)
    )
    survivors = gated.groupBy("fingerprint").agg(
        F.min_by(
            F.struct("source", "quality", "n_bpe_tokens"), F.col("doc_id")
        ).alias("s")
    )
    return survivors.groupBy(F.col("s.source").alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("s.n_bpe_tokens").cast("long").alias("total_bpe_tokens"),
        F.round(davg(F.col("s.quality"), scale=6), 6).alias("mean_quality"),
    )


PIPELINE_ORACLE = f"""
WITH enriched AS (
  SELECT
    doc_id, source,
    {T.oracle_language_id()} AS detected_lang,
    {T.oracle_quality_score()} AS quality,
    {T.oracle_fingerprint()} AS fingerprint,
    len(regexp_extract_all(text, '{T.BPE_TOKEN_PATTERN}')) AS n_bpe_tokens
  FROM documents
), gated AS (
  SELECT * FROM enriched
  WHERE detected_lang = 'en' AND quality >= {QUALITY_THRESHOLD}
), survivors AS (
  SELECT * FROM gated
  QUALIFY ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       ROUND({oracle_davg('quality', scale=6)}, 6) AS mean_quality
FROM survivors
GROUP BY source
"""


QUERIES: list[QueryDef] = [
    QueryDef(
        "pipeline_training_corpus",
        pipeline_training_corpus,
        PIPELINE_ORACLE,
        "lang→quality→dedup→rollup composed pipeline",
    ),
]

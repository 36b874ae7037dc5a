"""Python UDTF coverage (SURVEY §2.2 'UDF/UDAF/UDTF').

One representative table function: sentence splitting — a one-to-many
row expansion whose logic (regex segmentation with positions) is
awkward as pure column expressions but natural as a UDTF. The same
segmentation is expressible in DuckDB SQL via regexp_split_to_array +
unnest WITH ORDINALITY, so the operator stays oracle-checked.

UDTFs are row-at-a-time Python — the slow path by design (SURVEY §4);
use them for logic that genuinely needs per-row Python, and prefer
mapInPandas (operators/multimodal.py) when Arrow batching fits.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_gsheets_spark.operators.registry import QueryDef
from duckdb_gsheets_spark.plans.catalog import load_table

#: Delimiter-consuming split (no lookbehind — DuckDB's RE2 lacks it);
#: terminal punctuation is dropped from all but the last sentence.
SENTENCE_SPLIT = r"[.!?]+\s+"


class SentenceSplit:
    """UDTF: (doc_id, text) → one row per sentence with its index."""

    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        # strip(" ") — spaces only, matching DuckDB TRIM's default set;
        # Python's bare strip() also removes \n/\t and would shift
        # sentence boundaries vs the oracle on newline-trailing text.
        for idx, sentence in enumerate(re.split(SENTENCE_SPLIT, text.strip(" "))):
            if sentence:
                yield doc_id, idx, sentence, len(sentence)


def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation of the corpus via a Python UDTF, rolled
    up per document so the result is small and order-free."""
    from pyspark.sql.functions import udtf

    sentence_split = udtf(
        SentenceSplit,
        returnType="doc_id long, sentence_idx int, sentence string, n_chars int",
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spark.udtf.register("sentence_split", sentence_split)
    docs.createOrReplaceTempView("udtf_docs_input")
    sentences = spark.sql(
        """
        SELECT s.doc_id, s.sentence_idx, s.sentence, s.n_chars
        FROM udtf_docs_input d,
             LATERAL sentence_split(d.doc_id, d.text) s
        """
    )
    return sentences.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sentences"),
        F.max("n_chars").alias("longest_sentence_chars"),
        F.sum("n_chars").cast("long").alias("total_sentence_chars"),
    )


UDTF_SENTENCES_ORACLE = r"""
WITH sentences AS (
  SELECT doc_id, unnest(regexp_split_to_array(TRIM(text), '[.!?]+\s+')) AS sentence
  FROM documents
)
SELECT doc_id,
       COUNT(*) AS n_sentences,
       CAST(MAX(LENGTH(sentence)) AS INTEGER) AS longest_sentence_chars,
       CAST(SUM(LENGTH(sentence)) AS BIGINT) AS total_sentence_chars
FROM sentences
WHERE sentence <> ''
GROUP BY doc_id
"""


QUERIES: list[QueryDef] = [
    QueryDef("udtf_sentences", udtf_sentences, UDTF_SENTENCES_ORACLE, "Python UDTF sentence split"),
]

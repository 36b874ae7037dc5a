"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is a
deterministic fake (documented below) and the REAL parts — binary
column handling, metadata schema, partition-preserving mapInPandas
plumbing, batch shapes — are exercised and tested. A production
deployment swaps ``_decode_payload`` for a real codec; nothing else
changes.

The payloads here are synthesized from ``documents.text`` (UTF-8
bytes) since the test corpus ships no real media; at 100 TB the same
schema holds pointer columns (path/offset/len) instead of inline blobs
for payloads above a few MB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from duckdb_gsheets_spark.operators.determinism import round_half_away
from duckdb_gsheets_spark.operators.registry import QueryDef
from duckdb_gsheets_spark.plans.catalog import load_table

FORMATS = ("png", "jpeg", "wav")

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_byte", DoubleType()),
        StructField("n_frames", IntegerType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → multimodal table: binary payload + typed metadata.

    Schema: (doc_id, payload binary, format string, meta struct).
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.element_at(
            F.array(*[F.lit(f) for f in FORMATS]),
            (F.col("doc_id") % len(FORMATS) + 1).cast("int"),
        ).alias("format"),
        F.struct(
            F.length(F.col("text").cast("binary")).alias("byte_len"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata scan over the media table — JVM-only, oracle-checked:
    proves the binary column + struct plumbing without decoding."""
    media = media_table(spark, sf_dir)
    return media.select(
        "doc_id",
        "format",
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.origin").alias("origin"),
    )


MULTIMODAL_META_ORACLE = f"""
SELECT
  doc_id,
  ['png', 'jpeg', 'wav'][CAST(doc_id % {len(FORMATS)} AS INTEGER) + 1] AS format,
  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
  source AS origin
FROM documents
"""


def multimodal_payload_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-free corruption screen: per-payload BYTE-level Shannon
    entropy (nats). Needs no codec, so it runs on any format —
    truncated/zero-padded payloads score near 0, encrypted or
    bit-rotted blobs score near ln(256), healthy media sits in a
    per-format band; the triage that decides what is worth sending to
    the (expensive) decode stage. Byte histograms ride the JVM: the
    payload hexes and splits into 2-char chunks — no Python touches
    the bytes.

    Determinism: text_char_entropy's 1e-9-grid ln contract, so the
    per-payload sum is exact integer arithmetic in both engines.
    Shapes: narrow hex+chunk explode, one (doc, byte) count
    (map-side-combined), a doc-co-located total join, one rollup.
    """
    media = media_table(spark, sf_dir)
    bytes_ = media.where(F.col("payload").isNotNull()).select(
        "doc_id",
        "format",
        F.explode(
            F.expr(
                "transform(sequence(0, (length(hex(payload)) div 2) - 1), "
                "i -> substring(hex(payload), i * 2 + 1, 2))"
            )
        ).alias("b"),
    )
    counts = bytes_.groupBy("doc_id", "format", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct_bytes"),
    )
    term = F.col("c") * F.round(
        F.log(F.col("c").cast("double") / F.col("n").cast("double")) * 1e9
    ).cast("long")
    return (
        counts.join(totals, "doc_id")
        .groupBy("doc_id", "format", "n", "n_distinct_bytes")
        .agg(
            F.round(
                -F.sum(term).cast("double") / 1e9 / F.col("n").cast("double"),
                6,
            ).alias("byte_entropy")
        )
        .select(
            "doc_id",
            "format",
            F.col("n").alias("n_bytes"),
            "n_distinct_bytes",
            "byte_entropy",
        )
    )


PAYLOAD_ENTROPY_ORACLE = f"""
WITH media AS (
  SELECT doc_id,
         ['png', 'jpeg', 'wav'][CAST(doc_id % {len(FORMATS)} AS INTEGER) + 1]
           AS format,
         hex(encode(text)) AS h
  FROM documents WHERE text IS NOT NULL
), bytes_ AS (
  SELECT doc_id, format,
         unnest(list_transform(range(0, CAST(length(h) // 2 AS BIGINT)),
                               i -> substring(h, CAST(i * 2 + 1 AS INTEGER), 2)))
           AS b
  FROM media
), counts AS (
  SELECT doc_id, format, b, COUNT(*) AS c
  FROM bytes_ GROUP BY doc_id, format, b
), totals AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
         COUNT(*) AS n_distinct_bytes
  FROM counts GROUP BY doc_id
)
SELECT c.doc_id, c.format,
       t.n AS n_bytes,
       t.n_distinct_bytes,
       ROUND(-CAST(SUM(c.c * CAST(ROUND(LN(CAST(c.c AS DOUBLE)
                / CAST(t.n AS DOUBLE)) * 1e9) AS BIGINT)) AS DOUBLE)
             / 1e9 / CAST(t.n AS DOUBLE), 6) AS byte_entropy
FROM counts c JOIN totals t USING (doc_id)
GROUP BY c.doc_id, c.format, t.n, t.n_distinct_bytes
"""


def _decode_payload(payload: bytes, fmt: str) -> tuple[int, int, float, int]:
    """Deterministic fake decoder: (width, height, mean_byte, n_frames).

    A real deployment replaces this with PIL/libav decoding; the
    signature and the Spark-side plumbing are the contract. Raises
    ``NotImplementedError`` for formats outside the fake's domain, the
    same way a codec-missing build would.
    """
    if fmt not in FORMATS:
        raise NotImplementedError(f"no codec for format {fmt!r}")
    n = len(payload)
    width = (n % 64) + 1
    height = (n // 64) + 1
    mean_byte = (sum(payload) / n) if n else 0.0
    n_frames = 1 if fmt in ("png", "jpeg") else (n % 100) + 1
    return width, height, round_half_away(mean_byte, 6), n_frames


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch in → feature frame out."""
    for batch in batches:
        rows = [
            (int(doc_id), len(payload), *_decode_payload(bytes(payload), fmt))
            for doc_id, payload, fmt in zip(
                batch["doc_id"], batch["payload"], batch["format"]
            )
        ]
        out = pd.DataFrame(
            rows,
            columns=["doc_id", "byte_len", "width", "height", "mean_byte", "n_frames"],
        )
        yield out


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    The decode itself is the deterministic fake above (no codecs in
    this container); the distributed plumbing — binary columns through
    Arrow, per-partition batch iteration, typed output schema — is
    real — and because the payload bytes are documents.text UTF-8,
    the fake's arithmetic is oracle-checked value-exactly in SQL.
    """
    media = media_table(spark, sf_dir)
    return media.select("doc_id", "payload", "format").mapInPandas(
        _decode_batches, schema=DECODE_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_width", IntegerType()),
        StructField("resized_height", IntegerType()),
        StructField("scale", DoubleType()),
    ]
)

RESIZE_TARGET = 32  # longest-edge target for the fake resampler


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode dims, compute the longest-edge-bound
    target size (the real resample is codec work — stubbed)."""
    for batch in batches:
        rows = []
        for doc_id, payload, fmt in zip(
            batch["doc_id"], batch["payload"], batch["format"]
        ):
            width, height, _, _ = _decode_payload(bytes(payload), fmt)
            scale = min(1.0, RESIZE_TARGET / max(width, height))
            rows.append(
                (
                    int(doc_id),
                    width,
                    height,
                    max(1, int(width * scale)),
                    max(1, int(height * scale)),
                    round_half_away(scale, 6),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "width", "height",
                "resized_width", "resized_height", "scale",
            ],
        )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning via mapInPandas: per-image target dims bounded
    by a longest-edge cap (the pixel resample itself is the stubbed
    codec step). Oracle-checked (see MULTIMODAL_RESIZE_ORACLE)."""
    media = media_table(spark, sf_dir)
    return media.select("doc_id", "payload", "format").mapInPandas(
        _resize_batches, schema=RESIZE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_feature", DoubleType()),
    ]
)

FRAME_STRIDE = 10  # keep every 10th frame


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker demonstrating one-to-many output: each wav
    payload expands to its strided frame rows (audio/video sampling
    shape); image formats contribute their single frame."""
    for batch in batches:
        out_doc, out_idx, out_feat = [], [], []
        for doc_id, payload, fmt in zip(
            batch["doc_id"], batch["payload"], batch["format"]
        ):
            data = bytes(payload)
            _, _, _, n_frames = _decode_payload(data, fmt)
            for idx in range(0, n_frames, FRAME_STRIDE):
                # Fake per-frame feature: mean of the frame's byte slice.
                lo = (idx * len(data)) // max(1, n_frames)
                hi = ((idx + 1) * len(data)) // max(1, n_frames)
                chunk = data[lo:hi] or b"\0"
                out_doc.append(int(doc_id))
                out_idx.append(idx)
                out_feat.append(round_half_away(sum(chunk) / len(chunk), 6))
        yield pd.DataFrame(
            {"doc_id": out_doc, "frame_idx": out_idx, "frame_feature": out_feat}
        )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling via mapInPandas (one-to-many row fanout
    — the video/audio sampling shape). Oracle-checked."""
    media = media_table(spark, sf_dir)
    return media.select("doc_id", "payload", "format").mapInPandas(
        _frame_sample_batches, schema=FRAME_SCHEMA
    )


#: Shared oracle CTEs: payload bytes are documents.text UTF-8, so the
#: fake decoder's arithmetic is reproducible in SQL — byte values come
#: from the hex dump two chars at a time ('0x' cast), the same trick
#: the portable sketch hashes use. A real-codec deployment would drop
#: these oracles and lean on pytest with golden media files instead.
_MM_CTE = f"""
mm AS (
  SELECT doc_id,
         ['png', 'jpeg', 'wav'][CAST(doc_id % {len(FORMATS)} AS INTEGER) + 1]
           AS fmt,
         octet_length(encode(text)) AS n,
         hex(encode(text)) AS hx
  FROM documents
), mmf AS (
  SELECT doc_id, fmt, n,
         CASE WHEN fmt IN ('png', 'jpeg') THEN 1
              ELSE CAST(n % 100 AS INTEGER) + 1 END AS nf,
         list_transform(range(1, n + 1),
           i -> CAST('0x' || substr(hx, 2*i - 1, 2) AS BIGINT)) AS bl
  FROM mm
)"""

MULTIMODAL_DECODE_ORACLE = f"""
WITH {_MM_CTE}
SELECT doc_id,
       CAST(n AS INTEGER) AS byte_len,
       CAST(n % 64 AS INTEGER) + 1 AS width,
       CAST(n // 64 AS INTEGER) + 1 AS height,
       CASE WHEN n = 0 THEN 0.0
            ELSE ROUND(CAST(list_sum(bl) AS DOUBLE) / n, 6) END AS mean_byte,
       CAST(nf AS INTEGER) AS n_frames
FROM mmf
"""

MULTIMODAL_RESIZE_ORACLE = f"""
WITH {_MM_CTE},
dims AS (
  SELECT doc_id,
         CAST(n % 64 AS INTEGER) + 1 AS w,
         CAST(n // 64 AS INTEGER) + 1 AS h
  FROM mm
), scaled AS (
  SELECT doc_id, w, h,
         LEAST(1.0, {RESIZE_TARGET}.0 / GREATEST(w, h)) AS s
  FROM dims
)
SELECT doc_id, w AS width, h AS height,
       CAST(GREATEST(1, CAST(TRUNC(w * s) AS INTEGER)) AS INTEGER)
         AS resized_width,
       CAST(GREATEST(1, CAST(TRUNC(h * s) AS INTEGER)) AS INTEGER)
         AS resized_height,
       ROUND(s, 6) AS scale
FROM scaled
"""

MULTIMODAL_FRAME_ORACLE = f"""
WITH {_MM_CTE},
fr AS (
  SELECT doc_id, n, GREATEST(1, nf) AS nf, bl,
         unnest(range(0, nf, {FRAME_STRIDE})) AS frame_idx
  FROM mmf
), sliced AS (
  SELECT doc_id, frame_idx, bl,
         (frame_idx * n) // nf AS lo,
         ((frame_idx + 1) * n) // nf AS hi
  FROM fr
)
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CASE WHEN hi <= lo THEN 0.0
            ELSE ROUND(CAST(list_sum(list_slice(bl, lo + 1, hi)) AS DOUBLE)
                       / (hi - lo), 6) END AS frame_feature
FROM sliced
"""


def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the BINARY payload column — the media twin of
    :func:`operators.dedup.dedup_exact`. Image/audio corpora are
    dup-dense (mirrors, re-uploads, thumbnails of the same asset), and
    the first pass is always a byte-identical collapse: group by
    (format, md5(payload)), keep the smallest doc_id, report copies
    and the bytes a dedup would reclaim.

    One shuffle on the 16-byte content hash (uniform by construction);
    the payload itself never shuffles — only its hash and length leave
    the scan stage. At 100 TB with pointer columns the same plan holds
    with md5 precomputed at ingest.
    """
    media = media_table(spark, sf_dir)
    return (
        media.select(
            "doc_id",
            "format",
            F.md5("payload").alias("payload_md5"),
            F.col("meta.byte_len").alias("byte_len"),
        )
        .groupBy("format", "payload_md5")
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            (
                F.max("byte_len").cast("long")
                * (F.count(F.lit(1)) - F.lit(1))
            ).alias("reclaimable_bytes"),
        )
    )


MULTIMODAL_DEDUP_ORACLE = f"""
SELECT
  ['png', 'jpeg', 'wav'][CAST(doc_id % {len(FORMATS)} AS INTEGER) + 1] AS format,
  md5(text) AS payload_md5,
  MIN(doc_id) AS survivor_doc_id,
  COUNT(*) AS n_copies,
  CAST(MAX(octet_length(encode(text))) AS BIGINT) * (COUNT(*) - 1)
    AS reclaimable_bytes
FROM documents
GROUP BY 1, 2
"""


#: Byte budget per output shard for the manifest packer (small so the
#: fixture produces multi-shard manifests; a real run uses ~1 GiB).
SHARD_BUDGET_BYTES = 8_192


def multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-packing MANIFEST for the media corpus: greedy in-order
    packing of payloads into ``SHARD_BUDGET_BYTES`` bins per format —
    the WebDataset-style tar-shard layout step every multimodal
    training pipeline runs before upload. A payload's shard is its
    running byte offset div the budget (oversized payloads span
    shards; the boundary item starts the overflow — same streaming-
    packer rule as curation.pack_sequences).

    The manifest (not the repack) is the deliverable: per (format,
    shard) the item count, byte total, and id range a downstream
    copy job needs. One shuffle on format; the running sum and the
    rollup share the partitioning. Payload bytes never move — only
    their lengths do.
    """
    media = media_table(spark, sf_dir)
    sized = media.where(F.col("payload").isNotNull()).select(
        "format", "doc_id", F.length("payload").alias("n_bytes")
    )
    binned = sized.select(
        "format",
        "doc_id",
        "n_bytes",
        F.expr(
            f"div(sum(n_bytes) over "
            f"(partition by format order by doc_id "
            f"rows between unbounded preceding and current row) - n_bytes, "
            f"{SHARD_BUDGET_BYTES})"
        ).alias("shard_id"),
    )
    return binned.groupBy("format", "shard_id").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("shard_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


MULTIMODAL_SHARD_ORACLE = f"""
WITH sized AS (
  SELECT ['png', 'jpeg', 'wav'][CAST(doc_id % {len(FORMATS)} AS INTEGER) + 1]
           AS format,
         doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents WHERE text IS NOT NULL
), binned AS (
  SELECT format, doc_id, n_bytes,
         CAST((SUM(n_bytes) OVER (PARTITION BY format ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bytes)
           // {SHARD_BUDGET_BYTES} AS BIGINT) AS shard_id
  FROM sized
)
SELECT format, shard_id, COUNT(*) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM binned
GROUP BY format, shard_id
"""


def pipeline_media_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed MEDIA corpus build: byte-identical payload dedup
    (min-doc_id survivor per (format, content hash)) feeding the
    byte-budget shard packer — the end-to-end prep a multimodal
    training run actually ships, with the duplicate count carried
    into the manifest so the shard report also documents what dedup
    dropped.

    Shapes compose without new wide work: one content-hash shuffle
    (hash+length only — payload bytes never move), then the per-format
    running-sum window and the |shards| rollup from
    :func:`multimodal_shard_manifest`.
    """
    media = media_table(spark, sf_dir).where(F.col("payload").isNotNull())
    survivors = (
        media.select(
            "doc_id",
            "format",
            F.md5("payload").alias("payload_md5"),
            F.col("meta.byte_len").alias("byte_len"),
        )
        .groupBy("format", "payload_md5")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.max("byte_len").cast("long").alias("n_bytes"),
            (F.count(F.lit(1)) - F.lit(1)).alias("n_dropped"),
        )
    )
    binned = survivors.select(
        "format",
        "doc_id",
        "n_bytes",
        "n_dropped",
        F.expr(
            f"div(sum(n_bytes) over "
            f"(partition by format order by doc_id "
            f"rows between unbounded preceding and current row) - n_bytes, "
            f"{SHARD_BUDGET_BYTES})"
        ).alias("shard_id"),
    )
    return binned.groupBy("format", "shard_id").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("shard_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.sum("n_dropped").alias("n_dupes_dropped"),
    )


PIPELINE_MEDIA_ORACLE = f"""
WITH mp_surv AS (
  SELECT ['png', 'jpeg', 'wav'][CAST(doc_id % {len(FORMATS)} AS INTEGER) + 1]
           AS format,
         md5(text) AS payload_md5,
         MIN(doc_id) AS doc_id,
         CAST(MAX(octet_length(encode(text))) AS BIGINT) AS n_bytes,
         COUNT(*) - 1 AS n_dropped
  FROM documents WHERE text IS NOT NULL
  GROUP BY 1, 2
), mp_binned AS (
  SELECT format, doc_id, n_bytes, n_dropped,
         CAST((SUM(n_bytes) OVER (PARTITION BY format ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bytes)
           // {SHARD_BUDGET_BYTES} AS BIGINT) AS shard_id
  FROM mp_surv
)
SELECT format, shard_id, COUNT(*) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
       CAST(SUM(n_dropped) AS BIGINT) AS n_dupes_dropped
FROM mp_binned
GROUP BY format, shard_id
"""


QUERIES: list[QueryDef] = [
    QueryDef("multimodal_metadata", multimodal_metadata, MULTIMODAL_META_ORACLE, "binary+struct metadata"),
    QueryDef("pipeline_media_corpus", pipeline_media_corpus, PIPELINE_MEDIA_ORACLE, "composed media build: payload dedup feeding byte-budget shards"),
    QueryDef("multimodal_shard_manifest", multimodal_shard_manifest, MULTIMODAL_SHARD_ORACLE, "WebDataset-style byte-budget shard packing manifest"),
    QueryDef("multimodal_payload_dedup", multimodal_payload_dedup, MULTIMODAL_DEDUP_ORACLE, "byte-identical media dedup on the binary payload hash"),
    QueryDef("multimodal_decode_features", multimodal_decode_features, MULTIMODAL_DECODE_ORACLE, "mapInPandas decode stub"),
    QueryDef("multimodal_resize", multimodal_resize, MULTIMODAL_RESIZE_ORACLE, "mapInPandas resize planning"),
    QueryDef("multimodal_frame_sample", multimodal_frame_sample, MULTIMODAL_FRAME_ORACLE, "one-to-many frame sampling"),
    QueryDef("multimodal_payload_entropy", multimodal_payload_entropy, PAYLOAD_ENTROPY_ORACLE, "decode-free byte-entropy corruption screen (JVM hex chunking)"),
]

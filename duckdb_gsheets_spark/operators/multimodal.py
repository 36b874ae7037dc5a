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
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from duckdb_gsheets_spark.operators.determinism import round_half_away
from duckdb_gsheets_spark.operators.registry import QueryDef
from duckdb_gsheets_spark.plans.catalog import fan_out, load_table

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
    return media_from_docs(load_table(spark, sf_dir, "documents"))


def media_from_docs(docs: DataFrame) -> DataFrame:
    """The media projection over any documents-shaped frame —
    streaming readers and planted pytest corpora route through the
    same mapping as the batch table (format by doc_id, payload =
    text bytes)."""
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

    Round 14 (guide §4.2): the byte histogram is ONE numpy
    ``bincount`` per payload inside an Arrow-batched pandas UDF —
    the previous shape materialized a 2-char string PER BYTE through
    a transform+explode (1.5M rows at sf0.1), shuffled them twice
    and joined the totals back (5.6 s exec-only for a per-row
    reduction). Exactness is unchanged: counts are exact ints, the
    ln grid-snap replicates ``F.round``'s half-away rule sign-aware,
    and numpy's ln is the same libm the DuckDB oracle calls (the
    JVM's was the odd one out). Zero shuffles, zero joins.
    """
    import numpy as np

    @pandas_udf(
        StructType(
            [
                StructField("n_bytes", LongType()),
                StructField("n_distinct_bytes", LongType()),
                StructField("byte_entropy", DoubleType()),
            ]
        )
    )
    def ent(p: pd.Series) -> pd.DataFrame:
        out_n, out_d, out_e = [], [], []
        for buf in p:
            a = np.frombuffer(buf, dtype=np.uint8)
            n = int(a.size)
            if n == 0:
                # Defensive only: the caller filters zero-length
                # payloads (the oracle's byte-unnest emits no rows for
                # them, so they have no output row on either engine);
                # an empty histogram here must not divide by zero.
                out_n.append(0)
                out_d.append(0)
                out_e.append(0.0)
                continue
            c = np.bincount(a)
            c = c[c > 0].astype(np.int64)
            t = np.log(c / n) * 1e9
            t = np.where(t >= 0.0, np.floor(t + 0.5), np.ceil(t - 0.5))
            s = int((c * t.astype(np.int64)).sum())
            out_n.append(n)
            out_d.append(int(c.size))
            out_e.append(round_half_away(-s / 1e9 / n, 6))
        return pd.DataFrame(
            {"n_bytes": out_n, "n_distinct_bytes": out_d, "byte_entropy": out_e}
        )

    media = fan_out(media_table(spark, sf_dir))
    return (
        media.where(
            F.col("payload").isNotNull() & (F.length("payload") > 0)
        )
        .select("doc_id", "format", ent(F.col("payload")).alias("e"))
        .select(
            "doc_id",
            "format",
            "e.n_bytes",
            "e.n_distinct_bytes",
            "e.byte_entropy",
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


#: Perceptual near-dup constants. The signature is a 60-bit SimHash
#: over CONTENT-DEFINED CHUNKS of the payload byte stream (LBFS/rsync
#: anchoring: a chunk boundary wherever the byte bigram ≡ 0 mod
#: PHASH_ANCHOR_MOD, ~61-byte average chunks), banded 4×15 bits for
#: LSH blocking exactly like operators.dedup.dedup_simhash.
#:
#: Why not a POSITIONAL aHash/dHash grid (mean-thresholded fixed
#: cells)? Measured on this corpus: a byte-insertion shifts every
#: downstream byte, so fixed-position cells decorrelate — known
#: near-dup pairs landed at Hamming 16–42 of 60, indistinguishable
#: from the background's 25–34. Content-defined anchors re-align
#: after any local edit (the rsync trick), so an edit perturbs only
#: the chunks it touches; SimHash over the surviving chunk set moves
#: ≤ a few bits. For REAL media the signature slot is where a
#: PIL-backed aHash plugs in (pixel grids are alignment-stable, the
#: positional device works there); the banding / verification /
#: calibration layers below are signature-agnostic.
PHASH_BITS = 60
PHASH_BANDS = 4
PHASH_MAX_HAMMING = 6
PHASH_ANCHOR_MOD = 61
PHASH_MIN_BYTES = 60


def _pband_val(sig: F.Column, b: int) -> F.Column:
    """Band ``b``'s 15-bit slice of the 60-bit perceptual signature."""
    width = PHASH_BITS // PHASH_BANDS
    mask = (1 << width) - 1
    return F.shiftrightunsigned(sig, b * width).bitwiseAND(F.lit(mask))


def phash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, format, pmd5, sig): 60-bit perceptual signature per
    payload (see the PHASH constant block for the design rationale).

    Shape: per-byte hex explode (the payload_entropy device — all
    JVM), anchor filter (~1/PHASH_ANCHOR_MOD of positions survive), a
    per-doc lag window over the sparse anchor rows to cut chunk
    spans, one md5 per chunk, and a single groupBy(doc) with 60 vote
    sums — the simhash_signatures assembly. Every gated doc gets a
    signature: the payload tail past the last anchor is always a
    chunk (docs with no anchors hash as one whole-payload chunk).
    Docs under PHASH_MIN_BYTES are excluded (too short for a stable
    signature; byte-identical dedup still covers them). Eagerly
    localCheckpoint'ed — the pair query consumes it 4+ times.
    """
    return _phash_sigs_from_media(
        media_table(spark, sf_dir)
    ).localCheckpoint(eager=True)


def _phash_sigs_from_media(media: DataFrame) -> DataFrame:
    """Signature builder over any media-shaped frame (the streaming
    gate feeds it the static corpus slice; pytest feeds it planted
    payloads). No checkpoint here — callers decide.

    Round 14: this is now the per-row HOF formulation (one projection
    per payload — anchor scan, chunk spans, md5 votes and the final
    signature all fold inside array expressions). The per-byte
    posexplode + window formulation it replaces carried the FULL hex
    payload on every exploded row and shuffled anchor rows through a
    per-doc window — O(bytes²) materialized per payload and a shuffle
    the HOF form doesn't pay; measured 4.7→3.9 s at sf0.1 on sub-KB
    payloads and asymptotically worse on real media. The old builder
    survives as :func:`_phash_sigs_explode_reference`, pinned equal
    by the streaming formulation-equivalence pytest. ``fan_out``
    because the signature is compute-dense and the low-SF payload
    scan is 1-3 partitions (4.3→0.9 s; no-op at scale, pass-through
    on streaming frames)."""
    media = fan_out(media).where(F.col("payload").isNotNull())
    base = media.select(
        "doc_id",
        "format",
        F.hex("payload").alias("h"),
        F.md5("payload").alias("pmd5"),
        F.expr("length(hex(payload)) div 2").cast("long").alias("n"),
    ).where(F.col("n") >= PHASH_MIN_BYTES)
    return (
        base.withColumn("_pends", F.expr(_PHASH_ROW_ENDS_SQL))
        .select(
            "doc_id",
            "format",
            F.expr(_PHASH_ROW_SIG_SQL).alias("sig"),
            "pmd5",
            F.col("n").alias("n_bytes"),
        )
    )


def _phash_sigs_explode_reference(media: DataFrame) -> DataFrame:
    """The round-13 per-byte posexplode + window signature builder,
    kept ONLY as the pytest formulation-equivalence reference for the
    HOF production path (tests/test_streaming.py) — the two must stay
    bit-identical. Not reachable from any registered query."""
    media = media.where(F.col("payload").isNotNull())
    base = media.select(
        "doc_id",
        "format",
        F.hex("payload").alias("h"),
        F.md5("payload").alias("pmd5"),
        F.expr("length(hex(payload)) div 2").cast("long").alias("n"),
    ).where(F.col("n") >= PHASH_MIN_BYTES)
    idx = base.select(
        "doc_id",
        "format",
        "h",
        "n",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n") - 2)
        ).alias("i"),
    )
    anchors = idx.where(
        F.conv(F.expr("substring(h, cast(i * 2 + 1 as int), 4)"), 16, 10)
        .cast("long")
        % PHASH_ANCHOR_MOD
        == 0
    ).select("doc_id", "format", "h", "n", "i")
    # chunk END positions: every anchor plus the unconditional final
    # byte (n−1 is never an anchor position — anchors live in
    # 0..n−2), so the spans disjointly cover the payload and an
    # anchor-less payload yields exactly one whole-payload chunk.
    ends = anchors.unionAll(
        base.select(
            "doc_id", "format", "h", "n", (F.col("n") - 1).alias("i")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("i")
    spans = ends.select(
        "doc_id",
        "format",
        "h",
        "i",
        F.lag("i", 1, -1).over(w).alias("prev"),
    )
    chunks = spans.select(
        "doc_id",
        "format",
        F.expr(
            "substring(h, cast((prev + 1) * 2 + 1 as int), "
            "cast((i - prev) * 2 as int))"
        ).alias("ck"),
    )
    from duckdb_gsheets_spark.functions import portable_hash as PH

    hashed = chunks.select(
        "doc_id", "format", PH.tok_hash60(F.col("ck")).alias("hc")
    )
    votes = hashed.groupBy("doc_id", "format").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("hc"), k).bitwiseAND(F.lit(1)) == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"v{k}")
            for k in range(PHASH_BITS)
        ]
    )
    sig = F.lit(0).cast("long")
    for k in range(PHASH_BITS):
        sig = sig + F.expr(f"shiftleft(cast(v{k} > 0 as long), {k})")
    return votes.select("doc_id", "format", sig.alias("sig")).join(
        base.select("doc_id", "pmd5", F.col("n").alias("n_bytes")), "doc_id"
    )


#: Per-row (no explode, no shuffle) form of the SAME signature, for
#: streaming frames where the batch builder's posexplode + window +
#: groupBy are unavailable: content-defined chunk ends via
#: filter-over-sequence, chunk spans via zip_with against the
#: shifted ends array, and the 60 SimHash votes folded through ONE
#: aggregate whose accumulator is the vote array. Interpreted HOF
#: lambdas (the portable_hash cost note) — fine for an ingest gate's
#: per-row arrival rate; the batch builder stays the bulk path. The
#: batch-equality test pins this formulation bit-identical to
#: phash_signatures.
_PHASH_ROW_SIG_SQL = f"""
aggregate(
  transform(
    aggregate(
      zip_with(
        _pends,
        concat(array(-1L), slice(_pends, 1, size(_pends) - 1)),
        (e, p) -> cast(conv(substring(md5(
            substring(h, cast((p + 1) * 2 + 1 as int),
                      cast((e - p) * 2 as int))
          ), 1, 15), 16, 10) as long)
      ),
      array_repeat(0L, {PHASH_BITS}),
      (acc, hc) -> transform(
        acc, (v, k) -> v + if((shiftright(hc, k) & 1) = 1, 1L, -1L)
      )
    ),
    (v, k) -> if(v > 0, shiftleft(1L, k), 0L)
  ),
  0L, (a, x) -> a + x
)
"""

_PHASH_ROW_ENDS_SQL = f"""
concat(
  filter(
    sequence(0L, n - 2),
    i -> cast(conv(substring(h, cast(i * 2 + 1 as int), 4), 16, 10)
              as long) % {PHASH_ANCHOR_MOD} = 0
  ),
  array(n - 1)
)
"""


def phash_row_signatures(media: DataFrame) -> DataFrame:
    """(doc_id, format, sig) via the per-row HOF signature — works on
    STREAMING frames (stateless projection). Same gating as the batch
    builder: NULL payloads and payloads under PHASH_MIN_BYTES drop."""
    return (
        media.where(F.col("payload").isNotNull())
        .select(
            "doc_id",
            "format",
            F.hex("payload").alias("h"),
            F.expr("length(hex(payload)) div 2").cast("long").alias("n"),
        )
        .where(F.col("n") >= PHASH_MIN_BYTES)
        .withColumn("_pends", F.expr(_PHASH_ROW_ENDS_SQL))
        .select(
            "doc_id",
            "format",
            F.expr(_PHASH_ROW_SIG_SQL).alias("sig"),
        )
    )


def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL near-dup pairs over the media payloads — the layer
    byte-identical dedup (:func:`multimodal_payload_dedup`) cannot
    see: payloads that differ in a few bytes but share almost all
    content chunks. Same-format pairs only (comparing a png to a wav
    perceptually is meaningless), Hamming ≤ PHASH_MAX_HAMMING.

    Plan shape is dedup_simhash's collapsed form — NEVER all-pairs:
    identical signatures pair through a (format, sig) equality
    self-join; the band join runs over DISTINCT (format, sig) rows
    with first-matching-band exactly-once emission; doc pairs fan
    back out through two sig→doc joins (output-bound). Output:
    (doc_a, doc_b, format, hamming, byte_identical) — the
    byte_identical flag is what the calibration audit splits on
    (byte-identical payloads always hash to the same signature, so
    every hamming > 0 pair is by construction perceptual-only).
    """
    return _phash_pairs(phash_signatures(spark, sf_dir))


def _phash_close_sig_pairs(sigs: DataFrame) -> DataFrame:
    """Banded LSH candidates over DISTINCT (format, sig) rows with
    first-matching-band exactly-once emission, Hamming-verified to
    (format, sig_a, sig_b, hamming) with 0 < hamming ≤
    PHASH_MAX_HAMMING. Shared by the pair query (which fans doc pairs
    back out) and the cluster labeling (which keeps the collapsed
    sig-level edges — never quadratic in copy count)."""
    distinct_sigs = sigs.select("format", "sig").distinct()
    bands = distinct_sigs.select(
        "format",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        _pband_val(F.col("sig"), b).alias("band_val"),
                    )
                    for b in range(PHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("format", "sig", "band.band_idx", "band.band_val")
    no_earlier_match = F.lit(True)
    for b in range(1, PHASH_BANDS):
        earlier_differs = F.lit(True)
        for i in range(b):
            earlier_differs = earlier_differs & (
                _pband_val(F.col("a.sig"), i)
                != _pband_val(F.col("b.sig"), i)
            )
        no_earlier_match = F.when(
            F.col("band_idx") == b, earlier_differs
        ).otherwise(no_earlier_match)
    sig_pairs = (
        bands.alias("a")
        .join(bands.alias("b"), ["format", "band_idx", "band_val"])
        .where((F.col("a.sig") < F.col("b.sig")) & no_earlier_match)
        .select(
            "format",
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return sig_pairs.select(
        "format", "sig_a", "sig_b", hamming.alias("hamming")
    ).where(
        (F.col("hamming") > 0) & (F.col("hamming") <= PHASH_MAX_HAMMING)
    )


def _phash_pairs(sigs: DataFrame) -> DataFrame:
    """Doc-level near-dup pairs over a signature frame — the
    registered query's body, parameterized so the persisted signature
    index (plans.phash_index) can feed it directly."""
    within = (
        sigs.alias("a")
        .join(
            sigs.alias("b"),
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.format") == F.col("b.format")),
        )
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.format").alias("format"),
            F.lit(0).alias("hamming"),
            (F.col("a.pmd5") == F.col("b.pmd5")).cast("int").alias(
                "byte_identical"
            ),
        )
    )
    close_sigs = _phash_close_sig_pairs(sigs)
    across = (
        close_sigs.join(
            sigs.select(
                F.col("format").alias("format"),
                F.col("sig").alias("sig_a"),
                F.col("doc_id").alias("da"),
            ),
            ["format", "sig_a"],
        )
        .join(
            sigs.select(
                F.col("format").alias("format"),
                F.col("sig").alias("sig_b"),
                F.col("doc_id").alias("db"),
            ),
            ["format", "sig_b"],
        )
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "format",
            "hamming",
            # hamming > 0 ⇒ different payload bytes by construction
            F.lit(0).alias("byte_identical"),
        )
    )
    return within.unionAll(across)


def multimodal_phash_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Calibration audit of perceptual vs BYTE-IDENTICAL dedup: per
    Hamming distance over the emitted near-dup pairs, how many pairs
    byte dedup would also have caught (``n_byte_identical``) vs the
    near-dups ONLY the perceptual hash sees (``n_perceptual_only`` —
    the added recall that justifies running the perceptual pass).
    ≤ PHASH_MAX_HAMMING+1 rows; reuses the registered pair query so
    it audits exactly what runs."""
    pairs = multimodal_phash_neardup(spark, sf_dir)
    return (
        pairs.groupBy("hamming")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("byte_identical").alias("n_byte_identical"),
            (F.count(F.lit(1)) - F.sum("byte_identical")).alias(
                "n_perceptual_only"
            ),
        )
        .orderBy("hamming")
    )


def _phash_cluster_labels(sigs: DataFrame) -> DataFrame:
    """(doc_id, format, n_bytes, comp) — transitive perceptual
    near-dup labels over the banded pair graph, with the
    identical-signature COLLAPSE the lexical family uses
    (dedup._minhash_cluster_labels): payloads sharing a (format, sig)
    form a clique by construction, so min-label propagation runs over
    one REPRESENTATIVE per signature group (min doc_id) and members
    inherit the rep's component — the edge set stays linear in
    distinct signatures, never quadratic in copy count. The labeling
    equals the full doc-graph closure exactly: a group is always one
    cluster, rep edges exist iff the member edges exist (same
    signatures), and each rep is already its group's minimum so comp
    stays the cluster-wide min doc_id."""
    from duckdb_gsheets_spark.operators.dedup import connected_components

    groups = sigs.groupBy("format", "sig").agg(F.min("doc_id").alias("gid"))
    members = sigs.select("doc_id", "format", "n_bytes", "sig").join(
        groups, ["format", "sig"]
    )
    edges = (
        _phash_close_sig_pairs(sigs)
        .join(
            groups.select(
                "format",
                F.col("sig").alias("sig_a"),
                F.col("gid").alias("doc_a"),
            ),
            ["format", "sig_a"],
        )
        .join(
            groups.select(
                "format",
                F.col("sig").alias("sig_b"),
                F.col("gid").alias("doc_b"),
            ),
            ["format", "sig_b"],
        )
        .select("doc_a", "doc_b")
    )
    comp_reps = connected_components(
        edges, groups.select(F.col("gid").alias("doc_id"))
    )
    return members.join(
        comp_reps.withColumnRenamed("doc_id", "gid"), "gid"
    ).select("doc_id", "format", "n_bytes", "comp")


def multimodal_phash_clusters(
    spark: SparkSession, sf_dir: str, sigs: DataFrame | None = None
) -> DataFrame:
    """Transitive perceptual near-dup CLUSTERS over the media
    payloads — the pair query emits edges; real media dedup collapses
    A≈B≈C into one component even when A and C never band-collide.
    Output: every signature-bearing payload with its cluster id
    (= min doc_id in the component), the cluster size, and the
    structural-representative flag. ``sigs`` lets a production
    session ride the persisted signature index
    (plans.phash_index.load_phash_index) instead of rebuilding.
    Payloads under PHASH_MIN_BYTES have no signature and are absent
    by design — byte-identical dedup still covers them."""
    if sigs is None:
        sigs = phash_signatures(spark, sf_dir)
    labels = _phash_cluster_labels(sigs)
    sizes = labels.groupBy("comp").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labels.join(sizes, "comp").select(
        "doc_id",
        "format",
        F.col("comp").alias("cluster_id"),
        "cluster_size",
        (F.col("doc_id") == F.col("comp")).alias("is_rep"),
    )


def multimodal_phash_survivor(
    spark: SparkSession, sf_dir: str, sigs: DataFrame | None = None
) -> DataFrame:
    """Best-copy ELECTION over the perceptual clusters — the media
    twin of dedup_quality_survivor: within each transitive component,
    keep the copy with the MOST payload bytes (the decode-free
    fidelity proxy: among perceptual near-dups, the longest payload
    is the least-truncated/highest-bitrate copy), doc_id ascending
    tiebreak — a total order, so both engines elect the same
    survivor. Ledger per format: payloads seen, survivors kept,
    copies dropped, and the exact bytes kept vs dropped — the
    storage-savings evidence a media dedup pass ships with.

    Shapes, sized for 100 TB: the component window partitions on the
    cluster label (groups are duplicate-multiplicity-sized) and the
    rollup is |formats| rows; everything else is the cluster
    labeling's collapsed graph. Rides the persisted signature index
    via ``sigs`` like the cluster query."""
    if sigs is None:
        sigs = phash_signatures(spark, sf_dir)
    from pyspark.sql import Window

    labels = _phash_cluster_labels(sigs)
    w = Window.partitionBy("comp").orderBy(F.desc("n_bytes"), "doc_id")
    ranked = labels.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("format")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("rk") == 1, 1).otherwise(0)).alias(
                "n_survivors"
            ),
            F.sum(F.when(F.col("rk") > 1, 1).otherwise(0)).alias(
                "n_dropped"
            ),
            F.sum(
                F.when(F.col("rk") == 1, F.col("n_bytes")).otherwise(0)
            ).alias("kept_bytes"),
            F.sum(
                F.when(F.col("rk") > 1, F.col("n_bytes")).otherwise(0)
            ).alias("dropped_bytes"),
        )
        .orderBy("format")
    )


def _phash_pairs_sql() -> str:
    """DuckDB CTE chain mirroring phash_signatures → band blocking →
    Hamming verification (the _simhash_pairs_sql pattern, applied to
    the payload-chunk signature)."""
    from duckdb_gsheets_spark.functions import portable_hash as PH

    width = PHASH_BITS // PHASH_BANDS
    mask = (1 << width) - 1
    votes = ",\n    ".join(
        f"SUM(CASE WHEN (hc >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS v{k}"
        for k in range(PHASH_BITS)
    )
    terms = "\n     + ".join(
        f"CASE WHEN v{k} > 0 THEN CAST({1 << k} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END"
        for k in range(PHASH_BITS)
    )
    band_rows = ", ".join(f"({b})" for b in range(PHASH_BANDS))

    def bv(side: str, i: int) -> str:
        return f"(({side}.sig >> {width * i}) & {mask})"

    first_band = []
    for b in range(PHASH_BANDS):
        if b == 0:
            cond = "TRUE"
        else:
            cond = " AND ".join(
                f"{bv('a', i)} != {bv('b', i)}" for i in range(b)
            )
        first_band.append(f"WHEN a.band_idx = {b} THEN ({cond})")
    no_earlier = "CASE " + " ".join(first_band) + " END"
    return f"""
mmp_base AS MATERIALIZED (
  SELECT doc_id,
         ['png', 'jpeg', 'wav'][CAST(doc_id % {len(FORMATS)} AS INTEGER) + 1]
           AS format,
         hex(encode(text)) AS h,
         md5(text) AS pmd5,
         CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents
  WHERE text IS NOT NULL
    AND octet_length(encode(text)) >= {PHASH_MIN_BYTES}
), mmp_idx AS (
  SELECT doc_id, format, h, n,
         unnest(range(0, n - 1)) AS i
  FROM mmp_base
), mmp_anchor AS (
  SELECT doc_id, format, h, n, i FROM mmp_idx
  WHERE CAST('0x' || substring(h, CAST(i * 2 + 1 AS INTEGER), 4) AS BIGINT)
        % {PHASH_ANCHOR_MOD} = 0
), mmp_ends AS (
  SELECT doc_id, format, h, n, i FROM mmp_anchor
  UNION ALL
  SELECT doc_id, format, h, n, n - 1 AS i FROM mmp_base
), mmp_span AS (
  SELECT doc_id, format, h, i,
         LAG(i, 1, CAST(-1 AS BIGINT))
           OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM mmp_ends
), mmp_chunk AS (
  SELECT doc_id, format,
         substring(h, CAST((prev + 1) * 2 + 1 AS INTEGER),
                   CAST((i - prev) * 2 AS INTEGER)) AS ck
  FROM mmp_span
), mmp_hashed AS (
  SELECT doc_id, format, {PH.oracle_tok_hash60("ck")} AS hc
  FROM mmp_chunk
), mmp_votes AS (
  SELECT doc_id, format,
    {votes}
  FROM mmp_hashed GROUP BY doc_id, format
), mmp_sigs AS MATERIALIZED (
  SELECT v.doc_id, v.format,
    ({terms}) AS sig,
    b.pmd5, b.n
  FROM mmp_votes v JOIN mmp_base b USING (doc_id)
), mmp_within AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.format AS format,
         0 AS hamming,
         CAST(a.pmd5 = b.pmd5 AS INTEGER) AS byte_identical
  FROM mmp_sigs a JOIN mmp_sigs b
    ON a.sig = b.sig AND a.format = b.format AND a.doc_id < b.doc_id
), mmp_distinct AS (
  SELECT DISTINCT format, sig FROM mmp_sigs
), mmp_bands AS MATERIALIZED (
  SELECT format, sig, band_idx,
         (sig >> ({width} * band_idx)) & {mask} AS band_val
  FROM mmp_distinct CROSS JOIN (VALUES {band_rows}) bs(band_idx)
), mmp_sig_pairs AS (
  SELECT a.format AS format, a.sig AS sig_a, b.sig AS sig_b,
         CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
  FROM mmp_bands a JOIN mmp_bands b
    ON a.format = b.format AND a.band_idx = b.band_idx
   AND a.band_val = b.band_val AND a.sig < b.sig
  WHERE {no_earlier}
), mmp_close AS MATERIALIZED (
  SELECT format, sig_a, sig_b, hamming FROM mmp_sig_pairs
  WHERE hamming > 0 AND hamming <= {PHASH_MAX_HAMMING}
), mmp_across AS (
  SELECT LEAST(da.doc_id, db.doc_id) AS doc_a,
         GREATEST(da.doc_id, db.doc_id) AS doc_b,
         c.format AS format, c.hamming,
         0 AS byte_identical
  FROM mmp_close c
  JOIN mmp_sigs da ON da.sig = c.sig_a AND da.format = c.format
  JOIN mmp_sigs db ON db.sig = c.sig_b AND db.format = c.format
), mmp_pairs AS (
  SELECT * FROM mmp_within UNION ALL SELECT * FROM mmp_across
)"""


MULTIMODAL_PHASH_ORACLE = f"""
WITH {_phash_pairs_sql()}
SELECT doc_a, doc_b, format, hamming, byte_identical FROM mmp_pairs
"""


#: Shared recursive min-label closure over the emitted pair set (the
#: dedup family's cc_walk device). The doc-level walk over mmp_pairs
#: equals the Spark side's rep-collapsed propagation exactly: within
#: pairs connect each identical-signature clique, across pairs carry
#: the same close-sig adjacency the rep edges carry.
_PHASH_CC_SQL = """pc_sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM mmp_pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM mmp_pairs
), pc_walk(doc_id, comp) AS (
  SELECT doc_id, doc_id FROM mmp_sigs
  UNION
  SELECT s.src, w.comp FROM pc_sym s JOIN pc_walk w ON s.dst = w.doc_id
), pc_labels AS (
  SELECT doc_id, MIN(comp) AS comp FROM pc_walk GROUP BY doc_id
)"""


MULTIMODAL_PHASH_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_phash_pairs_sql()},
{_PHASH_CC_SQL},
pc_sizes AS (
  SELECT comp, COUNT(*) AS cluster_size FROM pc_labels GROUP BY comp
)
SELECT l.doc_id, g.format, l.comp AS cluster_id, z.cluster_size,
       l.doc_id = l.comp AS is_rep
FROM pc_labels l
JOIN mmp_sigs g ON g.doc_id = l.doc_id
JOIN pc_sizes z ON z.comp = l.comp
"""


MULTIMODAL_PHASH_SURVIVOR_ORACLE = f"""
WITH RECURSIVE {_phash_pairs_sql()},
{_PHASH_CC_SQL},
ps_ranked AS (
  SELECT g.doc_id, g.format, g.n, l.comp,
         ROW_NUMBER() OVER (
           PARTITION BY l.comp ORDER BY g.n DESC, g.doc_id) AS rk
  FROM pc_labels l JOIN mmp_sigs g ON g.doc_id = l.doc_id
)
SELECT format,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_survivors,
       CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(SUM(CASE WHEN rk = 1 THEN n ELSE 0 END) AS BIGINT)
         AS kept_bytes,
       CAST(SUM(CASE WHEN rk > 1 THEN n ELSE 0 END) AS BIGINT)
         AS dropped_bytes
FROM ps_ranked
GROUP BY format
ORDER BY format
"""


MULTIMODAL_PHASH_CALIBRATION_ORACLE = f"""
WITH {_phash_pairs_sql()}
SELECT hamming,
       COUNT(*) AS n_pairs,
       CAST(SUM(byte_identical) AS BIGINT) AS n_byte_identical,
       COUNT(*) - CAST(SUM(byte_identical) AS BIGINT)
         AS n_perceptual_only
FROM mmp_pairs
GROUP BY hamming
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
    # -- round-13 additions --
    QueryDef(
        "multimodal_phash_neardup",
        multimodal_phash_neardup,
        MULTIMODAL_PHASH_ORACLE,
        "perceptual media near-dup pairs: SimHash over content-defined "
        "payload chunks, Hamming-banded LSH (never all-pairs)",
    ),
    QueryDef(
        "multimodal_phash_calibration",
        multimodal_phash_calibration,
        MULTIMODAL_PHASH_CALIBRATION_ORACLE,
        "perceptual-vs-byte-dedup calibration: per Hamming distance, "
        "pairs byte dedup would miss",
    ),
    # -- round-14 additions --
    QueryDef(
        "multimodal_phash_clusters",
        multimodal_phash_clusters,
        MULTIMODAL_PHASH_CLUSTERS_ORACLE,
        "transitive perceptual near-dup components over the banded "
        "pair graph (identical-signature collapse, min-label closure)",
    ),
    QueryDef(
        "multimodal_phash_survivor",
        multimodal_phash_survivor,
        MULTIMODAL_PHASH_SURVIVOR_ORACLE,
        "best-copy election per perceptual cluster (most payload "
        "bytes) with the kept-vs-dropped byte ledger",
    ),
]

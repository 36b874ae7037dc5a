"""Ad-hoc scale probe: replicate the sf0.01 documents, events AND
embeddings tables N× (ids shifted by a data-derived stride per copy so
rows stay distinct) into a temp dir, then time selected queries at 1×
vs N×. Records go to BASELINE.md by hand.

Usage: python tools/scale_probe.py [N] [query ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from duckdb_gsheets_spark.plans.session import get_spark

SF_DIR = "/root/testdata/sf0.01"


def build_scaled(spark, factor: int) -> str:
    """Replicate documents, events AND embeddings N× (ids/users
    shifted per copy so rows stay distinct); the TPC-H relational
    tables symlink through unscaled."""
    from pyspark.sql import functions as F

    out = os.path.join(tempfile.gettempdir(), f"scale_probe_{factor}x")
    copies = spark.range(factor).withColumnRenamed("id", "copy")

    docs_out = os.path.join(out, "documents.parquet")
    if not os.path.exists(docs_out):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n = int(docs.agg(F.max("doc_id")).first()[0]) + 1
        (
            docs.crossJoin(copies)
            .withColumn("doc_id", F.col("doc_id") + F.col("copy") * n)
            .drop("copy")
            # Many output files/row groups: a single-partition write
            # produces ONE unsplittable row group, which serializes
            # every narrow per-row stage of the probed queries.
            .repartition(64)
            .write.mode("overwrite")
            .parquet(docs_out)
        )

    events_out = os.path.join(out, "events.parquet")
    if not os.path.exists(events_out):
        from duckdb_gsheets_spark.plans.catalog import load_table

        events = load_table(spark, SF_DIR, "events")
        # Derive shift strides from the data so replicated copies can
        # never alias onto real event_ids/user_ids.
        max_event, max_user = events.agg(
            F.max("event_id"), F.max("user_id")
        ).first()
        n = int(max_event) + 1
        n_users = int(max_user) + 1
        (
            events.crossJoin(copies)
            .withColumn("event_id", F.col("event_id") + F.col("copy") * n)
            .withColumn(
                "user_id", F.col("user_id") + F.col("copy") * n_users
            )
            .drop("copy")
            .repartition(64)
            .write.mode("overwrite")
            .parquet(events_out)
        )

    emb_out = os.path.join(out, "embeddings.parquet")
    if os.path.islink(emb_out):  # pre-round-10 probe dirs symlinked it
        os.unlink(emb_out)
    if not os.path.exists(emb_out):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        n = int(emb.agg(F.max("vec_id")).first()[0]) + 1
        (
            emb.crossJoin(copies)
            .withColumn("vec_id", F.col("vec_id") + F.col("copy") * n)
            .drop("copy")
            .repartition(64)
            .write.mode("overwrite")
            .parquet(emb_out)
        )

    for t in (
        "region nation customer supplier part orders lineitem"
    ).split():
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.lexists(link):
            os.symlink(f"{SF_DIR}/{t}.parquet", link)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    names = sys.argv[2:]
    from duckdb_gsheets_spark.operators.registry import all_queries

    qs = all_queries()
    # Same file-split sizing as bench.py: the replicated parquet files
    # are a few MB, so the 128 MB default scans each in ONE task and
    # serializes narrow per-row work (the HOF-heavy dedup family most
    # of all) — split down so scan parallelism matches the cores, as
    # it would on a real multi-file 100 TB layout.
    spark = get_spark(
        "scale_probe",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2097152",
            "spark.sql.files.openCostInBytes": "262144",
        },
    )
    scaled_dir = build_scaled(spark, factor)
    for name in names:
        fn = qs[name].spark_fn
        for label, d in ((f"1x", SF_DIR), (f"{factor}x", scaled_dir)):
            t0 = time.monotonic()
            n = fn(spark, d).count()
            dt = time.monotonic() - t0
            print(f"{name:28s} {label:>4s}: {dt:6.2f} s  {n} rows", flush=True)


if __name__ == "__main__":
    main()

"""Iterative ML operators over the embedding corpus.

Training-data pipelines cluster and project embeddings constantly —
corpus topic balancing (cluster-then-sample), dedup-aware curriculum
mixes, and drift dashboards all start from k-means and PCA. Both are
ITERATIVE, so they are registered rows-only (no single ANSI-SQL oracle
can express a Lloyd iteration); correctness is pinned by pytest
recomputation against numpy on the same data (tests/test_ops.py).

Execution shape — the same one MLlib's ``KMeans``/``RowMatrix`` use
(``treeAggregate``), expressed in DataFrame operators:

* the corpus NEVER shuffles: per-iteration state flows corpus → tiny.
  Assignment / projection is a narrow Arrow-batched numpy map (one
  (batch × dim) @ (dim × k) GEMM per batch, zero corpus movement);
* the update step is a ``groupBy`` over k clusters (or a global agg)
  of per-dimension sums — map-side partial aggregation reduces each
  partition to k × dim doubles before the shuffle, so the shuffled
  bytes per iteration are O(partitions × k × dim), independent of
  corpus size;
* the k × dim result is collected to the driver (the only collect —
  the model state, exactly what a parameter server would hold) and
  re-broadcast into the next iteration's UDF closure.

At 100 TB with 1000 executors this iterates at scan speed; the driver
traffic per iteration is kilobytes. ``.persist()`` on the parsed
corpus amortizes the parquet decode across iterations; the cache is
released before returning.

Reference parity note: the reference engine (duckdb_gsheets) has no ML
surface; this module is part of the beyond-reference training-data
layer (SURVEY.md §2.3) alongside dedup/similarity.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from duckdb_gsheets_spark.functions.vectors import dot_np, norm_np, to_double
from duckdb_gsheets_spark.operators.registry import QueryDef
from duckdb_gsheets_spark.plans.catalog import fan_out, load_table

#: Embedding dimensionality of the test corpus (embeddings.parquet).
DIM = 64

#: Spherical k-means parameters: cluster count, Lloyd iterations, and
#: the deterministic strided-id init (every 29th vec_id, first K).
KMEANS_K = 8
KMEANS_ITERS = 3
KMEANS_INIT_STRIDE = 29

#: Power-iteration count for the top principal component. The test
#: corpus has a nearly degenerate top spectral band (λ₁/λ₂ ≈ 1.07), so
#: convergence to ONE eigenvector is slow by nature; 8 iterations put
#: the Rayleigh quotient ≥ 0.9·λ₁, which is the useful contract (a
#: high-variance direction), at 8 corpus passes.
PCA_ITERS = 8


#: Bounded candidate grid for the driver-side init probe (see
#: similarity._collect_ivf_inputs for the scale rationale: arithmetic
#: ids + pushdown IN filter, never a full id-column scan).
_KMEANS_ID_PROBE = KMEANS_K * 8


def _init_centroids(sf_dir: str, spark: SparkSession | None = None) -> np.ndarray:
    """Driver-side pyarrow read of the K strided init vectors — the
    model seed a production job would load as an artifact; no Spark
    job, row-group-pruned ``in`` filter over an ARITHMETIC candidate
    grid (multiples of the stride — O(K) driver state, never the full
    id column). Sparse id spaces fall back to a distributed strided
    sample when a session is available."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    grid = [KMEANS_INIT_STRIDE * i for i in range(_KMEANS_ID_PROBE)]
    t = pq.read_table(
        path,
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", grid)],
    )
    rows = sorted(
        zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    )[:KMEANS_K]
    if len(rows) < KMEANS_K and spark is not None:
        emb = load_table(spark, sf_dir, "embeddings")
        collected = (
            emb.where(F.col("vec_id") % KMEANS_INIT_STRIDE == 0)
            .orderBy("vec_id")
            .limit(KMEANS_K)
            .select("vec_id", to_double(F.col("embedding")).alias("emb"))
            .collect()
        )
        rows = [(r.vec_id, r.emb) for r in collected]
    return np.array([[float(x) for x in e] for _, e in rows])


def _assign_sim_np(centroids: np.ndarray):
    """pandas_udf: embedding → struct(cluster, sim): argmax cosine
    against the broadcast centroid matrix, one GEMM per Arrow batch.
    Ties resolve to the lowest cluster index; sims round to 6 decimals
    before the argmax so float noise can't flip assignments between
    runs (same contract as vectors.centroid_assign_np)."""
    unit = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf(
        StructType(
            [
                StructField("cluster", LongType()),
                StructField("sim", DoubleType()),
            ]
        )
    )
    def assign(emb: pd.Series) -> pd.DataFrame:
        if len(emb) == 0:
            return pd.DataFrame({"cluster": [], "sim": []})
        M = np.stack(emb.to_numpy())
        norms = np.sqrt(np.einsum("ij,ij->i", M, M))
        sims = np.round((M @ unit.T) / norms[:, None], 6)
        best = sims.argmax(axis=1)
        return pd.DataFrame(
            {"cluster": best.astype("int64"), "sim": sims.max(axis=1)}
        )

    return assign


def _dim_sums(prefix: str = "emb") -> list:
    """The 64 per-dimension partial-sum expressions — map-side
    combinable, so each partition ships one row of 64 doubles per
    group to the shuffle."""
    return [
        F.sum(F.element_at(F.col(prefix), d + 1)).alias(f"s{d}")
        for d in range(DIM)
    ]


def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means (cosine Lloyd) over the embedding corpus:
    ``KMEANS_ITERS`` iterations from a deterministic strided-id seed,
    returning one row per cluster (size, mean member cosine to the
    final centroid, centroid norm).

    Per iteration: narrow GEMM assignment (zero corpus shuffle) →
    64-sum groupBy over K clusters (map-side combined) → K × 64
    driver collect → next closure. The returned 8-row frame is
    driver-materialized, exactly like a fitted model's summary.

    Registered rows-only: Lloyd iterations are not expressible as one
    ANSI-SQL statement; pinned by numpy recomputation in pytest.
    """
    centroids = _init_centroids(sf_dir, spark)
    emb = (
        fan_out(load_table(spark, sf_dir, "embeddings"))
        .select("vec_id", to_double(F.col("embedding")).alias("emb"))
        .persist()
    )
    try:
        for _ in range(KMEANS_ITERS):
            assigned = emb.withColumn("a", _assign_sim_np(centroids)("emb"))
            rows = (
                assigned.groupBy(F.col("a.cluster").alias("cluster"))
                .agg(F.count(F.lit(1)).alias("n"), *_dim_sums())
                .collect()
            )
            new = centroids.copy()
            for r in rows:
                new[r.cluster] = (
                    np.array([r[f"s{d}"] for d in range(DIM)]) / r.n
                )
            centroids = new
        final = emb.withColumn("a", _assign_sim_np(centroids)("emb"))
        stats = (
            final.groupBy(F.col("a.cluster").alias("cluster"))
            .agg(
                F.count(F.lit(1)).alias("size"),
                # Exact integer sum of the 6-decimal-rounded sims:
                # deterministic under any partition order.
                F.sum(
                    F.round(F.col("a.sim") * 1e6).cast("long")
                ).alias("sim_scaled"),
            )
            .collect()
        )
    finally:
        emb.unpersist()
    out = [
        (
            int(r.cluster),
            int(r.size),
            round(r.sim_scaled / 1e6 / r.size, 6),
            round(float(np.linalg.norm(centroids[r.cluster])), 6),
        )
        for r in sorted(stats, key=lambda r: r.cluster)
    ]
    return spark.createDataFrame(
        out,
        "cluster_id long, size long, avg_cos_sim double, centroid_norm double",
    )


def _proj_np(m: np.ndarray, v: np.ndarray):
    """pandas_udf: embedding → centered projection ``(x−m)·v``, one
    GEMV per Arrow batch with the iteration state in the closure."""

    @pandas_udf(DoubleType())
    def proj(e: pd.Series) -> pd.Series:
        if len(e) == 0:
            return pd.Series([], dtype="float64")
        M = np.stack(e.to_numpy())
        return pd.Series((M - m) @ v)

    return proj


def pca_power_topcomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by power
    iteration on the (never materialized) covariance matrix:
    ``v ← normalize(Σᵢ (xᵢ−m)((xᵢ−m)·v))``.

    Each iteration is one pass: a narrow Arrow-batched projection
    ``s = (x−m)·v`` (closure-shipped m, v) followed by a single global
    aggregate of 64 map-side-combined sums ``Σ s·(x_d−m_d)`` — the
    matrix-free C·v product. Driver state is two 64-vectors.

    Output: 64 rows (dim, loading, eigenvalue), sign-fixed so the
    largest-magnitude loading is positive. Rows-only (iterative);
    pinned by an identical-recipe numpy recomputation in pytest.
    """
    emb = (
        fan_out(load_table(spark, sf_dir, "embeddings"))
        .select(to_double(F.col("embedding")).alias("emb"))
        .persist()
    )
    try:
        mrow = emb.agg(F.count(F.lit(1)).alias("n"), *_dim_sums()).collect()[0]
        n = mrow.n
        m = np.array([mrow[f"s{d}"] for d in range(DIM)]) / n
        v = np.ones(DIM) / np.sqrt(DIM)
        for _ in range(PCA_ITERS):
            zrow = (
                emb.withColumn("s", _proj_np(m, v)("emb"))
                .agg(
                    *[
                        F.sum(
                            F.col("s")
                            * (F.element_at("emb", d + 1) - float(m[d]))
                        ).alias(f"s{d}")
                        for d in range(DIM)
                    ]
                )
                .collect()[0]
            )
            z = np.array([zrow[f"s{d}"] for d in range(DIM)])
            eigenvalue = float(np.linalg.norm(z)) / n
            v = z / np.linalg.norm(z)
    finally:
        emb.unpersist()
    if v[np.abs(v).argmax()] < 0:
        v = -v
    return spark.createDataFrame(
        [(d, round(float(v[d]), 6), round(eigenvalue, 6)) for d in range(DIM)],
        "dim long, loading double, eigenvalue double",
    )


#: Cosine threshold for semantic near-dup pairs — same bar as the
#: LSH-blocked embedding near-dup query (similarity.py) so the two
#: blocking strategies are comparable.
SEMDEDUP_THRESHOLD = 0.95


def semantic_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al.
    2023, arXiv:2303.09540 — public): coarse-cluster the corpus with
    the deterministic quantizer, then compare pairs ONLY within a
    cluster; pairs at cosine ≥ ``SEMDEDUP_THRESHOLD`` are semantic
    duplicates.

    Third blocking strategy alongside LSH buckets
    (similarity.embedding_neardup_pairs) and IVF lists: cluster
    blocking trades recall at cluster boundaries for a candidate set
    bounded by Σ_c |c|² — at 100 TB you raise K so clusters stay
    ~10³-10⁴ docs (SemDeDup used K=11k on LAION), keeping each
    within-cluster join node-local after one shuffle on cluster id.
    The assignment itself is the usual narrow GEMM (no corpus
    shuffle before the cluster-keyed join).

    Rows-only (recall depends on clustering); pytest pins precision
    (every emitted pair is in the exact O(n²) pair set) and recall
    within clusters.
    """
    centroids = _init_centroids(sf_dir, spark)
    emb = (
        fan_out(load_table(spark, sf_dir, "embeddings"))
        .select("vec_id", to_double(F.col("embedding")).alias("emb"))
        .withColumn("a", _assign_sim_np(centroids)("emb"))
        .select("vec_id", "emb", F.col("a.cluster").alias("cluster"))
    )
    a = emb.select(
        "cluster",
        F.col("vec_id").alias("vec_a"),
        F.col("emb").alias("emb_a"),
    )
    b = emb.select(
        "cluster",
        F.col("vec_id").alias("vec_b"),
        F.col("emb").alias("emb_b"),
    )
    cos = F.round(
        dot_np(F.col("emb_a"), F.col("emb_b"))
        / (norm_np(F.col("emb_a")) * norm_np(F.col("emb_b"))),
        6,
    )
    return (
        a.join(b, "cluster")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("cluster", "vec_a", "vec_b", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= SEMDEDUP_THRESHOLD)
    )


#: Logistic-probe hyperparameters: full-batch gradient-descent
#: iterations and learning rate. The probe target is label parity
#: (y = label mod 2) — a linear probe of how much label structure the
#: embedding space exposes, the standard representation-quality check.
LOGREG_ITERS = 5
LOGREG_LR = 2.0


def _resid_np(w: np.ndarray, b: float):
    """pandas_udf: (embedding, y) → σ(x·w + b) − y, one GEMV per
    Arrow batch with the weight vector in the closure."""

    @pandas_udf(DoubleType())
    def resid(emb: pd.Series, y: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="float64")
        M = np.stack(emb.to_numpy())
        p = 1.0 / (1.0 + np.exp(-(M @ w + b)))
        return pd.Series(p - y.to_numpy())

    return resid


def _prob_np(w: np.ndarray, b: float):
    """pandas_udf: embedding → σ(x·w + b)."""

    @pandas_udf(DoubleType())
    def prob(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="float64")
        M = np.stack(emb.to_numpy())
        return pd.Series(1.0 / (1.0 + np.exp(-(M @ w + b))))

    return prob


def logreg_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed linear probe: full-batch gradient-descent logistic
    regression predicting label parity from the embedding, returning
    the confusion matrix with mean predicted probability per cell.

    Same parameter-server shape as :func:`kmeans_lloyd`: per
    iteration, a narrow Arrow-batched GEMV computes residuals (zero
    corpus movement), then ONE global aggregate of 65 map-side-combined
    partial sums (Σ rᵢ·xᵢ per dimension + Σ rᵢ for the bias) ships
    O(partitions × dim) doubles to the driver, which applies the
    update and re-broadcasts the weights into the next closure. At
    100 TB each iteration is a scan-speed pass; driver traffic is
    kilobytes.

    Registered rows-only (iterative); pinned by an exact-shape numpy
    recompute in pytest.
    """
    emb = (
        fan_out(load_table(spark, sf_dir, "embeddings"))
        .select(
            "vec_id",
            (F.col("label") % 2).cast("double").alias("y"),
            to_double(F.col("embedding")).alias("emb"),
        )
        .persist()
    )
    try:
        n = emb.count()
        w = np.zeros(DIM)
        b = 0.0
        grad_dims = [
            F.sum(
                F.element_at(F.col("emb"), d + 1) * F.col("r")
            ).alias(f"g{d}")
            for d in range(DIM)
        ]
        for _ in range(LOGREG_ITERS):
            scored = emb.withColumn(
                "r", _resid_np(w, b)(F.col("emb"), F.col("y"))
            )
            row = scored.agg(F.sum("r").alias("gb"), *grad_dims).collect()[0]
            w = w - LOGREG_LR * np.array(
                [row[f"g{d}"] for d in range(DIM)]
            ) / n
            b = b - LOGREG_LR * row.gb / n
        final = emb.withColumn("p", _prob_np(w, b)(F.col("emb")))
        cells = (
            final.groupBy(
                F.col("y").cast("long").alias("y_true"),
                (F.col("p") >= 0.5).cast("long").alias("y_pred"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                # Exact integer sum of 6-decimal-rounded probabilities:
                # partition-order independent.
                F.sum(F.round(F.col("p") * 1e6).cast("long")).alias("ps"),
            )
            .collect()
        )
    finally:
        emb.unpersist()
    out = [
        (
            int(c.y_true),
            int(c.y_pred),
            int(c.n),
            round(c.ps / 1e6 / c.n, 6),
        )
        for c in sorted(cells, key=lambda c: (c.y_true, c.y_pred))
    ]
    return spark.createDataFrame(
        out, "y_true long, y_pred long, n long, avg_prob double"
    )


QUERIES: list[QueryDef] = [
    QueryDef(
        "kmeans_lloyd",
        kmeans_lloyd,
        None,
        "spherical k-means over embeddings (narrow GEMM + k×dim aggregate)",
    ),
    QueryDef(
        "pca_power_topcomp",
        pca_power_topcomp,
        None,
        "top principal component via matrix-free power iteration",
    ),
    QueryDef(
        "semantic_neardup_pairs",
        semantic_neardup_pairs,
        None,
        "SemDeDup cluster-blocked semantic near-dup pairs",
    ),
    QueryDef(
        "logreg_probe",
        logreg_probe,
        None,
        "full-batch GD logistic linear probe (parameter-server shape)",
    ),
]

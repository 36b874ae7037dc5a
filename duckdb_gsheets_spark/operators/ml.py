"""Iterative ML operators over the embedding corpus.

Training-data pipelines cluster and project embeddings constantly —
corpus topic balancing (cluster-then-sample), dedup-aware curriculum
mixes, and drift dashboards all start from k-means and PCA. Both are
ITERATIVE; since round 3 every cross-iteration aggregate runs in
exact scaled-long arithmetic (``EMB_SCALE``), so the model state is
bit-identical across engines and partitionings and the fixed
iteration counts UNROLL into generated DuckDB oracle SQL — k-means,
the SemDeDup pairs and the logistic probe are value-hash-checked;
correctness is additionally pinned by pytest recomputation against
numpy on the same data (tests/test_ops.py).

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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from duckdb_gsheets_spark.functions.vectors import dot_np, norm_np, to_double
from duckdb_gsheets_spark.operators.determinism import round_half_away
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


def _init_centroids(sf_dir: str, spark: SparkSession | None = None) -> np.ndarray:
    """The K strided init vectors — the model seed a production job
    would load as an artifact. Delegates to the shared quantizer-input
    collector (similarity._collect_quantizer_inputs: arithmetic
    candidate grid + pushdown IN filter, never a full id-column scan,
    distributed strided fallback for sparse id spaces) and discards
    its query batch."""
    from duckdb_gsheets_spark.operators.similarity import (
        _collect_quantizer_inputs,
        _driver_vec_rows,
    )

    if spark is not None:
        rows, _ = _collect_quantizer_inputs(
            spark, sf_dir, KMEANS_INIT_STRIDE, KMEANS_K
        )
        return np.array([[float(x) for x in r.emb] for r in rows])
    # Session-less callers (pure driver-side seed read): bounded grid
    # probe only — same semantics when the grid covers the id space.
    grid = [KMEANS_INIT_STRIDE * i for i in range(KMEANS_K * 8)]
    rows = sorted(
        (r.vec_id, r.emb) for r in _driver_vec_rows(sf_dir, grid)
    )[:KMEANS_K]
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


#: Fixed-point scale for cross-engine-exact aggregate state (centroid
#: sums, gradients, projections). A float32 embedding value times 1e6
#: is an EXACT float64 product (24-bit mantissa × 20 bits < 53), so
#: the rounded long is identical in Spark, numpy and DuckDB, and the
#: integer sum is partition-order-independent — the iterative model
#: state never accumulates float drift. Long bound: |Σ x·1e6| < 2^63
#: ⇒ ~9.2e12 in column units per group — comfortable through sf100;
#: beyond that widen to DECIMAL (determinism.dsum_decimal shape).
EMB_SCALE = 1_000_000


def _dim_scaled_sums(prefix: str = "emb", weight: Column | None = None) -> list:
    """Exact scaled-long per-dimension sums: Σ round(term·1e6) as
    long — the deterministic replacement for raw double sums in every
    iterative update (same contract as determinism.dsum)."""
    def term(d: int):
        t = F.element_at(F.col(prefix), d + 1)
        if weight is not None:
            t = t * weight
        return F.sum(F.round(t * EMB_SCALE).cast("long")).alias(f"s{d}")

    return [term(d) for d in range(DIM)]


def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means (cosine Lloyd) over the embedding corpus:
    ``KMEANS_ITERS`` iterations from a deterministic strided-id seed,
    returning one row per cluster (size, mean member cosine to the
    final centroid, centroid norm).

    Per iteration: narrow GEMM assignment (zero corpus shuffle) →
    64-sum groupBy over K clusters (map-side combined) → K × 64
    driver collect → next closure. The returned 8-row frame is
    driver-materialized, exactly like a fitted model's summary.

    Oracle-checked since round 3: the centroid state is EXACT
    (scaled-long sums, two correctly-rounded float ops per
    coordinate), so the fixed iteration count unrolls into generated
    DuckDB SQL (one assignment + one update CTE pair per iteration)
    that replays the model bit-identically; assignment sims compare
    after a round-6, the same drift bar as the IVF/LSH oracles. Also
    pinned by numpy recomputation in pytest.
    """
    centroids = _init_centroids(sf_dir, spark)
    # No fan_out: parameter-server loops pay per-TASK Python-UDF
    # round-trip overhead EVERY iteration, so widening a tiny frame
    # to core-count partitions triples the per-iteration wall
    # (measured 6.2 vs 2.1 s/iter at sf0.1). The scan's own
    # partitioning is the scale-adaptive width — at 100 TB the file
    # splits already exceed core count. Exact-long partial sums are
    # partition-count invariant, so results are unchanged.
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", to_double(F.col("embedding")).alias("emb"))
        .persist()
    )
    try:
        for _ in range(KMEANS_ITERS):
            assigned = emb.withColumn("a", _assign_sim_np(centroids)("emb"))
            rows = (
                assigned.groupBy(F.col("a.cluster").alias("cluster"))
                .agg(F.count(F.lit(1)).alias("n"), *_dim_scaled_sums())
                .collect()
            )
            new = centroids.copy()
            for r in rows:
                # Exact longs / (n·scale): the new centroid is two
                # correctly-rounded ops away from integers — bit-equal
                # to the oracle's CAST(s AS DOUBLE)/(n*1e6).
                new[r.cluster] = np.array(
                    [r[f"s{d}"] for d in range(DIM)], dtype=np.float64
                ) / (r.n * float(EMB_SCALE))
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
            round_half_away(r.sim_scaled / 1e6 / r.size, 6),
            round_half_away(float(np.linalg.norm(centroids[r.cluster])), 6),
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
    largest-magnitude loading is positive. Oracle-checked since
    round 3: mean and iteration sums are exact scaled longs, so the
    power-iteration trajectory unrolls into generated DuckDB SQL
    (per-iteration norm divisions carry ≤1e-15 cross-engine drift,
    absorbed by the scaled-long/round-6 boundaries — the ANN-oracle
    bar). Also pinned by an identical-recipe numpy recomputation in
    pytest.
    """
    # No fan_out — the kmeans_lloyd per-iteration-overhead note.
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(to_double(F.col("embedding")).alias("emb"))
        .persist()
    )
    try:
        mrow = emb.agg(
            F.count(F.lit(1)).alias("n"), *_dim_scaled_sums()
        ).collect()[0]
        n = mrow.n
        # Exact scaled-long mean — bit-equal to the oracle's replay.
        m = np.array(
            [mrow[f"s{d}"] for d in range(DIM)], dtype=np.float64
        ) / (n * float(EMB_SCALE))
        v = np.ones(DIM) / np.sqrt(DIM)
        # Round 14: the 64 per-dimension sums are built as ONE
        # selectExpr string batch instead of nested Column objects —
        # each iteration re-plans, and composing 64 round/cast trees
        # object-by-object cost ~1 s of py4j round-trips PER
        # ITERATION (measured 1.4 vs 0.55 s/iter, values identical;
        # m is loop-invariant so the strings build once). Same SQL
        # semantics: round() is F.round, bigint is long.
        proj_exprs = [
            f"sum(cast(round(s * (element_at(emb, {d + 1}) - "
            f"{float(m[d])!r}) * {EMB_SCALE}) as bigint)) as s{d}"
            for d in range(DIM)
        ]
        for _ in range(PCA_ITERS):
            zrow = (
                emb.withColumn("s", _proj_np(m, v)("emb"))
                .selectExpr(*proj_exprs)
                .collect()[0]
            )
            z = np.array(
                [zrow[f"s{d}"] for d in range(DIM)], dtype=np.float64
            ) / float(EMB_SCALE)
            eigenvalue = float(np.linalg.norm(z)) / n
            v = z / np.linalg.norm(z)
    finally:
        emb.unpersist()
    if v[np.abs(v).argmax()] < 0:
        v = -v
    return spark.createDataFrame(
        [(d, round_half_away(float(v[d]), 6), round_half_away(eigenvalue, 6)) for d in range(DIM)],
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

    Oracle: the seed-centroid assignment is deterministic (strided-id
    quantizer, round-6 sims, lowest-index ties — the same recipe the
    hash-checked IVF oracle replays), so DuckDB recomputes the
    clustering AND the within-cluster cosine join from the table with
    no literals; pytest additionally pins precision (every emitted
    pair is in the exact O(n²) pair set) and recall within clusters.
    """
    centroids = _init_centroids(sf_dir, spark)
    emb = fan_out(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", to_double(F.col("embedding")).alias("emb")
    )
    return semantic_neardup_pairs_frame(emb, centroids)


def semantic_neardup_pairs_frame(
    emb: DataFrame, centroids: np.ndarray
) -> DataFrame:
    """Cluster-blocked near-dup pair core over any ``(vec_id, emb)``
    frame + centroid seed — shared by the registered corpus query and
    the seeded-synthetic pytest (the real fixture corpus has no pair
    at the 0.95 bar, so a synthetic frame with pairs straddling the
    threshold keeps the precision/recall assertions non-vacuous)."""
    assigned = emb.withColumn(
        "a", _assign_sim_np(centroids)("emb")
    ).select("vec_id", "emb", F.col("a.cluster").alias("cluster"))
    a = assigned.select(
        "cluster",
        F.col("vec_id").alias("vec_a"),
        F.col("emb").alias("emb_a"),
    )
    b = assigned.select(
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

    Oracle-checked since round 3: gradients accumulate as exact
    scaled longs, so the weight trajectory is bit-identical across
    engines and the fixed iteration count unrolls into generated
    DuckDB SQL (σ recomputed per row — EXP ulp drift is absorbed by
    the round-6/scaled-long boundaries, the same bar as the ANN
    oracles). Also pinned by an exact-shape numpy recompute in
    pytest.
    """
    # No fan_out — the kmeans_lloyd per-iteration-overhead note.
    emb = (
        load_table(spark, sf_dir, "embeddings")
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
        denom = n * float(EMB_SCALE)
        # String-built gradient aggregate — the pca_power_topcomp
        # py4j-chatter note; identical SQL semantics.
        grad_exprs = [
            f"sum(cast(round(r * {EMB_SCALE}) as bigint)) as gb"
        ] + [
            f"sum(cast(round((element_at(emb, {d + 1}) * r) * "
            f"{EMB_SCALE}) as bigint)) as s{d}"
            for d in range(DIM)
        ]
        for _ in range(LOGREG_ITERS):
            scored = emb.withColumn(
                "r", _resid_np(w, b)(F.col("emb"), F.col("y"))
            )
            row = scored.selectExpr(*grad_exprs).collect()[0]
            # Exact scaled-long gradient state; ×2 and the single
            # division are correctly rounded, so w/b are bit-equal to
            # the oracle's replay.
            w = w - LOGREG_LR * np.array(
                [row[f"s{d}"] for d in range(DIM)], dtype=np.float64
            ) / denom
            b = b - LOGREG_LR * float(row.gb) / denom
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
            round_half_away(c.ps / 1e6 / c.n, 6),
        )
        for c in sorted(cells, key=lambda c: (c.y_true, c.y_pred))
    ]
    return spark.createDataFrame(
        out, "y_true long, y_pred long, n long, avg_prob double"
    )


def _materialize_ctes(sql: str) -> str:
    """Mark every CTE ``MATERIALIZED``: DuckDB's default inlining
    re-evaluates multiply-referenced CTEs, which turns an unrolled
    iteration chain into exponential work — materializing pins each
    iteration to one evaluation (0.1 s vs >500 s for the 8-iteration
    PCA oracle at sf0.01)."""
    return sql.replace(" AS (", " AS MATERIALIZED (")


def _kmeans_oracle() -> str:
    """DuckDB oracle for :func:`kmeans_lloyd`: the strided seed, every
    Lloyd iteration (round-6 argmax assignment → exact scaled-long
    per-dimension sums → centroid = s/(n·1e6)) and the final stats
    pass unroll into one generated CTE chain. Long-form state:
    ``c{t}(k, i, c)`` holds iteration ``t``'s centroids, so each
    iteration is two CTEs regardless of dimensionality. Empty
    clusters COALESCE back to their previous centroid, matching the
    driver loop's ``centroids.copy()`` carry-through."""
    parts = [
        f"""
WITH v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), norms AS (
  SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM v GROUP BY vec_id
), km_seed AS (
  SELECT vec_id AS cid,
         CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS k
  FROM embeddings
  WHERE vec_id % {KMEANS_INIT_STRIDE} = 0
  ORDER BY vec_id LIMIT {KMEANS_K}
), c0 AS (
  SELECT s.k, v.i, v.x AS c FROM km_seed s JOIN v ON v.vec_id = s.cid
)"""
    ]
    # One assignment CTE (a{t}) + one update CTE (c{t+1}) per
    # iteration; the final assignment reuses the same shape.
    def assign_cte(name: str, cfrm: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, k, s FROM (
    SELECT v.vec_id, cu.k, ROUND(SUM(v.x * cu.u) / n.nrm, 6) AS s
    FROM v
    JOIN (SELECT c.k, c.i, c.c / cn.cnrm AS u
          FROM {cfrm} c
          JOIN (SELECT k, SQRT(SUM(c * c)) AS cnrm
                FROM {cfrm} GROUP BY k) cn ON cn.k = c.k) cu
      ON cu.i = v.i
    JOIN norms n ON n.vec_id = v.vec_id
    GROUP BY v.vec_id, cu.k, n.nrm)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, k) = 1
)"""

    for t in range(KMEANS_ITERS):
        parts.append(assign_cte(f"a{t}", f"c{t}"))
        parts.append(
            f"""s{t} AS (
  SELECT a.k, v.i,
         SUM(CAST(ROUND(v.x * {EMB_SCALE}.0) AS BIGINT)) AS s,
         COUNT(*) AS n
  FROM a{t} a JOIN v ON v.vec_id = a.vec_id
  GROUP BY a.k, v.i
), c{t + 1} AS (
  SELECT p.k, p.i,
         COALESCE(CAST(st.s AS DOUBLE) / (st.n * {EMB_SCALE}.0), p.c) AS c
  FROM c{t} p LEFT JOIN s{t} st ON st.k = p.k AND st.i = p.i
)"""
        )
    last = f"c{KMEANS_ITERS}"
    parts.append(assign_cte("fa", last))
    parts.append(
        f"""fstats AS (
  SELECT k, COUNT(*) AS size,
         SUM(CAST(ROUND(s * {EMB_SCALE}.0) AS BIGINT)) AS ss
  FROM fa GROUP BY k
), fnorm AS (
  SELECT k, SQRT(SUM(c * c)) AS cn FROM {last} GROUP BY k
)
SELECT st.k AS cluster_id, st.size,
       ROUND(CAST(st.ss AS DOUBLE) / {EMB_SCALE}.0 / st.size, 6)
         AS avg_cos_sim,
       ROUND(fn.cn, 6) AS centroid_norm
FROM fstats st JOIN fnorm fn ON fn.k = st.k"""
    )
    return _materialize_ctes(",\n".join(parts))


def _pca_oracle() -> str:
    """DuckDB oracle for :func:`pca_power_topcomp`: exact scaled-long
    mean, then ``PCA_ITERS`` unrolled power iterations (projection →
    scaled-long z sums → unit-normalize), the final sign fix and the
    round-6 report. ``pv{t}(d, v)`` is the long-form iteration
    state."""
    parts = [
        f"""
WITH v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), cnt AS (
  SELECT COUNT(*) AS n FROM embeddings
), m AS (
  SELECT v.i,
         CAST(SUM(CAST(ROUND(v.x * {EMB_SCALE}.0) AS BIGINT)) AS DOUBLE)
           / (cnt.n * {EMB_SCALE}.0) AS m
  FROM v CROSS JOIN cnt
  GROUP BY v.i, cnt.n
), pv0 AS (
  SELECT unnest(generate_series(1, {DIM})) AS d, 0.125 AS v
)"""
    ]
    for t in range(PCA_ITERS):
        parts.append(
            f"""p{t} AS (
  SELECT v.vec_id, SUM((v.x - m.m) * w.v) AS s
  FROM v JOIN m ON m.i = v.i JOIN pv{t} w ON w.d = v.i
  GROUP BY v.vec_id
), zz{t} AS (
  SELECT v.i AS d,
         SUM(CAST(ROUND(p.s * (v.x - m.m) * {EMB_SCALE}.0) AS BIGINT)) AS sz
  FROM v JOIN m ON m.i = v.i JOIN p{t} p ON p.vec_id = v.vec_id
  GROUP BY v.i
), zn{t} AS (
  SELECT SQRT(SUM(z * z)) AS nz
  FROM (SELECT CAST(sz AS DOUBLE) / {EMB_SCALE}.0 AS z FROM zz{t})
), pv{t + 1} AS (
  SELECT d, (CAST(sz AS DOUBLE) / {EMB_SCALE}.0) / zn.nz AS v
  FROM zz{t} CROSS JOIN zn{t} zn
)"""
        )
    T = PCA_ITERS
    parts.append(
        f"""ev AS (
  SELECT zn.nz / cnt.n AS ev FROM zn{T - 1} zn CROSS JOIN cnt
), sgn AS (
  SELECT CASE WHEN (SELECT v FROM pv{T}
                    ORDER BY ABS(v) DESC, d LIMIT 1) < 0
              THEN -1.0 ELSE 1.0 END AS sg
)
SELECT CAST(p.d - 1 AS BIGINT) AS dim,
       ROUND(p.v * s.sg, 6) AS loading,
       ROUND(e.ev, 6) AS eigenvalue
FROM pv{T} p CROSS JOIN sgn s CROSS JOIN ev e"""
    )
    return _materialize_ctes(",\n".join(parts))


def _logreg_oracle() -> str:
    """DuckDB oracle for :func:`logreg_probe`: w/b start at zero and
    every gradient step replays through exact scaled-long sums; per
    iteration one CTE computes per-row z, one the residuals, two the
    scaled gradient/bias sums, and two the updated parameters.
    Operation order mirrors the numpy driver exactly (×LR first, one
    division, one subtraction)."""
    parts = [
        f"""
WITH v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), ey AS (
  SELECT vec_id, CAST(label % 2 AS DOUBLE) AS y FROM embeddings
), cnt AS (
  SELECT COUNT(*) AS n FROM embeddings
), w0 AS (
  SELECT unnest(generate_series(1, {DIM})) AS d, 0.0 AS w
), b0 AS (
  SELECT 0.0 AS b
)"""
    ]
    for t in range(LOGREG_ITERS):
        parts.append(
            f"""z{t} AS (
  SELECT v.vec_id, SUM(v.x * w.w) AS zz
  FROM v JOIN w{t} w ON w.d = v.i
  GROUP BY v.vec_id
), r{t} AS (
  SELECT z.vec_id,
         (1.0 / (1.0 + EXP(-(z.zz + b.b)))) - ey.y AS r
  FROM z{t} z
  CROSS JOIN b{t} b
  JOIN ey ON ey.vec_id = z.vec_id
), g{t} AS (
  SELECT v.i AS d,
         SUM(CAST(ROUND(v.x * r.r * {EMB_SCALE}.0) AS BIGINT)) AS g
  FROM v JOIN r{t} r ON r.vec_id = v.vec_id
  GROUP BY v.i
), gb{t} AS (
  SELECT SUM(CAST(ROUND(r * {EMB_SCALE}.0) AS BIGINT)) AS g FROM r{t}
), w{t + 1} AS (
  SELECT w.d,
         w.w - ({LOGREG_LR} * CAST(g.g AS DOUBLE))
               / (cnt.n * {EMB_SCALE}.0) AS w
  FROM w{t} w JOIN g{t} g ON g.d = w.d CROSS JOIN cnt
), b{t + 1} AS (
  SELECT b.b - ({LOGREG_LR} * CAST(gb.g AS DOUBLE))
               / (cnt.n * {EMB_SCALE}.0) AS b
  FROM b{t} b CROSS JOIN gb{t} gb CROSS JOIN cnt
)"""
        )
    T = LOGREG_ITERS
    parts.append(
        f"""zf AS (
  SELECT v.vec_id, SUM(v.x * w.w) AS zz
  FROM v JOIN w{T} w ON w.d = v.i
  GROUP BY v.vec_id
), pf AS (
  SELECT z.vec_id, ey.y,
         1.0 / (1.0 + EXP(-(z.zz + b.b))) AS p
  FROM zf z
  CROSS JOIN b{T} b
  JOIN ey ON ey.vec_id = z.vec_id
)
SELECT CAST(y AS BIGINT) AS y_true,
       CAST(p >= 0.5 AS BIGINT) AS y_pred,
       COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(ROUND(p * {EMB_SCALE}.0) AS BIGINT)) AS DOUBLE)
             / {EMB_SCALE}.0 / COUNT(*), 6) AS avg_prob
FROM pf
GROUP BY 1, 2"""
    )
    return _materialize_ctes(",\n".join(parts))


def _semdedup_oracle() -> str:
    """DuckDB oracle for :func:`semantic_neardup_pairs`: replay the
    strided seed-centroid selection (multiples of
    ``KMEANS_INIT_STRIDE``, first K by vec_id — the same grid
    ``_init_centroids`` probes), unit-normalize, assign every vector
    to its round-6 argmax centroid (ties to the lowest cluster
    index), then score within-cluster pairs exactly.

    Cross-engine float note: numpy GEMM vs SQL SUM accumulate in
    different orders; every comparison happens AFTER a round-6 — the
    same drift argument that underwrites the hash-checked IVF/LSH
    oracles (similarity.py)."""
    return _materialize_ctes(f"""
WITH v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), norms AS (
  SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM v GROUP BY vec_id
), sem_cids AS (
  SELECT vec_id AS cid,
         CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster
  FROM embeddings
  WHERE vec_id % {KMEANS_INIT_STRIDE} = 0
  ORDER BY vec_id LIMIT {KMEANS_K}
), sem_cnorm AS (
  SELECT c.cluster, SQRT(SUM(v.x * v.x)) AS cnrm
  FROM sem_cids c JOIN v ON v.vec_id = c.cid
  GROUP BY c.cluster
), sem_cu AS (
  SELECT c.cluster, v.i, v.x / n.cnrm AS u
  FROM sem_cids c
  JOIN v ON v.vec_id = c.cid
  JOIN sem_cnorm n ON n.cluster = c.cluster
), sem_sims AS (
  SELECT v.vec_id, cu.cluster, ROUND(SUM(v.x * cu.u) / n.nrm, 6) AS s
  FROM v JOIN sem_cu cu ON cu.i = v.i
  JOIN norms n ON n.vec_id = v.vec_id
  GROUP BY v.vec_id, cu.cluster, n.nrm
), sem_assign AS (
  SELECT vec_id, cluster FROM sem_sims
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
          ORDER BY s DESC, cluster) = 1
), sem_pairs AS (
  SELECT a.cluster, a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sem_assign a
  JOIN sem_assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
)
SELECT p.cluster, p.vec_a, p.vec_b,
       ROUND(SUM(qa.x * qb.x) / (na.nrm * nb.nrm), 6) AS cos_sim
FROM sem_pairs p
JOIN v qa ON qa.vec_id = p.vec_a
JOIN v qb ON qb.vec_id = p.vec_b AND qb.i = qa.i
JOIN norms na ON na.vec_id = p.vec_a
JOIN norms nb ON nb.vec_id = p.vec_b
GROUP BY p.cluster, p.vec_a, p.vec_b, na.nrm, nb.nrm
HAVING ROUND(SUM(qa.x * qb.x) / (na.nrm * nb.nrm), 6)
       >= {SEMDEDUP_THRESHOLD}
""")


def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space DRIFT matrix: the exact per-label centroid of
    the embedding corpus and the cosine similarity between every
    label pair — the dashboard behind "are these two slices converging
    / did the new crawl shift a topic's center of mass". Low
    inter-centroid cosine means well-separated slices; a pair drifting
    toward 1.0 is a merge candidate (or a labeling bug).

    Determinism: centroid sums accumulate as exact scaled longs
    (``EMB_SCALE`` — partition-order-independent). Cosine is
    SCALE-INVARIANT, so it is computed directly on the integer sum
    vectors (each exactly representable as a double at any count the
    long bound admits) — no per-component division or intermediate
    rounding for engines to disagree on; the unrolled left-to-right
    64-term dot/norm sums are generated from the same Python loop on
    both engines (bit-identical IEEE evaluation), rounded to 6 once.

    Shapes: the corpus never shuffles — the per-label aggregate
    map-side-combines to |labels| × dim longs; the pairwise step is a
    self-join of the |labels|-row centroid table (bounded by
    construction — allowlisted as a bounded broadcast in the
    unbounded-join sweep). At 100 TB this is one scan.
    """
    emb = fan_out(load_table(spark, sf_dir, "embeddings")).select(
        "label", to_double(F.col("embedding")).alias("emb")
    )
    cent = emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), *_dim_scaled_sums()
    )
    a = cent.select(
        F.col("label").alias("label_a"),
        F.col("n").alias("n_a"),
        *[F.col(f"s{d}").cast("double").alias(f"a{d}") for d in range(DIM)],
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        F.col("n").alias("n_b"),
        *[F.col(f"s{d}").cast("double").alias(f"b{d}") for d in range(DIM)],
    )
    dot = " + ".join(f"(a{d} * b{d})" for d in range(DIM))
    na = " + ".join(f"(a{d} * a{d})" for d in range(DIM))
    nb = " + ".join(f"(b{d} * b{d})" for d in range(DIM))
    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.expr(
                f"ROUND(({dot}) / (SQRT({na}) * SQRT({nb})), 6)"
            ).alias("cos_sim"),
        )
    )


def _centroid_similarity_oracle() -> str:
    # NB: the element must be cast to DOUBLE BEFORE scaling — DuckDB
    # evaluates FLOAT * INTEGER in float32, which rounds differently
    # than Spark's double arithmetic (same contract as the k-means
    # oracle's CAST(unnest(embedding) AS DOUBLE)).
    sums = ",\n    ".join(
        f"CAST(SUM(CAST(ROUND(CAST(embedding[{d + 1}] AS DOUBLE)"
        f" * {EMB_SCALE}) AS BIGINT)) AS DOUBLE) AS s{d}"
        for d in range(DIM)
    )
    dot = " + ".join(f"(a.s{d} * b.s{d})" for d in range(DIM))
    na = " + ".join(f"(a.s{d} * a.s{d})" for d in range(DIM))
    nb = " + ".join(f"(b.s{d} * b.s{d})" for d in range(DIM))
    return f"""
WITH cs_sums AS (
  SELECT label, COUNT(*) AS n,
    {sums}
  FROM embeddings GROUP BY label
)
SELECT a.label AS label_a, b.label AS label_b,
       a.n AS n_a, b.n AS n_b,
       ROUND(({dot}) / (SQRT({na}) * SQRT({nb})), 6) AS cos_sim
FROM cs_sums a JOIN cs_sums b ON a.label < b.label
"""


#: Outliers reported per label by the centroid-distance audit.
OUTLIER_TOPK = 5


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality audit: per label, the ``OUTLIER_TOPK`` vectors
    FARTHEST from their label's centroid (lowest cosine) — the
    mislabeled/noisy-embedding candidates a curation pass reviews
    first. Complements :func:`label_centroid_similarity` (which
    compares labels to each other; this compares members to their own
    label).

    Determinism: the centroid is the exact scaled-long sum vector
    (cosine is scale-invariant, so no normalization step exists to
    diverge); the per-row cosine is an unrolled left-to-right 64-term
    expression generated identically for both engines, rounded to 6
    BEFORE ranking so the rank order (cos asc, vec_id) is defined on
    engine-identical values.

    Shapes: one map-side-combined label aggregate, centroids
    BROADCAST back onto the scan (the corpus never shuffles with its
    embedding payload — the ranking window's input is projected to
    (label, vec_id, cos) first), one label-keyed window for the
    per-label top-K.
    """
    emb = fan_out(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", to_double(F.col("embedding")).alias("emb")
    )
    cent = emb.groupBy("label").agg(*_dim_scaled_sums())
    dot = " + ".join(
        f"(emb[{d}] * CAST(s{d} AS DOUBLE))" for d in range(DIM)
    )
    nv = " + ".join(f"(emb[{d}] * emb[{d}])" for d in range(DIM))
    ns = " + ".join(
        f"(CAST(s{d} AS DOUBLE) * CAST(s{d} AS DOUBLE))" for d in range(DIM)
    )
    scored = emb.join(F.broadcast(cent), "label").select(
        "label",
        "vec_id",
        F.expr(
            f"ROUND(({dot}) / (SQRT({nv}) * SQRT({ns})), 6)"
        ).alias("cos_centroid"),
    )
    w = Window.partitionBy("label").orderBy("cos_centroid", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= OUTLIER_TOPK)
        .select("label", "rank", "vec_id", "cos_centroid")
    )


def _embedding_outliers_oracle() -> str:
    sums = ",\n    ".join(
        f"SUM(CAST(ROUND(CAST(embedding[{d + 1}] AS DOUBLE)"
        f" * {EMB_SCALE}) AS BIGINT)) AS s{d}"
        for d in range(DIM)
    )
    dot = " + ".join(
        f"(CAST(e.embedding[{d + 1}] AS DOUBLE) * CAST(c.s{d} AS DOUBLE))"
        for d in range(DIM)
    )
    nv = " + ".join(
        f"(CAST(e.embedding[{d + 1}] AS DOUBLE)"
        f" * CAST(e.embedding[{d + 1}] AS DOUBLE))"
        for d in range(DIM)
    )
    ns = " + ".join(
        f"(CAST(c.s{d} AS DOUBLE) * CAST(c.s{d} AS DOUBLE))"
        for d in range(DIM)
    )
    return f"""
WITH eo_sums AS (
  SELECT label,
    {sums}
  FROM embeddings GROUP BY label
), eo_scored AS (
  SELECT e.label, e.vec_id,
         ROUND(({dot}) / (SQRT({nv}) * SQRT({ns})), 6) AS cos_centroid
  FROM embeddings e JOIN eo_sums c ON e.label = c.label
), eo_ranked AS (
  SELECT label, vec_id, cos_centroid,
         CAST(ROW_NUMBER() OVER (PARTITION BY label
              ORDER BY cos_centroid, vec_id) AS INTEGER) AS rank
  FROM eo_scored
)
SELECT label, rank, vec_id, cos_centroid
FROM eo_ranked WHERE rank <= {OUTLIER_TOPK}
"""


QUERIES: list[QueryDef] = [
    QueryDef(
        "kmeans_lloyd",
        kmeans_lloyd,
        _kmeans_oracle(),
        "spherical k-means over embeddings (narrow GEMM + k×dim aggregate)",
    ),
    QueryDef(
        "pca_power_topcomp",
        pca_power_topcomp,
        _pca_oracle(),
        "top principal component via matrix-free power iteration",
    ),
    QueryDef(
        "semantic_neardup_pairs",
        semantic_neardup_pairs,
        _semdedup_oracle(),
        "SemDeDup cluster-blocked semantic near-dup pairs",
    ),
    QueryDef(
        "logreg_probe",
        logreg_probe,
        _logreg_oracle(),
        "full-batch GD logistic linear probe (parameter-server shape)",
    ),
    QueryDef(
        "label_centroid_similarity",
        label_centroid_similarity,
        _centroid_similarity_oracle(),
        "exact per-label centroids + pairwise cosine drift matrix",
    ),
    QueryDef(
        "embedding_outliers",
        embedding_outliers,
        _embedding_outliers_oracle(),
        "per-label farthest-from-centroid outliers (label-quality audit)",
    ),
]

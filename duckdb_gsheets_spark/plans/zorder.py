"""Z-ordered (Morton-curve) parquet layout for MULTI-column skipping.

The fourth leg of the physical layout suite: partitioning
(plans/partitioning.py) prunes directories on coarse keys, bucketing
(plans/bucketing.py) co-locates joins, range clustering
(plans/clustering.py) gives one ordering key a tight per-file min/max
envelope — and Z-ORDERING extends that envelope tightening to SEVERAL
columns at once. Rows are sorted by the Morton code of their
grid-normalized key tuple (bit-interleave, so the sort order visits
the key space along a space-filling curve); each output file then
covers a small HYPER-RECTANGLE of the key space instead of a thin
slab of one key, and a selective predicate on ANY of the z-columns
skips most files from the parquet footer stats alone.

Why it matters at 100 TB: range clustering on `ts` makes time
predicates cheap but leaves `user_id` predicates scanning every file
(each file spans all users). The same table z-ordered on
``(ts, user_id)`` answers BOTH predicate shapes from a fraction of
the files — this is exactly what Delta's ``OPTIMIZE ZORDER BY`` and
Iceberg's z-order rewrite sell, reproduced here with nothing but one
`repartitionByRange` + in-partition sort on a computed JVM column
(whole-stage-codegen bit arithmetic; no UDF, no extra shuffle versus
any clustered write).

Trade-off, stated plainly: with D z-columns and F files, a point
predicate on one column skips ~(1 - F^(-1/D))·F files versus
(F-1)/F for single-key range clustering — interleaving SHARES the
envelope budget across dimensions. Z-order when several independent
predicates matter; range-cluster when one dominates
(plans/clustering.py says the same from the other side).

Normalization: each key is linearly mapped onto a ``2^bits`` integer
grid using the column's global min/max (one tiny agg job, collected —
2·D scalars, not data). Linear gridding is what Delta does by default
(range-id variants exist for heavy skew); the layout stays CORRECT
under any skew — skew only loosens envelopes, never answers.

Exercised by tests/test_zorder.py: writes events three ways (naive,
range-clustered on one key, z-ordered on two), reads footers, and
asserts the z-layout skips files for band predicates on BOTH columns
where each baseline fails on at least one — plus Morton-code unit
pins and result equality across layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Grid resolution per dimension. 12 bits × 4 dims = 48 interleaved
#: bits — still inside a long, and 4096 grid cells per dimension is
#: far finer than any realistic file count resolves.
ZORDER_BITS = 12
_MAX_DIMS = 4


def zvalue(cols: list[Column], bounds: list[tuple[float, float]],
           bits: int = ZORDER_BITS) -> Column:
    """Morton code of ``cols`` normalized onto a ``2^bits`` grid.

    Bit ``b`` of dimension ``d`` lands at interleaved position
    ``b*D + d`` (dimension 0 owns the least-significant lane). Pure
    JVM bit arithmetic — floor/shift/and/or — so the whole expression
    stays inside whole-stage codegen.

    NULL keys place NULLS-FIRST by contract: a NULL in dimension
    ``d`` maps to grid cell 0 of that dimension (the curve origin
    lane), so null-key rows cluster together with the dimension's
    minimum instead of scattering. This is SAFE for skipping —
    parquet footer min/max stats ignore nulls, so a file holding the
    null rows keeps a truthful envelope and predicates on ``d``
    never match NULL anyway — and it is what NULLS FIRST ordering
    would do in a plain range cluster.
    """
    n_dims = len(cols)
    if not 1 <= n_dims <= _MAX_DIMS:
        raise ValueError(f"zvalue supports 1..{_MAX_DIMS} columns, got {n_dims}")
    if bits * n_dims > 62:
        raise ValueError(f"bits*dims = {bits * n_dims} overflows a long")
    grid = 1 << bits
    z = F.lit(0).cast("long")
    for d, (col, (mn, mx)) in enumerate(zip(cols, bounds)):
        span = float(mx) - float(mn)
        if span <= 0.0:  # constant column: contributes nothing
            continue
        scaled = F.floor(
            (col.cast("double") - F.lit(float(mn))) / F.lit(span) * grid
        ).cast("long")
        # NULL keys land in cell 0 here: greatest()/least() skip NULL
        # inputs, so a NULL `scaled` clamps to the 0 bound — the
        # nulls-first contract in the docstring, pinned by
        # test_zvalue_null_keys_place_nulls_first rather than by an
        # (otherwise-unreachable) coalesce branch.
        g = F.least(
            F.lit(grid - 1).cast("long"),
            F.greatest(F.lit(0).cast("long"), scaled),
        )
        for b in range(bits):
            bit = F.shiftright(g, b).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, b * n_dims + d))
    return z


def zorder_layout(df: DataFrame, path: str, cols: list[str],
                  n_files: int, bits: int = ZORDER_BITS) -> None:
    """Write ``df`` as ``n_files`` parquet files z-ordered on ``cols``.

    One tiny min/max agg (2·|cols| scalars collected — bounds, not
    data), then the identical shuffle shape as
    :func:`plans.clustering.cluster_layout`: range-repartition on the
    z-value so files own disjoint z-ranges (disjoint curve segments =
    disjoint hyper-rectangles, up to curve jumps), in-partition sort
    for tight row-group envelopes, and the helper column dropped
    before write so the layout is invisible to readers.
    """
    row = df.agg(
        *[f for c in cols for f in (
            F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"mx_{c}"),
        )]
    ).collect()[0]
    missing = [c for c in cols if row[f"mn_{c}"] is None]
    if missing:
        raise ValueError(
            f"zorder_layout: no non-null values to bound column(s) "
            f"{missing} — empty input or all-null z-column"
        )
    bounds = [(row[f"mn_{c}"], row[f"mx_{c}"]) for c in cols]
    z = zvalue([F.col(c) for c in cols], bounds, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )

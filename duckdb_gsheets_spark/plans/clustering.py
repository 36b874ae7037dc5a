"""Range-clustered (sort-ordered) parquet layout for row-group skipping.

The third leg of the physical-layout triad: partitioning
(plans/partitioning.py) prunes DIRECTORIES on coarse keys, bucketing
(plans/bucketing.py) co-locates JOINS on high-cardinality keys, and
RANGE CLUSTERING makes every file and row group carry a tight min/max
envelope on an ordering key — so a range/equality predicate on that
key skips whole row groups at the parquet footer, before a single
data page decompresses.

Why it matters at 100 TB: a time-range query over an event table
whose files each span the WHOLE time range must open every footer and
scan most pages (each row group's [min, max] covers the predicate).
The same table written ``repartitionByRange(ts).sortWithinPartitions
(ts)`` gives files with disjoint ts ranges; a one-day predicate then
touches ~1/N of the files and, inside them, only the row groups whose
envelope intersects the day. The skip happens in ANY parquet reader —
Spark's vectorized scan (PushedFilters at the footer), DuckDB, pyarrow
— because it is a property of the LAYOUT, not the engine.

Clustering-key guidance: the key every heavy consumer ranges on
(event time for logs, doc_id for corpus lookups). Unlike partition
keys it may be high-cardinality — the envelope does the work, no
directory explosion. Z-order generalizes this to multi-key envelopes;
for one dominant key, plain range clustering is strictly better (the
envelope is exact, not interleaved).

Exercised by tests/test_clustering.py: writes the events table both
ways, reads the parquet footers, and asserts the clustered layout's
envelopes are disjoint while the naive layout's all span the full
range — plus the derived skip ratio a stats-pruning reader achieves.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cluster_layout(
    df: DataFrame, path: str, sort_col: str, n_files: int
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-clustered on
    ``sort_col``: range-repartition (one disjoint key range per
    output task, sampled boundaries) then an in-partition sort so
    every row group's min/max envelope is as tight as the data
    allows. One shuffle — the same cost as any repartition write —
    bought once at ingest, repaid on every ranged read."""
    (
        df.repartitionByRange(n_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_envelopes(path: str, col: str) -> list[tuple]:
    """Per-FILE (min, max, n_row_groups) statistics for ``col`` read
    straight from the parquet footers — the exact metadata a
    stats-pruning reader consults. Sorted by min."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out.append((min(mins), max(maxs), md.num_row_groups))
    out.sort(key=lambda t: t[0])
    return out


def skip_ratio(envelopes: list[tuple], lo, hi) -> float:
    """Fraction of files a footer-stats reader SKIPS for the
    predicate ``lo <= col <= hi`` given their envelopes."""
    skipped = sum(1 for mn, mx, _ in envelopes if mx < lo or mn > hi)
    return skipped / len(envelopes) if envelopes else 0.0

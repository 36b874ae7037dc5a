"""Cross-engine (Spark ⇄ DuckDB) deterministic hashing for the sketch
operators (MinHash, SimHash, LSH banding).

Why not ``xxhash64``: Spark's ``F.xxhash64`` has no DuckDB equivalent,
which left the whole approximate-dedup family oracle-less — no hard
correctness signal for the layer that matters most at 100 TB. This
module replaces it with **md5-derived hashes plus affine (universal)
permutations** that both engines compute bit-identically:

* Token → 60-bit: the big-endian value of the first 15 hex chars of
  ``md5(token)``. Spark: ``conv(substring(md5(t), 1, 15), 16, 10)``;
  DuckDB: ``CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)``. 60 bits
  keeps the value strictly inside a signed int64 on BOTH engines, so
  shifts, masks, XOR, bit_count and comparisons all agree with no
  unsigned-domain special cases.
* Token → [0, P): the 60-bit value reduced mod the Mersenne prime
  ``P = 2^31 − 1``.
* MinHash permutations: ``h_i(x) = (a_i·x + b_i) mod P`` with fixed
  coefficients below (Carter–Wegman universal hashing; public). All
  products stay < 2^62, exact in int64 on both engines.

Cost note (this shape is deliberate): Spark evaluates higher-order
function lambdas INTERPRETED, not codegen'd (see functions/vectors.py),
so the per-token expression must be a handful of nodes. This chain is
md5 → substring → conv → mod (4 nodes) — measured ~6× cheaper inside
``transform`` than an equivalent that byte-swaps the digest to match
DuckDB's ``md5_number_upper`` (16 nodes). In exploded (row-at-a-time)
shapes the chain runs inside whole-stage codegen and the difference
vanishes. The payoff either way: every sketch query gains a
value-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31 − 1: mod-P products of two residues fit int64.
P = 2147483647

#: Bits in the portable token hash (15 hex chars). 60 < 63 keeps the
#: value positive in int64 on both engines.
HASH_BITS = 60

#: Sentinel for "no token at this position" when shingling past the
#: end of a short document — P itself is outside the residue range
#: [0, P), so it can never collide with a real token residue.
NULL_SENTINEL = P

#: Polynomial base for combining token residues into a shingle id.
SHINGLE_A = 1_000_003

#: Base for combining signature components into an LSH band bucket id.
BAND_A = 2_000_003

#: Affine MinHash permutation coefficients (a_i, b_i), generated once
#: with ``random.Random(20260814)`` and frozen as literals so both
#: engines embed the same constants.
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (1571058545, 730493951),
    (1660058740, 1293707555),
    (1122761735, 1579482913),
    (72772567, 776319282),
    (1809802580, 1088400265),
    (1716185262, 1854787490),
    (1376580201, 1232262116),
    (126093127, 1718349004),
    (1255154079, 929465993),
    (1495162255, 1110399376),
    (253380337, 223979956),
    (331484110, 2008330132),
    (554108161, 2135836560),
    (84440658, 430566606),
    (287728255, 1463639562),
    (1926419603, 34250603),
)


def tok_hash60(col: Column) -> Column:
    """60-bit portable hash of ``col``'s UTF-8 bytes as a non-negative
    long (big-endian first 15 hex chars of md5)."""
    return F.conv(
        F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10
    ).cast("long")


def tok_mod_p(col: Column) -> Column:
    """Portable token residue in [0, P)."""
    return tok_hash60(col) % P


def affine(x: Column, a: int, b: int) -> Column:
    """``(a·x + b) mod P`` — exact for x in [0, P]."""
    return (x * a + b) % P


def oracle_tok_hash60(expr: str) -> str:
    """DuckDB fragment matching :func:`tok_hash60`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def oracle_tok_mod_p(expr: str) -> str:
    """DuckDB fragment matching :func:`tok_mod_p`."""
    return f"({oracle_tok_hash60(expr)} % {P})"

"""Cross-engine deterministic hashing primitives.

All near-dup operators (MinHash, SimHash, fingerprinting) need hash
functions that produce IDENTICAL values in Spark and in the DuckDB oracle.
xxhash64/murmur3 differ between engines, but md5 is md5 everywhere:
``md5(utf8_bytes)`` -> take the first 15 hex chars (60 bits, fits a signed
64-bit int) -> integer.  Verified equal: Spark
``conv(substring(md5(cast(x AS BINARY)),1,15),16,10)`` == DuckDB
``('0x' || substr(md5(x),1,15))::BIGINT``.

MinHash coefficients are fixed literals derived from a Knuth-style LCG so
the Spark plan and the generated oracle SQL share them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["MERSENNE_P", "md5_long", "sql_md5_long", "minhash_coeffs"]

#: 2^31 - 1.  Hash values are reduced mod P before the affine minhash
#: transforms so every product fits in a signed 64-bit int in both engines
#: (h < 2^31, a < 2^31 -> a*h < 2^62; no overflow, no engine-specific wrap).
MERSENNE_P = 2_147_483_647


def md5_long(col: Column) -> Column:
    """60-bit integer hash of a string column, identical across engines."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def sql_md5_long(expr: str) -> str:
    """DuckDB SQL rendering of :func:`md5_long`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """k fixed (a, b) pairs for h_j(x) = (a_j*x + b_j) mod P.

    Deterministic arithmetic on j (Knuth multiplicative constants); the same
    function generates the literals embedded in oracle SQL.
    """
    coeffs = []
    for j in range(k):
        a = ((2 * j + 1) * 2654435761) % MERSENNE_P
        b = (j * 40503 + 17) % MERSENNE_P
        coeffs.append((a or 1, b))
    return coeffs

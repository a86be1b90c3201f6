"""Skew-mitigation: salted equi-join (SCALE.md "salting for 100:1-class
skew").

AQE's skew-join splitting (on by default, session.py) handles most skew by
splitting oversized partitions of a sort-merge join.  Salting is the
explicit fallback for the cases AQE can't fix — e.g. a single join key
holding >1 partition of rows on the *build* side of a broadcast, or
deterministic pre-partitioning for repeated joins.

Mechanics: left rows scatter across ``salt`` buckets; the (small/dimension)
right side replicates into every bucket; the join key becomes
``keys + [_salt]`` so one hot key's rows spread over ``salt`` reducers.
Result set is provably identical to the unsalted join (asserted in
tests/test_timeseries.py) because every left row still meets every right
row with its key exactly once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(left: DataFrame, right: DataFrame, on: Sequence[str] | str,
                how: str = "inner", salt: int = 8) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    Use when ``left`` is large with skewed keys and ``right`` is small
    enough to replicate ``salt`` times (a dimension).  Supported ``how``:
    inner / left — semantics where replicating the right side is sound.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    # Salt from a per-row id, not the join key: identical hot-key rows must
    # land in different buckets (hashing the key would keep them together).
    l_salted = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
         .cast("int"))
    r_replicated = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return (l_salted.join(r_replicated, keys + ["_salt"], how)
            .drop("_salt"))

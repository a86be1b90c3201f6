"""Physical-layout helpers: z-order (Morton) interleaving for
multi-dimensional data clustering.

A table range-partitioned and sorted by a z-order key keeps BOTH
dimensions locally dense in every file, so min/max file statistics prune
scans filtered on either column — the standard lakehouse layout trick for
two-column predicates, where sorting by (a, b) only ever prunes on ``a``.
The reference has no layout surface at all (it publishes CSVs to SQS,
/root/reference/publisher/aws_sqs_csv_puiblisher.py); this is the
engine-side capability a 100 TB corpus store needs for data skipping.

Everything here is pure integer JVM expression code (shift/and/multiply),
usable inside whole-stage codegen; writing a z-ordered table is then
``df.repartitionByRange(n, zcol).sortWithinPartitions(zcol).write...``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["quantize", "interleave_bits", "zorder_value", "zorder_sql"]


def quantize(col: Column, lo: Column, hi: Column, bits: int = 8) -> Column:
    """Scale ``col`` from [lo, hi] onto the integer grid [0, 2**bits).

    Rank-free (value-range) quantization: one pass, no sort, identical
    across engines — ``floor((x - lo) * 2^bits / (hi - lo + 1))`` on
    integer inputs.  Skewed columns would want equi-depth (percentile)
    cut points instead; the interleave below is agnostic to which.
    """
    return F.floor(((col - lo) * F.lit(1 << bits)) / (hi - lo + 1)) \
            .cast("long")


def interleave_bits(buckets: list[Column], bits: int = 8) -> Column:
    """Morton-interleave pre-quantized ``bits``-wide integer columns: bit
    i of column j lands at position ``i * len(buckets) + j``.  The shared
    core of the query-side z-statistics here and the write-side
    ``sinks.layout.write_zordered``."""
    m = len(buckets)
    z = F.lit(0)
    for i in range(bits):
        for j, b in enumerate(buckets):
            z = z + (F.shiftright(b, i).bitwiseAND(F.lit(1))
                     * F.lit(1 << (i * m + j)))
    return z.cast("long")


def zorder_value(x: Column, y: Column, bits: int = 8) -> Column:
    """Two-column z-order: bit i of ``x`` at position 2i, of ``y`` at
    2i+1 — orders points along the Z space-filling curve, keeping close
    (x, y) pairs close in one dimension."""
    return interleave_bits([x, y], bits)


def zorder_sql(x: str, y: str, bits: int = 8) -> str:
    """ANSI-SQL mirror of :func:`zorder_value` (same bit placement), for
    oracle generation."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"

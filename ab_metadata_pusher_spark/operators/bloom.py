"""Hand-rolled distributed Bloom filter, entirely in JVM expressions.

Spark's own ``bloom_filter_agg``/``might_contain`` are optimizer-internal
(injected by the runtime-filter rule, proven in
tests/test_bucketing.py::test_bloom_runtime_filter_prunes_probe_side) and
not callable from the public function registry, so the explicit-bloom use
case — pre-filtering an incremental-ingest batch against the digest set of
an already-ingested corpus — is built here from first principles:

* **build**: each key contributes ``k`` double-hashed bit positions
  (Kirsch-Mitzenmacher: ``p_i = (h1 + i*h2) mod m``); positions fold into
  64-bit words with a ``bit_or`` aggregate (map-side combinable, at most
  ``m/64`` rows shuffle regardless of key count), and the words assemble
  into a single ``map<word_idx, word>`` row that broadcasts to every probe.
* **probe**: ``forall`` over the probe positions testing
  ``word & (1 << bit) != 0`` — whole-stage-codegen bit arithmetic, no UDF.

No false negatives by construction (same probe expression on both sides),
so callers that must be exact follow the bloom gate with an exact join on
the surviving candidates only; the bloom's job is to keep the big batch
out of that join.  At 100 TB the digest set is ~one 16-byte row per
document; sizing ``m`` for ~10 bits/key keeps the false-positive rate
under 1% while the broadcast word-map stays a pure bitset (m/8 bytes +
map overhead), orders of magnitude smaller than the digest table it
stands in for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ab_metadata_pusher_spark.functions.hashing import md5_long

__all__ = ["bloom_probe_positions", "bloom_build", "bloom_might_contain"]

#: Salt appended for the second hash of the double-hashing scheme.
_H2_SALT = "§bloom2"


def _bit_mask(bitpos: Column) -> Column:
    """``1 << bitpos`` as a long, for a bit position column in [0, 64).

    ``F.shiftleft`` only accepts a literal shift amount, so the 64 masks
    are an array literal indexed by position (element_at is 1-based).
    ``1 << 63`` overflows a signed-long literal; its two's-complement
    value ``-2**63`` is the same bit pattern.
    """
    masks = F.array(*[
        F.lit((1 << i) if i < 63 else -2**63).cast("long") for i in range(64)])
    return F.element_at(masks, bitpos.cast("int") + 1)


def bloom_probe_positions(value: Column, m: int, k: int) -> Column:
    """Array of ``k`` bit positions in ``[0, m)`` for a string key.

    ``h1``/``h2`` are independent 60-bit md5 hashes (``h2`` forced odd so
    the probe stride never degenerates); ``h1 + i*h2`` stays below 2^63
    for any sane ``k``, so the arithmetic is exact signed-64 in both
    engines.
    """
    h1 = md5_long(value)
    h2 = F.pmod(md5_long(F.concat(value, F.lit(_H2_SALT))), F.lit(2**31)) * 2 + 1
    return F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m)).cast("int")
                     for i in range(k)])


def bloom_build(keys: DataFrame, col: str, m: int, k: int) -> DataFrame:
    """One-row DataFrame ``(bloom: map<int,bigint>)`` over ``keys[col]``.

    Two map-side-combinable aggregates: positions fold to at most ``m/64``
    ``(word_idx, word)`` rows via ``bit_or``, then one row assembles the
    map.  Shuffle volume is bounded by ``m``, independent of key count.
    """
    pos = keys.select(
        F.explode(bloom_probe_positions(F.col(col), m, k)).alias("pos"))
    words = (pos
             .select((F.col("pos") / 64).cast("int").alias("word_idx"),
                     _bit_mask(F.pmod(F.col("pos"), F.lit(64))).alias("bit"))
             .groupBy("word_idx").agg(F.bit_or("bit").alias("word")))
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))).alias("bloom"))


def bloom_might_contain(bloom: Column, value: Column, m: int, k: int) -> Column:
    """Boolean membership probe; false negatives are impossible."""
    def _bit_set(p: Column) -> Column:
        word = F.coalesce(
            F.element_at(bloom, (p / 64).cast("int")), F.lit(0).cast("long"))
        return word.bitwiseAND(_bit_mask(F.pmod(p, F.lit(64)))) != 0
    return F.forall(bloom_probe_positions(value, m, k), _bit_set)

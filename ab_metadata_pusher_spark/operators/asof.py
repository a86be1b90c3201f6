"""As-of (point-in-time) join — a time-series operator the reference lacks
(SURVEY.md §2.G "joins beyond equi-join"; the reference's only join surface
is the catalog equi-joins configured at job/sample_mysql_aws_sqs_job.py:48-53).

Semantics: for every left row, attach the payload of the single right row
with the same key and the greatest ``right_ts <= left_ts`` (backward
direction, inclusive) — the standard ASOF JOIN of DuckDB/QuestDB/kdb.

Spark-first formulation: **union + sort-window**, not a range join.

* tag both sides, union by name,
* one window ``partitionBy(keys).orderBy(ts, side)`` with
  ``last(payload, ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT ROW,
* keep left rows.

Why this is the 100 TB plan: a naive inequality join explodes to
|left| x |right-per-key| pairs before picking the max; Spark plans it as
BroadcastNestedLoop when it can't find an equi-condition.  The union-window
form is ONE hash-shuffle of both sides on the key plus a per-partition sort
— linear in input, no pair blow-up, skew handled by AQE.  Right rows at the
same ts as a left row sort first (side 0 < 1), giving inclusive semantics.

Right-side (key, ts) pairs must be unique for deterministic output (same
contract DuckDB ASOF has when ties exist); pre-aggregate otherwise.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_cogrouped"]


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str] | str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_payload: Sequence[str] | None = None,
              prefix: str = "asof_",
              direction: str = "backward",
              tolerance_sec: float | None = None) -> DataFrame:
    """Inclusive as-of join, ``direction`` backward (default) or forward.

    Backward matches the latest right row with ``right_ts <= left_ts``;
    forward the earliest with ``right_ts >= left_ts`` (both per key).
    Returns all ``left`` columns plus, per payload column ``c`` of the right
    side, ``{prefix}{c}`` — NULL when no right row qualifies (left-outer
    semantics).  ``{prefix}{right_ts}`` carries the matched right timestamp.

    ``tolerance_sec`` (pandas ``merge_asof(tolerance=...)`` parity) nulls
    the match when the matched row is further than the tolerance from the
    left timestamp — a post-window projection, so the plan is unchanged:
    still one union + one per-key sort window.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_payload is None:
        right_payload = [c for c in right.columns
                         if c not in keys and c != right_ts]
    payload = [right_ts, *right_payload]

    left_cols = [c for c in left.columns if c not in keys and c != left_ts]

    def struct_ddl(df: DataFrame, cols: Sequence[str]) -> str:
        fields = df.select(*[F.col(c) for c in cols]).schema.fields
        return ("struct<" + ",".join(
            f"`{f.name}`:{f.dataType.simpleString()}" for f in fields) + ">")

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_left"),
        F.lit(None).cast(struct_ddl(right, payload)).alias("_right"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(struct_ddl(left, left_cols)).alias("_left"),
        F.struct(*[F.col(c) for c in payload]).alias("_right"),
    )

    # Same machinery both directions: forward just walks time reversed.
    # Right rows at the exact left timestamp sort first either way
    # (side 0 < 1), giving inclusive semantics.
    ts_order = (F.col("_ts").asc() if direction == "backward"
                else F.col("_ts").desc())
    w = (Window.partitionBy(*keys).orderBy(ts_order, F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_match", F.last("_right", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_sec is not None:
        gap = F.abs(F.unix_micros(F.col("_ts").cast("timestamp_ltz"))
                    - F.unix_micros(F.col(f"_match.{right_ts}")
                                    .cast("timestamp_ltz")))
        within = gap <= int(tolerance_sec * 1_000_000)
        matched = matched.withColumn(
            "_match", F.when(within, F.col("_match")))
    return matched.select(
        *keys,
        F.col("_ts").alias(left_ts),
        *[F.col(f"_left.{c}").alias(c) for c in left_cols],
        *[F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in payload],
    )


def asof_join_cogrouped(left: DataFrame, right: DataFrame, key: str,
                        left_ts: str = "ts", right_ts: str = "ts",
                        right_payload: Sequence[str] | None = None,
                        prefix: str = "asof_",
                        buckets: int | None = None) -> DataFrame:
    """Backward-inclusive as-of join on the cogrouped-pandas path:
    cogroup + ``pd.merge_asof`` — the Arrow escape hatch for per-key
    merge logic SQL can't express (custom tolerance rules,
    nearest-by-multiple-columns...).  Same output contract as
    :func:`asof_join`, so both implementations answer to one oracle.

    The cogroup key is a HASH BUCKET of ``key``, not the raw key
    (``buckets`` of them), and ``merge_asof(by=key)`` restores exact
    per-key matching inside each bucket: cogrouping on the raw key made
    one pandas frame per entity, and per-group overhead (Arrow batch +
    two DataFrame constructions per key) dominated the merge — measured
    11.6s -> 1.1s warm at sf0.1 (~20k keys -> 64 buckets; bucket-width
    sweep: 32/64/128/256/512 -> 1.0/1.1/1.4/2.3/4.1s, overhead still
    linear in group count well past the task count).  Default buckets =
    ``max(64, 2 * defaultParallelism)`` — enough groups to use every
    core with headroom for stragglers; size it UP (or pass explicitly)
    when |data|/buckets outgrows an executor's Arrow batch, DOWN toward
    |keys| never (raw-key semantics hold at any bucket count).  Null
    keys never match (merge_asof ``by`` treats NaN as unequal) — the
    same no-match the SQL formulation and the oracle produce.
    """
    import pandas as pd

    if buckets is None:
        buckets = max(64, 2 * left.sparkSession.sparkContext
                      .defaultParallelism)
    if right_payload is None:
        right_payload = [c for c in right.columns
                         if c != key and c != right_ts]
    left_cols = [c for c in left.columns if c != key and c != left_ts]

    out_cols = [key, left_ts, *left_cols, f"{prefix}{right_ts}",
                *[f"{prefix}{c}" for c in right_payload]]
    if len(set(out_cols)) != len(out_cols):
        # merge_asof would silently suffix colliding names _x/_y and the
        # output projection would then KeyError mid-task — fail at plan
        # time with an actionable message instead
        dupes = sorted({c for c in out_cols if out_cols.count(c) > 1})
        raise ValueError(
            f"output column collision {dupes}: a left column already uses "
            f"the {prefix!r} prefix — pass a different prefix")

    out_fields = [f"`{key}` {left.schema[key].dataType.simpleString()}",
                  f"`{left_ts}` {left.schema[left_ts].dataType.simpleString()}"]
    out_fields += [f"`{c}` {left.schema[c].dataType.simpleString()}"
                   for c in left_cols]
    out_fields.append(
        f"`{prefix}{right_ts}` {right.schema[right_ts].dataType.simpleString()}")
    out_fields += [f"`{prefix}{c}` {right.schema[c].dataType.simpleString()}"
                   for c in right_payload]
    out_ddl = ", ".join(out_fields)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0:
            return pd.DataFrame(columns=out_cols)

        # Right-derived OUTPUT columns go through nullable dtypes BEFORE
        # the merge: unmatched left rows make merge_asof route plain int64
        # through float64, silently rounding values > 2^53.  The raw-dtype
        # `_merge_ts` / `_merge_key` copies stay the merge keys
        # (merge_asof cannot key on extension dtypes).
        r = pd.DataFrame({"_merge_ts": rpdf[right_ts],
                          "_merge_key": rpdf[key]})
        for src, dst in [(right_ts, f"{prefix}{right_ts}"),
                         *[(c, f"{prefix}{c}") for c in right_payload]]:
            col = rpdf[src]
            r[dst] = (col.astype("Int64")
                      if pd.api.types.is_integer_dtype(col.dtype) else col)
        # NULL merge timestamps raise inside merge_asof; they can never
        # match anyway (right) / can never have a predecessor (left) —
        # the same rows the window formulation resolves to no-match
        r = r[r["_merge_ts"].notna()].sort_values("_merge_ts")
        l_null = lpdf[lpdf[left_ts].isna()]
        l_ok = lpdf[lpdf[left_ts].notna()].sort_values(left_ts)

        merged = pd.merge_asof(
            l_ok, r, left_on=left_ts, right_on="_merge_ts",
            left_by=key, right_by="_merge_key",
            direction="backward", allow_exact_matches=True)
        if len(l_null):
            merged = pd.concat([merged, l_null], ignore_index=True)
        return merged.reindex(columns=out_cols)

    def with_bucket(df: DataFrame) -> DataFrame:
        # Fresh bucket expression AND a re-aliasing projection per side:
        # both sides usually derive from the SAME source relation (e.g.
        # purchases/clicks filters of one events table), and a cogroup
        # whose two grouping columns are the same synthetic expression
        # over shared attribute ids resolves flakily — observed: the
        # right-side pandas frame arriving pruned to just the bucket
        # column.  Alias() mints new expression ids, making the sides'
        # attributes disjoint and the resolution deterministic.
        out = df.withColumn(
            "_asof_bkt", F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)))
        return out.select([F.col(c).alias(c) for c in out.columns])

    return (with_bucket(left).groupBy("_asof_bkt")
            .cogroup(with_bucket(right).groupBy("_asof_bkt"))
            .applyInPandas(merge, out_ddl))

"""Streaming queries + batch-SQL oracles.

Each callable builds the streaming plan (file-source stream over events,
watermark + windows/state), executes it with ``Trigger.AvailableNow`` into
a memory sink, and returns the finished table — a batch-shaped result the
driver can hash.  Because the stream replays exactly the fixture file, the
DuckDB oracle is ordinary batch SQL over the same events table (the
gaps-and-islands formulation for session windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ab_metadata_pusher_spark.plans.registry import register
from ab_metadata_pusher_spark.streaming import events as E

_EVENTS_TS = "CAST(ts AS TIMESTAMP)"  # duckdb ns-timestamp -> us


@register(
    "stream_tumbling_counts",
    oracle=f"""
SELECT time_bucket(INTERVAL '5 minutes', {_EVENTS_TS}) AS win_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
""",
    covers=("G.stream.tumbling",),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation, AvailableNow execution."""
    return E.run_to_memory(E.tumbling_counts(E.events_stream(spark, sf_dir)))


@register(
    "stream_session_windows",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, {_EVENTS_TS} AS ts, value,
         lag({_EVENTS_TS}) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts > INTERVAL '5 minutes' THEN 1 ELSE 0 END
           AS new_session
  FROM ordered
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '5 minutes' AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM sessions
GROUP BY user_id, session_id
""",
    covers=("G.stream.session",),
)
def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window sessionization vs the gaps-and-islands batch oracle —
    verifies Spark's session semantics (end = last event + gap) exactly."""
    return E.run_to_memory(E.session_windows(E.events_stream(spark, sf_dir)))


@register(
    "stream_dedup_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    covers=("G.stream.dedup",),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark, projected to the dedup key (the
    surviving row per key is arrival-order dependent; the key set is not)."""
    return E.run_to_memory(
        E.dedup_within_watermark(E.events_stream(spark, sf_dir)),
        output_mode="append")


@register(
    "stream_sliding_counts",
    oracle=f"""
WITH placed AS (
  SELECT time_bucket(INTERVAL '5 minutes', {_EVENTS_TS}) AS win_start,
         user_id
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '5 minutes', {_EVENTS_TS})
           - INTERVAL '5 minutes' AS win_start,
         user_id
  FROM events
)
SELECT win_start, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM placed GROUP BY win_start
""",
    covers=("G.stream.sliding",),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min width, 5 min slide), exact distinct users.
    Oracle places each event in both covering windows (start = its 5-min
    bucket and the one before)."""
    return E.run_to_memory(E.sliding_counts(E.events_stream(spark, sf_dir)))


@register(
    "stream_stateful_user_stats",
    oracle=f"""
SELECT user_id,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       min({_EVENTS_TS}) AS first_ts,
       max({_EVENTS_TS}) AS last_ts
FROM events GROUP BY user_id
""",
    covers=("G.stream.stateful",),
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful processing (applyInPandasWithState): per-user
    running aggregates in explicit GroupState, final emission vs the batch
    oracle."""
    return E.run_to_memory(
        E.stateful_user_stats(E.events_stream(spark, sf_dir)),
        output_mode="update")


@register(
    "stream_static_join",
    oracle="""
SELECT c_mktsegment, count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""",
    covers=("G.stream.static_join",),
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming fact x static dimension join, aggregated per segment."""
    from ab_metadata_pusher_spark.sources.fixtures import load_table
    return E.run_to_memory(
        E.stream_static_join_segments(
            E.events_stream(spark, sf_dir),
            load_table(spark, sf_dir, "customer")))


@register(
    "stream_stream_join",
    oracle="""
SELECT p.user_id AS p_user, p.event_id AS purchase_id,
       c.event_id AS click_id,
       CAST(p.ts AS TIMESTAMP) AS p_ts, CAST(c.ts AS TIMESTAMP) AS c_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL '10 minutes'
 AND c.ts <= p.ts
""",
    covers=("G.stream.stream_join",),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with event-time range condition and
    watermarks on both sides (bounded join state); over the AvailableNow
    replay the result equals the batch range join.

    Join state = the 10-minute watermark horizon per side, keyed by
    user_id — tiny next to the stream, so the state-store count (one per
    shuffle partition) is sized to 4, not CPU count (3.9s -> 2.3s at
    sf0.1; same sizing rule as run_to_memory documents)."""
    return E.run_to_memory(
        E.stream_stream_purchase_clicks(
            E.events_stream(spark, sf_dir), E.events_stream(spark, sf_dir)),
        output_mode="append", shuffle_partitions=4)


@register(
    "stream_ingest_dedup",
    oracle="""
SELECT d.doc_id, md5(d.text) AS content_md5
FROM documents d
LEFT JOIN (SELECT DISTINCT md5(text) AS m
           FROM documents WHERE doc_id < 300) e
  ON md5(d.text) = e.m
WHERE e.m IS NULL
""",
    covers=("G.stream.ingest_dedup",),
)
def q_stream_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus ingest with digest dedup: the arriving document
    stream anti-joins the static already-ingested digest set (ids < 300
    here), so only novel content survives — the streaming twin of the
    batch `dedup_incremental` query, same oracle technique."""
    from ab_metadata_pusher_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    existing = (load_table(spark, sf_dir, "documents")
                .filter(F.col("doc_id") < 300)
                .select(F.md5(F.col("text").cast("binary"))
                        .alias("content_md5"))
                .distinct())
    return E.run_to_memory(
        E.stream_ingest_dedup(E.documents_stream(spark, sf_dir), existing),
        output_mode="append")


@register(
    "stream_funnel_steps",
    oracle="""
WITH v AS (SELECT user_id, min(ts) AS view_ts
           FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS click_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.view_ts
      GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      GROUP BY e.user_id)
SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v USING (user_id)
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
""",
    covers=("G.stream.funnel",),
)
def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user funnel state machine (applyInPandasWithState):
    over an AvailableNow replay the final update-mode emission equals the
    batch funnel fold, so this query, the batch `funnel_steps`, AND the
    oracle's three-join SQL are three independent routes to one result."""
    return E.run_to_memory(
        E.stateful_funnel(E.events_stream(spark, sf_dir)),
        output_mode="update")


@register(
    "stream_quality_filter",
    oracle="""
SELECT doc_id, len(toks) AS n_tokens,
       round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
             / greatest(length(text), 1), 4) AS alpha_ratio
FROM (SELECT doc_id, text,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents)
WHERE len(toks) BETWEEN 10 AND 1000
  AND length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
      / greatest(length(text), 1) >= 0.5
""",
    covers=("G.stream.quality",),
)
def q_stream_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest quality gate: the arriving document stream is
    scored (token count, alpha ratio — operators/text.py) and low-quality
    docs are dropped before they ever reach storage — together with
    stream_ingest_dedup this is the front door of a streaming corpus
    pipeline.  Stateless map+filter per micro-batch: no watermark, no
    state store, scales with batch size only."""
    from pyspark.sql import functions as F

    from ab_metadata_pusher_spark.operators import text as X

    scored = X.quality_features(E.documents_stream(spark, sf_dir))
    return E.run_to_memory(
        scored.filter(F.col("len_ok") & (F.col("alpha_ratio") >= 0.5))
              .select("doc_id", "n_tokens", "alpha_ratio"),
        output_mode="append")


@register(
    "stream_ohlc",
    oracle=f"""
SELECT time_bucket(INTERVAL '15 minutes', {_EVENTS_TS}) AS win_start,
       event_type,
       round(arg_min(value, ts), 4) AS open,
       round(max(value), 4) AS high,
       round(min(value), 4) AS low,
       round(arg_max(value, ts), 4) AS close,
       count(*) AS n_events
FROM events
GROUP BY 1, 2
""",
    covers=("G.stream.ohlc",),
)
def q_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC candlesticks: the batch rollup_ohlc semantics as a
    watermarked tumbling-window aggregate — min_by/max_by are ordinary
    declarative aggregates, so the SAME open/high/low/close expressions
    run incrementally per micro-batch with (ts, value) pairs as the only
    window state.  Late data beyond the watermark is dropped instead of
    reopening closed candles — the streaming-correctness tradeoff the
    batch rollup never has to make."""
    from pyspark.sql import functions as F

    ev = E.events_stream(spark, sf_dir)
    agg = (ev.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "15 minutes").alias("win"), "event_type")
           .agg(F.round(F.min_by("value", "ts"), 4).alias("open"),
                F.round(F.max("value"), 4).alias("high"),
                F.round(F.min("value"), 4).alias("low"),
                F.round(F.max_by("value", "ts"), 4).alias("close"),
                F.count(F.lit(1)).alias("n_events"))
           .select(F.col("win.start").cast("timestamp_ntz").alias("win_start"),
                   "event_type", "open", "high", "low", "close", "n_events"))
    return E.run_to_memory(agg)


@register(
    "stream_topk_window",
    oracle=f"""
SELECT win_start, event_type, n_events, rk FROM (
  SELECT time_bucket(INTERVAL '5 minutes', {_EVENTS_TS}) AS win_start,
         event_type, count(*) AS n_events,
         row_number() OVER (
           PARTITION BY time_bucket(INTERVAL '5 minutes', {_EVENTS_TS})
           ORDER BY count(*) DESC, event_type) AS rk
  FROM events GROUP BY 1, 2)
WHERE rk <= 2
""",
    covers=("G.stream.topk",),
)
def q_stream_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k per window — the two-stage serving pattern: the
    STREAM maintains watermarked per-(window, key) counts (incremental,
    state bounded by watermark); the top-2-per-window rank runs as a
    batch window over the materialized sink, whose cardinality is
    windows x event types, not events.  Ranking inside the stream would
    need complete-mode re-emission of whole windows; pre-aggregate +
    serve-time rank is how production dashboards actually do trending-k
    at scale."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    counts = E.run_to_memory(E.tumbling_counts(E.events_stream(spark, sf_dir)))
    w = Window.partitionBy("win_start").orderBy(
        F.col("n_events").desc(), "event_type")
    return (counts.select("win_start", "event_type", "n_events",
                          F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= 2))


def _stream_cm_oracle() -> str:
    from ab_metadata_pusher_spark.operators.sketches import (
        CM_DEPTH, cm_cell_sql)
    cell_selects = " UNION ALL ".join(
        f"SELECT {r} AS r, "
        f"{cm_cell_sql('CAST(user_id AS VARCHAR)', r)} AS c FROM events"
        for r in range(CM_DEPTH))
    return f"""
SELECT r, c, count(*) AS cnt FROM ({cell_selects}) GROUP BY r, c
"""


@register("stream_countmin_cells", oracle=_stream_cm_oracle(),
          covers=("G.stream.countmin",))
def q_stream_countmin_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch maintained AS STREAMING STATE: the event stream
    explodes each row into its depth (r, c) cells and a streaming
    aggregation keeps the running cell counts — so the state store holds
    exactly depth x width rows FOREVER, however long the stream runs.
    The canonical answer to "frequency tracking over an unbounded
    stream without unbounded keyed state"; the batch oracle rebuilds
    the identical sketch because cells are exact md5-bucket counts
    (operators/sketches.py countmin_build).

    Complete-mode output is safe here for the same reason the state is:
    the result IS the sketch, 256 rows.  At 100 TB/day the shuffle
    carries map-side-combined partial cells — constant bytes per
    partition per batch."""
    from pyspark.sql import functions as F

    from ab_metadata_pusher_spark.operators.sketches import cm_pairs

    ev = E.events_stream(spark, sf_dir)
    pairs = cm_pairs(F.col("user_id").cast("string"))
    cells = (ev.select(F.explode(pairs).alias("p"))
             .groupBy(F.col("p.r").alias("r"), F.col("p.c").alias("c"))
             .agg(F.count(F.lit(1)).alias("cnt")))
    return E.run_to_memory(cells, output_mode="complete")

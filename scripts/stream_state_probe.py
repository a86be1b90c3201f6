"""Measure streaming STATE-STORE growth across the scaled decades
(r10 VERDICT ask #4: the stream family had no decade-scale evidence,
and state is what breaks differently at 100 TB).

The per-round correctness runs replay each fixture as ONE AvailableNow
micro-batch, so the watermark never advances inside a run and state
metrics say nothing about eviction.  This probe manufactures a real
multi-batch replay: the scaled events (x1/x10/x100 — same 30-day
wall-clock window, 10x/100x densified traffic, the realistic growth
mode) are sliced TIME-ORDERED into N files with staggered mtimes, and
each stateful shape streams them with maxFilesPerTrigger so the
watermark advances batch by batch, exactly like a resident query on a
live source.

Per (decade, shape) it reports wall time and the state-store row/byte
trajectory (per-batch ``stateOperators`` totals).  The claims under
test:

* watermarked shapes (tumbling/session windows, stream-stream join,
  dedup-within-watermark): state at batch end tracks the WATERMARK
  HORIZON x event rate — flat-ish across batches within a run (history
  is evicted), growing ~linearly with densification across decades;
* keyed running state (stateful_user_stats, NoTimeout by design):
  state rows == |distinct keys| — grows with the key universe, not
  with stream length; flat across batches once all keys are seen.

Usage:
    python scripts/stream_state_probe.py \
        --dirs .scratch/scaled/x1,.scratch/scaled/x10,.scratch/scaled/x100
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from ab_metadata_pusher_spark.session import get_spark  # noqa: E402
from ab_metadata_pusher_spark.streaming import events as E  # noqa: E402

N_SLICES = 24
FILES_PER_TRIGGER = 2  # -> 12 micro-batches per run


def build_slices(decade_dir: str, out_dir: Path) -> None:
    """Slice the scaled events into N time-ordered parquet files with
    increasing mtimes (the file source processes oldest-mtime first, so
    the replay is in event-time order like a live stream)."""
    import duckdb

    out_dir.mkdir(parents=True, exist_ok=True)
    src = f"{decade_dir}/events.parquet"
    glob = f"{src}/*.parquet" if Path(src).is_dir() else src
    con = duckdb.connect()
    con.execute(f"""
        CREATE TEMP TABLE ev AS
        SELECT *, ntile({N_SLICES}) OVER (ORDER BY ts) AS _slice
        FROM read_parquet('{glob}')
    """)
    base = time.time() - N_SLICES * 10
    for i in range(1, N_SLICES + 1):
        path = out_dir / f"slice_{i:02d}.parquet"
        con.execute(f"""
            COPY (SELECT * EXCLUDE (_slice) FROM ev
                  WHERE _slice = {i} ORDER BY ts)
            TO '{path}' (FORMAT PARQUET)
        """)
        os.utime(path, (base + i * 10, base + i * 10))
    con.close()


def slices_stream(spark: SparkSession, slices_dir: Path) -> DataFrame:
    """File-source stream over the slice dir, same ts normalization as
    streaming/events.events_stream, N files per trigger."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(str(slices_dir / "slice_01.parquet")).schema
    sdf = (spark.readStream.schema(raw_schema)
           .option("maxFilesPerTrigger", str(FILES_PER_TRIGGER))
           .option("latestFirst", "false")
           .parquet(str(slices_dir)))
    ts_type = raw_schema["ts"].dataType.simpleString()
    if ts_type == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type != "timestamp":
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return sdf.select(*raw_schema.fieldNames())


def run_and_measure(spark: SparkSession, stream_df: DataFrame,
                    shuffle_partitions: int = 8,
                    output_mode: str = "update") -> dict:
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(shuffle_partitions))
    try:
        t0 = time.time()
        q = (stream_df.writeStream.format("noop")
             .outputMode(output_mode).trigger(availableNow=True).start())
        q.awaitTermination()
        wall = time.time() - t0
    finally:
        spark.conf.set(key, prev)
    rows_by_batch, bytes_by_batch = [], []
    for p in q.recentProgress:
        prog = p if isinstance(p, dict) else json.loads(p.json)
        ops = prog.get("stateOperators") or []
        if ops:
            rows_by_batch.append(sum(o.get("numRowsTotal", 0) for o in ops))
            bytes_by_batch.append(
                sum(o.get("memoryUsedBytes", 0) for o in ops))
    return {"wall": wall, "n_batches": len(q.recentProgress),
            "rows_by_batch": rows_by_batch,
            "bytes_by_batch": bytes_by_batch}


def shapes(spark: SparkSession, slices_dir: Path) -> dict:
    return {
        "stream_tumbling_counts": lambda: (
            E.tumbling_counts(slices_stream(spark, slices_dir)), 8, "update"),
        # session windows forbid update mode: append emits closed
        # sessions past the watermark — the resident-query mode whose
        # state bound this probe measures (the registry's correctness
        # form uses complete, which by definition keeps all state)
        "stream_session_windows": lambda: (
            E.session_windows(slices_stream(spark, slices_dir)), 8, "append"),
        "stream_dedup_watermark": lambda: (
            E.dedup_within_watermark(slices_stream(spark, slices_dir)),
            8, "append"),
        "stream_stateful_user_stats": lambda: (
            E.stateful_user_stats(slices_stream(spark, slices_dir)),
            8, "update"),
        "stream_stream_join": lambda: (
            E.stream_stream_purchase_clicks(
                slices_stream(spark, slices_dir),
                slices_stream(spark, slices_dir)), 4, "append"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs",
                    default=".scratch/scaled/x1,.scratch/scaled/x10,"
                            ".scratch/scaled/x100")
    ap.add_argument("--shapes", default="")
    args = ap.parse_args()
    dirs = [str(REPO / d) if not d.startswith("/") else d
            for d in args.dirs.split(",")]

    spark = get_spark(app_name="stream-state-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    for d in dirs:
        tag = Path(d).name
        slices_dir = REPO / ".scratch" / "stream_slices" / tag
        if not (slices_dir / f"slice_{N_SLICES:02d}.parquet").exists():
            print(f"[{tag}] building {N_SLICES} time-ordered slices…",
                  flush=True)
            build_slices(d, slices_dir)
        todo = shapes(spark, slices_dir)
        if args.shapes:
            keep = set(args.shapes.split(","))
            todo = {k: v for k, v in todo.items() if k in keep}
        for name, build in todo.items():
            df, width, mode = build()
            m = run_and_measure(spark, df, width, mode)
            rb = m["rows_by_batch"]
            tail = " ".join(str(r) for r in rb)
            peak_mb = (max(m["bytes_by_batch"]) / 2**20
                       if m["bytes_by_batch"] else 0.0)
            print(f"{tag:5s} {name:28s} {m['wall']:7.1f}s "
                  f"batches={m['n_batches']:2d} "
                  f"state_rows_final={rb[-1] if rb else 0:>9,} "
                  f"peak_mb={peak_mb:8.2f}  rows_by_batch=[{tail}]",
                  flush=True)


if __name__ == "__main__":
    main()

"""End-to-end LLM training-corpus pipeline demo — the composition proof
that the operator library covers a real corpus build, not just isolated
registry queries.  Stages (each an operator family the driver verifies
separately):

  1. ingest        documents fixture (+ quality features, language id)
  2. quality gate  Gopher-ish repetition + quality-score filters
  3. exact dedup   md5 digest keep-min
  4. near dedup    MinHash-LSH candidates -> verified Jaccard -> connected
                   components -> keep cluster representative
  5. decontaminate drop train docs sharing 8-gram shingles with the
                   held-out eval split (hash split)
  6. pack          concatenate-and-split into fixed token blocks
  7. write         range-clustered parquet + one-pass observe() metrics

Run: python scripts/corpus_demo.py [sf_dir]
Prints one JSON line per stage: rows in/out + seconds — the shape of the
job a 1000-executor cluster would run nightly at 100 TB (every stage is
shuffle-bounded and map-side-combinable as documented in SCALE.md).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ab_metadata_pusher_spark.functions.hashing import md5_long  # noqa: E402
from ab_metadata_pusher_spark.operators import dedup as D  # noqa: E402
from ab_metadata_pusher_spark.operators import text as X  # noqa: E402
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402
from ab_metadata_pusher_spark.sinks.layout import write_clustered  # noqa: E402
from ab_metadata_pusher_spark.sources.fixtures import load_table  # noqa: E402

CTX = 128  # tokens per packed block


def log_stage(name: str, t0: float, n_in: int, n_out: int) -> None:
    print(json.dumps({"stage": name, "rows_in": n_in, "rows_out": n_out,
                      "sec": round(time.time() - t0, 2)}), flush=True)


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="corpus-demo",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = str(REPO / "spark-warehouse" / "corpus_demo")

    # 1. ingest + annotate
    t0 = time.time()
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()
    feats = X.quality_features(docs).join(
        X.language_id(docs).select("doc_id", "predicted_lang"), "doc_id")
    annotated = docs.join(feats.select(
        "doc_id", "len_ok", "stopword_ratio", "predicted_lang"),
        "doc_id").cache()
    log_stage("ingest_annotate", t0, n0, annotated.count())

    # 2. quality gate (score + repetition)
    t0 = time.time()
    rep = X.repetition_features(docs).select("doc_id", "rep_ok")
    gated = (annotated.join(rep, "doc_id")
             .filter(F.col("len_ok") & F.col("rep_ok")
                     & (F.col("stopword_ratio") <= 0.9)))
    n_gated = gated.count()
    log_stage("quality_gate", t0, n0, n_gated)

    # 3. exact dedup
    t0 = time.time()
    kept_ids = (D.exact_dedup_keep_min(gated)
                .select(F.col("kept_id").alias("doc_id")))
    exact = gated.join(kept_ids, "doc_id").cache()
    n_exact = exact.count()
    log_stage("exact_dedup", t0, n_gated, n_exact)

    # 3b. substring-span boilerplate report (suffix-array-style window
    #     dedup at 10-token granularity, df-gated against hot
    #     boilerplate): one row per removable duplicated span —
    #     downstream masking input, non-mutating here
    t0 = time.time()
    spans = D.duplicated_spans(exact, w=10, max_df=50)
    n_spans = spans.count()
    log_stage("substring_span_report", t0, n_exact, n_spans)

    # 4. near dedup: LSH candidates -> verified pairs -> components ->
    #    keep each cluster's min doc_id
    t0 = time.time()
    # persist: connected_components derives BOTH edge orientations from
    # this frame (two consumers), and the LSH->verify chain is the most
    # expensive plan in the pipeline — uncached it computes twice.
    pairs = D.lsh_verified_pairs(exact, threshold=0.5).persist()
    comp = D.connected_components(
        exact.select(F.col("doc_id").alias("id")),
        pairs.select(F.col("sid_a").alias("src"),
                     F.col("sid_b").alias("dst")),
        # label frame is corpus-count-sized (~500 here): narrow shuffles
        # beat 32 near-empty partitions per iteration (measured 3.1s ->
        # 1.5s); size to ~label_rows/1e6 on a real cluster
        shuffle_partitions=8)
    keep = (comp.groupBy("label").agg(F.min("id").alias("doc_id")))
    # localCheckpoint truncates the iterative-CC lineage: every later
    # stage re-plans from materialized partitions, not the loop's tree
    # (SCALE.md graph section; without it the final write's plan tree
    # is loop-depth-deep).
    near = exact.join(keep, "doc_id").localCheckpoint()
    n_near = near.count()
    log_stage("near_dedup", t0, n_exact, n_near)

    # 5. decontaminate vs held-out eval split (hash split, 8-gram overlap)
    t0 = time.time()
    bucket = md5_long(F.col("doc_id").cast("string")) % 100
    train = near.filter(bucket < 90)
    evals = near.filter(bucket >= 90)
    grams = lambda df: df.select(  # noqa: E731
        "doc_id", F.explode(X.shingle_array(X.tokens("text"), 8)).alias("g"))
    dirty = (grams(train).join(grams(evals).select("g").distinct(), "g")
             .select("doc_id").distinct())
    clean = train.join(dirty, "doc_id", "left_anti").cache()
    n_clean = clean.count()
    log_stage("decontaminate", t0, n_near, n_clean)

    # 6. pack into fixed token blocks per source shard
    t0 = time.time()
    from pyspark.sql import Window
    toks = clean.select("source", "doc_id",
                        F.size(X.tokens("text")).alias("n_tok"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = (toks.withColumn("cum", F.sum("n_tok").over(w))
              .withColumn("block", ((F.col("cum") - 1) / CTX).cast("long")))
    n_blocks = packed.select("source", "block").distinct().count()
    log_stage("pack_sequences", t0, n_clean, n_blocks)

    # 7. write range-clustered + one-pass metrics
    t0 = time.time()
    obs = Observation("publish")
    final = clean.join(packed.select("doc_id", "block"), "doc_id").observe(
        obs, F.count(F.lit(1)).alias("rows"),
        F.sum("n_chars").alias("chars")).persist()
    # persist() sits ABOVE the observe node: write_clustered's
    # repartitionByRange SAMPLES its input with an extra job, so an
    # unpersisted plan would stream through observe twice and
    # double-count every metric.
    write_clustered(final, out_dir, key="doc_id", n_files=4)
    final.unpersist()
    m = obs.get
    log_stage("write_clustered", t0, n_clean, int(m["rows"]))
    print(json.dumps({"stage": "DONE", "out_dir": out_dir,
                      "total_chars": int(m["chars"])}), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])

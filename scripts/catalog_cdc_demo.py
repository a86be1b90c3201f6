"""Catalog-CDC demo: the full reference loop made Spark-native AND
incremental — what the consumer side of the queue (which the reference
leaves entirely to its downstream, publisher/aws_sqs_csv_puiblisher.py
just fires envelopes) looks like as a streaming job.

Tick 1: extract the catalog -> property-graph nodes -> publish chunked
envelopes to a queue directory.
Tick 2: mutate the catalog (a table gains a column, another disappears)
and publish again under a new tag.
Consumer: ONE streaming query over the envelope source (the Python
streaming data source) with a checkpoint drains both waves incrementally,
and `cdc_latest_snapshot` semantics (last-tag-wins per node key) rebuild
the current catalog state; the demo then diffs the two states —
added/removed/changed nodes — and asserts the mutations round-tripped.

Usage: python scripts/catalog_cdc_demo.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from ab_metadata_pusher_spark.operators.graph import to_nodes  # noqa: E402
from ab_metadata_pusher_spark.operators.metadata import (  # noqa: E402
    table_metadata,
)
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402
from ab_metadata_pusher_spark.sinks.envelope import pack_envelopes  # noqa: E402
from ab_metadata_pusher_spark.sources.catalog import (  # noqa: E402
    catalog_columns,
)
from ab_metadata_pusher_spark.sources.envelope_source import (  # noqa: E402
    EnvelopeDataSource,
)


def publish_wave(nodes_df, tag: str, qdir: Path) -> int:
    recs = [r.asDict(recursive=True) for r in nodes_df.collect()]
    bodies = list(pack_envelopes(recs, [], tag, max_bytes=8192))
    for i, body in enumerate(bodies):
        (qdir / f"{tag}_{i:04d}.json").write_text(body)
    return len(bodies)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_spark(app_name="catalog-cdc-demo",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(EnvelopeDataSource)

    tmp = Path(tempfile.mkdtemp(prefix="catalog_cdc_"))
    qdir = tmp / "queue"
    qdir.mkdir()
    ckpt = str(tmp / "ckpt")
    state_dir = str(tmp / "state")

    # ---- tick 1: baseline catalog ------------------------------------
    cat1 = catalog_columns(spark, args.sf_dir)
    nodes1 = to_nodes(table_metadata(cat1))
    n1 = publish_wave(nodes1, "v1", qdir)

    # ---- tick 2: catalog drift ---------------------------------------
    # one table gains a column, one table disappears
    extra = cat1.filter(F.col("table_name") == "orders").limit(1) \
        .withColumn("col_name", F.lit("o_new_flag")) \
        .withColumn("col_type", F.lit("boolean")) \
        .withColumn("col_sort_order", F.lit(999))
    cat2 = cat1.filter(F.col("table_name") != "region").unionByName(extra)
    nodes2 = to_nodes(table_metadata(cat2))
    n2 = publish_wave(nodes2, "v2", qdir)
    print(f"published: wave v1 = {n1} chunks, wave v2 = {n2} chunks")

    # ---- consumer: incremental drain -> parquet state ----------------
    def drain() -> None:
        sdf = (spark.readStream.format("metadata_envelope")
               .option("path", str(qdir)).load())
        q = (sdf.writeStream.format("parquet")
             .option("path", state_dir).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    state = spark.read.parquet(state_dir)
    total = state.count()
    print(f"drained {total} node records across both tags")

    # ---- cdc_latest_snapshot semantics: last tag wins per key --------
    w = Window.partitionBy("key").orderBy(F.col("tag").desc())
    latest = (state.filter(F.col("kind") == "node")
              .withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1).drop("rn"))

    v1_keys = {r.key for r in state.filter("tag = 'v1'").select("key").collect()}
    v2_keys = {r.key for r in state.filter("tag = 'v2'").select("key").collect()}
    added = v2_keys - v1_keys
    removed = v1_keys - v2_keys
    print(f"catalog diff v1 -> v2: {len(added)} added, {len(removed)} removed")

    assert any("o_new_flag" in k for k in added), "new column node missing"
    assert any("region" in k for k in removed), "dropped table still present"
    assert latest.filter(F.col("tag") == "v2").count() == len(v2_keys)
    # second drain with the same checkpoint must be a no-op (exactly once)
    drain()
    assert spark.read.parquet(state_dir).count() == total, "replayed records"
    print("OK: incremental drain, last-tag-wins snapshot, diff verified")


if __name__ == "__main__":
    main()

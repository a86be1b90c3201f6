"""End-to-end lifecycle demo — the reference's three entry points on the
fixture catalog, with a stub SQS client (no AWS needed).

EP1 (sample_mysql_aws_sqs_job.py): extract catalog -> property graph ->
stage -> publish chunked envelopes to SQS.
EP3 (customized_job.py:65-67): publisher-only re-publish from staging,
no re-extract.
Plus the interchange/legacy staging encodings the reference's CSV
contract maps onto.

Usage: python scripts/pipeline_demo.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ab_metadata_pusher_spark.jobs import build_metadata_job  # noqa: E402
from ab_metadata_pusher_spark.pipeline import Pipeline  # noqa: E402
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402


class _StubSqs:
    """Records send_message_batch calls instead of hitting AWS."""

    def __init__(self) -> None:
        self.batches: list[dict] = []

    def send_message_batch(self, QueueUrl, Entries):
        self.batches.append({"QueueUrl": QueueUrl, "Entries": Entries})
        return {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_spark(app_name="pipeline-demo",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    stub = _StubSqs()
    base = tempfile.mkdtemp(prefix="demo_staging_")

    # EP1: full extract -> stage -> publish
    pipe = build_metadata_job("fixtures", "aws_sqs", {
        "sf_dir": args.sf_dir,
        "staging_dir": base,
        "queue_url": "https://queue/demo.fifo",
        "client_factory": lambda: stub,
        "publish_tag": "demo-2024-01-01",
    })
    r1 = pipe.run(spark)
    envs = [json.loads(e["MessageBody"])
            for b in stub.batches for e in b["Entries"]]
    n_nodes = sum(len(e["nodes"]) for e in envs)
    n_rels = sum(len(e["relations"]) for e in envs)
    print(f"EP1  staged={r1.staged} published={r1.published} "
          f"elapsed={r1.elapsed_sec}s envelopes={len(envs)} "
          f"nodes={n_nodes} relations={n_rels} "
          f"max_bytes={max(len(e['MessageBody'].encode()) for b in stub.batches for e in b['Entries'])}")

    # EP3: publisher-only re-publish (no extract) from the same staging
    stub2 = _StubSqs()
    pipe2 = build_metadata_job("fixtures", "aws_sqs", {
        "sf_dir": args.sf_dir,
        "staging_dir": base,
        "queue_url": "https://queue/demo.fifo",
        "client_factory": lambda: stub2,
        "publish_tag": "demo-republish",
    })
    republish = Pipeline(identifier="demo_republish", staging=pipe2.staging,
                         extract=None, publish=pipe2.publish)
    r3 = republish.run(spark)
    envs3 = [json.loads(e["MessageBody"])
             for b in stub2.batches for e in b["Entries"]]
    same = (sum(len(e["nodes"]) for e in envs3) == n_nodes
            and sum(len(e["relations"]) for e in envs3) == n_rels)
    print(f"EP3  staged={r3.staged} published={r3.published} "
          f"records_match_ep1={same}")

    # interchange + legacy encodings round-trip from the staged graph
    nodes = pipe.staging.read_nodes(spark)
    rels = pipe.staging.read_relations(spark)
    pipe.staging.write_interchange(nodes, rels, fmt="json")
    pipe.staging.write_legacy_csv(nodes, rels)
    back = pipe.staging.read_interchange_nodes(spark, fmt="json")
    legacy = pipe.staging.read_legacy_nodes(spark)
    print(f"STAGE parquet_nodes={nodes.count()} json_nodes={back.count()} "
          f"legacy_csv_nodes={legacy.count()}")
    ok = back.count() == nodes.count() == legacy.count()
    print("DEMO " + ("PASS" if ok and same and r1.published else "FAIL"))
    sys.exit(0 if ok and same else 1)


if __name__ == "__main__":
    main()

"""Shared test fixtures: one SparkSession per test session + a DuckDB
oracle comparator mirroring the driver's correctness gate (row count +
column names + order-insensitive values)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from ab_metadata_pusher_spark.session import get_spark
from ab_metadata_pusher_spark.sources.fixtures import FIXTURE_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_CORRECTNESS = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", master="local[8]",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.sql.shuffle.partitions": "8"})
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables registered as views,
    replicating the driver's pre-registered views."""
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):  # datetime/date — engine-agnostic text
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def normalized_rows(cols, rows):
    """Sort columns by name, normalize cells, sort rows — the same
    order-insensitive shape the driver hashes."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in order], out


def assert_matches_oracle(spark_df, duck_con, sql: str, approx_float=True):
    """Compare a Spark DataFrame against DuckDB running ``sql``."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}")

    _, s_norm = normalized_rows(s_cols, s_rows)
    _, d_norm = normalized_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        assert a == b, f"row {i} mismatch:\n  spark={a}\n  duck ={b}"


@pytest.fixture()
def sqs_http_endpoint():
    """A local HTTP server speaking the SQS JSON protocol
    (SendMessageBatch), so tests can drive the publisher through a REAL
    boto3 client end-to-end.  Yields (port, received, lock): every
    MessageBody arrives in ``received`` under ``lock`` (executor workers
    post concurrently in distributed mode)."""
    import hashlib
    import json as _json
    import threading
    import uuid
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    received: list[str] = []
    lock = threading.Lock()

    class SqsHandler(BaseHTTPRequestHandler):
        def do_POST(self):
            raw = self.rfile.read(int(self.headers["Content-Length"]))
            req = _json.loads(raw)
            ok = []
            with lock:
                for e in req.get("Entries", []):
                    received.append(e["MessageBody"])
                    ok.append({
                        "Id": e["Id"],
                        "MessageId": str(uuid.uuid4()),
                        "MD5OfMessageBody": hashlib.md5(
                            e["MessageBody"].encode()).hexdigest(),
                    })
            body = _json.dumps({"Successful": ok, "Failed": []}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-amz-json-1.0")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), SqsHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield srv.server_address[1], received, lock
    finally:
        srv.shutdown()

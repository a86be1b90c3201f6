"""Cross-protocol wire-client edge matrix (r10 VERDICT ask #7).

One parametrized suite that EVERY native wire source must pass: a
future protocol client (another dialect, a new catalog source) inherits
the whole matrix by adding a ~10-line driver entry, instead of
re-deriving the edge list test by test.  Protocol-SPECIFIC edges
(Postgres notice interleaving, the MySQL two-byte length boundary)
stay with their emulators in tests/test_sources.py; this file holds
the edges every length-prefixed text protocol shares:

* a value longer than one TCP segment (exercises exact-length recv
  loops; on MySQL also the 0xfd three-byte length encoding),
* NULLs round-tripping as None,
* values exactly at the single-byte length boundary,
* an empty result set,
* sustained framing over many rows,
* an authentication failure surfacing as a clean error.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from test_sources import (  # noqa: E402
    _mysql_server_emulator, _pg_backend_emulator,
)

USER, PASSWORD = "amundsen", "s3cret"


def _pg_query(rows, client_password=PASSWORD):
    from ab_metadata_pusher_spark.sources.pgwire import PostgresWireSource

    srv = _pg_backend_emulator(USER, PASSWORD, "md5",
                               [("v", 25)], rows, [])
    try:
        src = PostgresWireSource(
            "127.0.0.1", srv.server_address[1], user=USER,
            database="demo", password=client_password)
        _fields, got = src.query("SELECT v")
    finally:
        srv.shutdown()
    return got


def _mysql_query(rows, client_password=PASSWORD):
    from ab_metadata_pusher_spark.sources.mysqlwire import MysqlWireSource

    srv = _mysql_server_emulator(USER, PASSWORD, [("v", 0xFD)], rows, [])
    try:
        src = MysqlWireSource(
            "127.0.0.1", srv.server_address[1], user=USER,
            database="db", password=client_password)
        _fields, got = src.query("SELECT v")
    finally:
        srv.shutdown()
    return got


DRIVERS = {"postgres": _pg_query, "mysql": _mysql_query}


@pytest.fixture(params=sorted(DRIVERS))
def wire_query(request):
    return DRIVERS[request.param]


def test_wire_value_longer_than_tcp_segment(wire_query):
    big = "x" * 100_000
    assert wire_query([(big,)]) == [(big,)]


def test_wire_null_roundtrip(wire_query):
    assert wire_query([(None,), ("a",), (None,)]) == [
        (None,), ("a",), (None,)]


@pytest.mark.parametrize("n", [250, 251, 252])
def test_wire_length_encoding_boundary(wire_query, n):
    # 251 is the MySQL single-byte length bound; harmless on Postgres,
    # where the same cell exercises ordinary int32 value lengths
    v = "b" * n
    assert wire_query([(v,)]) == [(v,)]


def test_wire_empty_resultset(wire_query):
    assert wire_query([]) == []


def test_wire_many_rows_sustained_framing(wire_query):
    rows = [(f"row-{i:05d}",) for i in range(2000)]
    assert wire_query(rows) == rows


def test_wire_bad_password_is_clean_error(wire_query):
    with pytest.raises(RuntimeError,
                       match="authentication failed|mysql error 1045"):
        wire_query([("a",)], client_password="WRONG")

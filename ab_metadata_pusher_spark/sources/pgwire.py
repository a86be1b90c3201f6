"""PostgreSQL wire-protocol catalog source — the A3 dialect LIVE, with
no JDBC driver jar and no client library.

The reference's Postgres extractor runs one bounded catalog query over
``information_schema`` (SURVEY.md §2.A A3; job/sample_postgres_aws_sqs_
job.py:7,34-41).  The Spark-native path here is
:class:`~ab_metadata_pusher_spark.sources.jdbc.JdbcCatalogSource` with
``postgres_catalog_sql`` — but the container has no Postgres JDBC jar,
so until r10 the dialect was covered as SQL text only (embedded Derby
stood in for the live read).  This module closes that gap the same way
``sources/bigquery.py`` closed A7 and ``sinks/kafka.py`` closed E6: it
speaks the PUBLIC frontend/backend protocol v3
(postgresql.org/docs/current/protocol.html) over a plain TCP socket —
startup, cleartext AND md5 password auth, simple Query, text-format
RowDescription/DataRow decode — and tests/test_sources.py drives it
against a local backend emulator end-to-end.

Driver-built result BY DESIGN: this source issues exactly one
catalog-introspection query (rows = columns in the schema), the same
bounded-collect contract as BigQuery ``load_rest``.  Corpus-scale
Postgres table reads belong to the partitioned JDBC reader (A1) once a
driver jar is present — per-byte Python decode is not the 100 TB hot
path, the executable protocol contract is the point.
"""

from __future__ import annotations

import hashlib
import io
import socket
import struct
from dataclasses import dataclass
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

__all__ = ["PostgresWireSource", "PG_TYPES"]

_PROTOCOL_V3 = 196608  # 3.0

#: text-format decoder + Spark DDL per PostgreSQL type OID
#: (pg_catalog.pg_type; only the types a catalog scan can return).
PG_TYPES: dict[int, tuple[str, object]] = {
    16: ("boolean", lambda s: s == "t"),
    18: ("string", str),            # "char"
    19: ("string", str),            # name
    20: ("bigint", int),
    21: ("int", int),
    23: ("int", int),
    25: ("string", str),            # text
    26: ("bigint", int),            # oid
    700: ("double", float),
    701: ("double", float),
    1042: ("string", str),          # bpchar
    1043: ("string", str),          # varchar
    1700: ("decimal(38,18)", Decimal),
}


def _cstring(b: io.BytesIO) -> str:
    out = bytearray()
    while (ch := b.read(1)) not in (b"", b"\x00"):
        out += ch
    return out.decode()


def _startup_payload(user: str, database: str) -> bytes:
    body = struct.pack(">i", _PROTOCOL_V3)
    for k, v in (("user", user), ("database", database),
                 ("client_encoding", "UTF8")):
        body += k.encode() + b"\x00" + v.encode() + b"\x00"
    body += b"\x00"
    return struct.pack(">i", len(body) + 4) + body


def md5_password_response(user: str, password: str, salt: bytes) -> str:
    """The documented md5 auth answer:
    'md5' + hex(md5(hex(md5(password + user)) + salt))."""
    inner = hashlib.md5((password + user).encode()).hexdigest()
    return "md5" + hashlib.md5(inner.encode() + salt).hexdigest()


@dataclass
class PostgresWireSource:
    host: str
    port: int
    user: str
    database: str
    password: str = ""
    timeout_sec: float = 30.0

    # -- protocol ------------------------------------------------------

    def _recv_message(self, sock: socket.socket) -> tuple[bytes, io.BytesIO]:
        head = self._recv_exact(sock, 5)
        kind = head[:1]
        (length,) = struct.unpack(">i", head[1:])
        return kind, io.BytesIO(self._recv_exact(sock, length - 4))

    @staticmethod
    def _recv_exact(sock: socket.socket, n: int) -> bytes:
        data = bytearray()
        while len(data) < n:
            part = sock.recv(n - len(data))
            if not part:
                raise ConnectionError("postgres server closed connection")
            data += part
        return bytes(data)

    @staticmethod
    def _error_text(body: io.BytesIO) -> str:
        fields = {}
        while (code := body.read(1)) not in (b"", b"\x00"):
            fields[code.decode()] = _cstring(body)
        return (f"{fields.get('S', 'ERROR')} {fields.get('C', '')}: "
                f"{fields.get('M', 'unknown error')}")

    def _authenticate(self, sock: socket.socket) -> None:
        sock.sendall(_startup_payload(self.user, self.database))
        while True:
            kind, body = self._recv_message(sock)
            if kind == b"E":
                raise RuntimeError(f"postgres auth: {self._error_text(body)}")
            if kind != b"R":
                raise RuntimeError(f"unexpected pre-auth message {kind!r}")
            (code,) = struct.unpack(">i", body.read(4))
            if code == 0:          # AuthenticationOk
                return
            if code == 3:          # CleartextPassword
                answer = self.password
            elif code == 5:        # MD5Password
                answer = md5_password_response(self.user, self.password,
                                               body.read(4))
            else:
                raise NotImplementedError(
                    f"postgres auth method {code} not supported "
                    f"(cleartext=3 and md5=5 are)")
            raw = answer.encode() + b"\x00"
            sock.sendall(b"p" + struct.pack(">i", len(raw) + 4) + raw)

    def _wait_ready(self, sock: socket.socket) -> None:
        """Consume ParameterStatus/BackendKeyData/Notice up to
        ReadyForQuery."""
        while True:
            kind, body = self._recv_message(sock)
            if kind == b"Z":
                return
            if kind == b"E":
                raise RuntimeError(f"postgres: {self._error_text(body)}")
            if kind not in (b"S", b"K", b"N"):
                raise RuntimeError(f"unexpected message {kind!r} "
                                   "before ReadyForQuery")

    def query(self, sql: str) -> tuple[list[tuple[str, int]], list[tuple]]:
        """Simple-Query round trip: returns ([(column, type_oid)], rows)
        with text-format values decoded per :data:`PG_TYPES` (unknown
        OIDs decode as strings — lossless for a catalog scan)."""
        with socket.create_connection((self.host, self.port),
                                      timeout=self.timeout_sec) as sock:
            self._authenticate(sock)
            self._wait_ready(sock)
            raw = sql.encode() + b"\x00"
            sock.sendall(b"Q" + struct.pack(">i", len(raw) + 4) + raw)
            fields: list[tuple[str, int]] = []
            rows: list[tuple] = []
            while True:
                kind, body = self._recv_message(sock)
                if kind == b"T":
                    (nfields,) = struct.unpack(">h", body.read(2))
                    for _ in range(nfields):
                        name = _cstring(body)
                        _tbl, _att, oid, _len, _mod, fmt = struct.unpack(
                            ">ihihih", body.read(18))
                        if fmt != 0:
                            raise RuntimeError(
                                "binary-format column in simple query")
                        fields.append((name, oid))
                elif kind == b"D":
                    (ncols,) = struct.unpack(">h", body.read(2))
                    vals = []
                    for i in range(ncols):
                        (vlen,) = struct.unpack(">i", body.read(4))
                        if vlen < 0:
                            vals.append(None)
                        else:
                            text = body.read(vlen).decode()
                            dec = PG_TYPES.get(fields[i][1], ("string", str))
                            vals.append(dec[1](text))
                    rows.append(tuple(vals))
                elif kind == b"E":
                    raise RuntimeError(
                        f"postgres query: {self._error_text(body)}")
                elif kind == b"Z":
                    return fields, rows
                elif kind not in (b"C", b"N", b"S"):
                    raise RuntimeError(f"unexpected message {kind!r} "
                                       "in query response")

    # -- Spark surface -------------------------------------------------

    def load_query(self, spark: SparkSession, sql: str) -> DataFrame:
        """Run ``sql`` and land the (bounded) result as a DataFrame with
        OID-mapped Spark types."""
        fields, rows = self.query(sql)
        ddl = ", ".join(
            f"`{name}` {PG_TYPES.get(oid, ('string', str))[0]}"
            for name, oid in fields)
        return spark.createDataFrame(rows, ddl)

    def load_catalog(self, spark: SparkSession, schema: str) -> DataFrame:
        """The A3 catalog scan over the wire: ``postgres_catalog_sql``
        executed server-side, landed as the catalog_columns frame
        (FIXTURES.md B1) that operators/metadata.py consumes."""
        from ab_metadata_pusher_spark.sources.jdbc import postgres_catalog_sql
        return self.load_query(
            spark, postgres_catalog_sql(schema, database=self.database))

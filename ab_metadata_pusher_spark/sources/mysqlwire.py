"""MySQL wire-protocol catalog source — the A2 dialect LIVE, with no
JDBC driver jar and no client library (the pair of ``pgwire.py``).

The reference's MySQL extractor runs one bounded catalog query over
``INFORMATION_SCHEMA`` (SURVEY.md §2.A A2; job/sample_mysql_aws_sqs_
job.py:7,34-41).  This module speaks the PUBLIC client/server protocol
(dev.mysql.com/doc/dev/mysql-server: 3-byte little-endian packet
framing, HandshakeV10 → HandshakeResponse41 with the
``mysql_native_password`` scramble, COM_QUERY → text resultset with
length-encoded values) over a plain TCP socket; tests/test_sources.py
drives it against a local server emulator end-to-end, including the
auth-failure path.

Driver-built result BY DESIGN — one catalog-introspection query, rows
= columns in the schema, the same bounded-collect contract as BigQuery
``load_rest`` and ``pgwire.load_catalog``.  Corpus-scale MySQL reads
belong to the partitioned JDBC reader (A1) once a driver jar is
present.
"""

from __future__ import annotations

import hashlib
import io
import socket
import struct
from dataclasses import dataclass
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

__all__ = ["MysqlWireSource", "MYSQL_TYPES", "native_password_scramble"]

# capability flags (public protocol constants)
_CLIENT_LONG_PASSWORD = 0x1
_CLIENT_PROTOCOL_41 = 0x200
_CLIENT_SECURE_CONNECTION = 0x8000
_CLIENT_PLUGIN_AUTH = 0x80000
_CLIENT_CONNECT_WITH_DB = 0x8

#: text-protocol decoder + Spark DDL per MySQL column type byte
#: (ColumnDefinition41 ``type``); text resultsets carry strings, so the
#: decoder recovers the native type.  Unknowns stay strings (lossless).
MYSQL_TYPES: dict[int, tuple[str, object]] = {
    0x01: ("int", int),            # TINY
    0x02: ("int", int),            # SHORT
    0x03: ("int", int),            # LONG
    0x08: ("bigint", int),         # LONGLONG
    0x09: ("int", int),            # INT24
    0x04: ("double", float),       # FLOAT (text form)
    0x05: ("double", float),       # DOUBLE
    0x00: ("decimal(38,18)", Decimal),   # DECIMAL
    0xF6: ("decimal(38,18)", Decimal),   # NEWDECIMAL
    0x0F: ("string", str),         # VARCHAR
    0xFD: ("string", str),         # VAR_STRING
    0xFE: ("string", str),         # STRING
    0xFC: ("string", str),         # BLOB (text charset)
}


def native_password_scramble(password: str, salt: bytes) -> bytes:
    """``mysql_native_password``: SHA1(pwd) XOR SHA1(salt + SHA1(SHA1(pwd)));
    empty password answers with zero bytes."""
    if not password:
        return b""
    p1 = hashlib.sha1(password.encode()).digest()
    p2 = hashlib.sha1(p1).digest()
    mask = hashlib.sha1(salt + p2).digest()
    return bytes(a ^ b for a, b in zip(p1, mask))


def _lenenc_int(b: io.BytesIO) -> int | None:
    first = b.read(1)[0]
    if first < 0xFB:
        return first
    if first == 0xFB:          # NULL marker inside a row
        return None
    if first == 0xFC:
        return int.from_bytes(b.read(2), "little")
    if first == 0xFD:
        return int.from_bytes(b.read(3), "little")
    return int.from_bytes(b.read(8), "little")


def _lenenc_str(b: io.BytesIO) -> str | None:
    n = _lenenc_int(b)
    return None if n is None else b.read(n).decode()


@dataclass
class MysqlWireSource:
    host: str
    port: int
    user: str
    database: str
    password: str = ""
    timeout_sec: float = 30.0

    # -- packet framing -------------------------------------------------

    @staticmethod
    def _recv_exact(sock: socket.socket, n: int) -> bytes:
        data = bytearray()
        while len(data) < n:
            part = sock.recv(n - len(data))
            if not part:
                raise ConnectionError("mysql server closed connection")
            data += part
        return bytes(data)

    def _recv_packet(self, sock: socket.socket) -> bytes:
        head = self._recv_exact(sock, 4)
        length = int.from_bytes(head[:3], "little")
        return self._recv_exact(sock, length)

    @staticmethod
    def _send_packet(sock: socket.socket, seq: int, payload: bytes) -> None:
        sock.sendall(len(payload).to_bytes(3, "little")
                     + bytes([seq & 0xFF]) + payload)

    @staticmethod
    def _raise_err(payload: bytes) -> None:
        b = io.BytesIO(payload)
        b.read(1)  # 0xff header
        (code,) = struct.unpack("<H", b.read(2))
        rest = b.read().decode(errors="replace")
        if rest.startswith("#"):
            rest = rest[6:]  # '#' + 5-char sql state marker
        raise RuntimeError(f"mysql error {code}: {rest}")

    # -- handshake ------------------------------------------------------

    def _handshake(self, sock: socket.socket) -> None:
        greeting = self._recv_packet(sock)
        if greeting[:1] == b"\xff":
            self._raise_err(greeting)
        b = io.BytesIO(greeting)
        if b.read(1)[0] != 10:
            raise RuntimeError("unsupported mysql handshake version")
        while b.read(1) not in (b"", b"\x00"):   # server version cstring
            pass
        b.read(4)                                # thread id
        salt = b.read(8)
        b.read(1)                                # filler
        b.read(2)                                # capabilities (lower)
        b.read(1)                                # charset
        b.read(2)                                # status
        b.read(2)                                # capabilities (upper)
        (auth_len,) = b.read(1)
        b.read(10)                               # reserved
        # part 2 is max(13, auth_len - 8) bytes incl a trailing NUL
        part2 = b.read(max(13, auth_len - 8))
        salt += part2.rstrip(b"\x00")[:12]
        caps = (_CLIENT_LONG_PASSWORD | _CLIENT_PROTOCOL_41
                | _CLIENT_SECURE_CONNECTION | _CLIENT_PLUGIN_AUTH
                | _CLIENT_CONNECT_WITH_DB)
        auth = native_password_scramble(self.password, salt)
        resp = (struct.pack("<IIB", caps, 1 << 24, 33)  # utf8_general_ci
                + b"\x00" * 23
                + self.user.encode() + b"\x00"
                + bytes([len(auth)]) + auth
                + self.database.encode() + b"\x00"
                + b"mysql_native_password\x00")
        self._send_packet(sock, 1, resp)
        reply = self._recv_packet(sock)
        if reply[:1] == b"\xff":
            self._raise_err(reply)
        if reply[:1] != b"\x00":
            raise RuntimeError(
                "unexpected auth reply (auth-method switch is not "
                "implemented; the server must accept "
                "mysql_native_password)")

    # -- COM_QUERY ------------------------------------------------------

    def query(self, sql: str) -> tuple[list[tuple[str, int]], list[tuple]]:
        """Text-protocol query: returns ([(column, type_byte)], rows)
        decoded per :data:`MYSQL_TYPES`."""
        with socket.create_connection((self.host, self.port),
                                      timeout=self.timeout_sec) as sock:
            self._handshake(sock)
            self._send_packet(sock, 0, b"\x03" + sql.encode())
            first = self._recv_packet(sock)
            if first[:1] == b"\xff":
                self._raise_err(first)
            if first[:1] == b"\x00":          # OK packet: no resultset
                return [], []
            n_cols = _lenenc_int(io.BytesIO(first))
            fields: list[tuple[str, int]] = []
            for _ in range(n_cols):
                col = io.BytesIO(self._recv_packet(sock))
                for _ in range(4):            # catalog/schema/table/org_t
                    _lenenc_str(col)
                name = _lenenc_str(col)
                _lenenc_str(col)              # org_name
                _lenenc_int(col)              # fixed-fields length (0x0c)
                col.read(2 + 4)               # charset + column_length
                type_byte = col.read(1)[0]
                fields.append((name, type_byte))
            eof = self._recv_packet(sock)
            if eof[:1] != b"\xfe":
                raise RuntimeError("expected EOF after column definitions")
            rows: list[tuple] = []
            while True:
                pkt = self._recv_packet(sock)
                if pkt[:1] == b"\xfe" and len(pkt) < 9:   # EOF
                    return fields, rows
                if pkt[:1] == b"\xff":
                    self._raise_err(pkt)
                rb = io.BytesIO(pkt)
                vals = []
                for _name, t in fields:
                    s = _lenenc_str(rb)
                    if s is None:
                        vals.append(None)
                    else:
                        vals.append(MYSQL_TYPES.get(t, ("string", str))[1](s))
                rows.append(tuple(vals))

    # -- Spark surface ---------------------------------------------------

    def load_query(self, spark: SparkSession, sql: str) -> DataFrame:
        fields, rows = self.query(sql)
        ddl = ", ".join(
            f"`{name}` {MYSQL_TYPES.get(t, ('string', str))[0]}"
            for name, t in fields)
        return spark.createDataFrame(rows, ddl)

    def load_catalog(self, spark: SparkSession,
                     where_clause_suffix: str = "") -> DataFrame:
        """The A2 catalog scan over the wire: ``mysql_catalog_sql``
        executed server-side, landed as the catalog_columns frame.
        MySQL's text protocol returns the FALSE literal as an integer
        column, so ``is_view`` is cast to the contract's boolean."""
        from pyspark.sql import functions as F

        from ab_metadata_pusher_spark.sources.jdbc import mysql_catalog_sql
        df = self.load_query(
            spark, mysql_catalog_sql(where_clause_suffix,
                                     database=self.database))
        return df.withColumn("is_view", F.col("is_view").cast("boolean"))

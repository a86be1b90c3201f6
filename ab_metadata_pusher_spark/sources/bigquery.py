"""BigQuery catalog source — the reference's declared-roadmap source
(README.md:53 lists "Support BigQuery" as future work; SURVEY.md §2.A A7).

The interface mirrors JdbcCatalogSource so the §2.B pipeline is
source-agnostic: ``catalog_query`` yields the same catalog_columns row
shape (FIXTURES.md B1) from BigQuery's INFORMATION_SCHEMA.  Three read
paths:

* ``load`` targets the public Spark BigQuery connector
  (``spark.read.format("bigquery")``, spark-bigquery-connector).  The
  connector jar is not in this container, so ``load`` raises a clear
  error until one is on the classpath.
* ``BigQueryStorageSource.load_storage`` — the 100 TB path WITHOUT the
  jar: a pure-PySpark implementation of the publicly documented
  BigQuery Storage Read API v1 wire protocol (the same API the
  connector uses).  The driver issues ONE CreateReadSession call
  (``POST /v1/{table=projects/*/datasets/*/tables/*}``, Arrow format,
  selected fields + row restriction pushed down server-side); the
  service partitions the table into N independent read streams; each
  Spark task then reads ITS stream executor-side over ``ReadRows``
  (``GET /v1/{stream}?offset=K``), decoding the serialized Arrow
  record batches straight into columnar pandas via ``mapInPandas`` —
  no driver materialization, batch-at-a-time memory, offset-resumable
  retries.  Runs end-to-end in this sandbox against a local HTTP
  emulator speaking the same JSON/base64 wire shape
  (tests/test_sources.py).
* ``load_rest`` speaks the public BigQuery REST protocol directly
  (``jobs.query`` + ``getQueryResults`` pagination, the documented v2
  JSON wire shape) and lands the result as a driver-built DataFrame.
  This is the CATALOG-SIZED fallback — same bounded-result contract as
  the legacy catalog publish (plans/metadata_queries.py): catalog
  introspection returns thousands of rows, not terabytes, and it is the
  only query this source ever issues.  It runs end-to-end in this
  sandbox against a local HTTP emulator (tests/test_sources.py), the
  same live-protocol discipline as the Derby JDBC round trip and the
  local SQS endpoint.

SCHEMA CHANGE (r9): BIGNUMERIC columns decoded by ``load_rest`` map to
``string`` (exact decimal text), not the pre-r9 ``decimal(38,9)``.
BIGNUMERIC is decimal(76,38) on the wire — wider than Spark's
decimal(38) cap — so the old mapping silently truncated range AND
scale.  Existing consumers that did arithmetic or ordering on such a
column must now cast explicitly (comparisons on the raw column are
lexicographic); callers that accept the old truncation can restore it
with ``F.col(c).cast("decimal(38,9)")`` — the loss is then visible in
their own plan.
"""

from __future__ import annotations

import base64
import http.client
import json
import time
import urllib.error
import urllib.request
from dataclasses import dataclass
from decimal import Decimal
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = ["BigQueryCatalogSource", "BigQueryStorageSource",
           "bigquery_catalog_sql", "bq_schema_to_spark",
           "bq_rows_to_python"]


def bigquery_catalog_sql(project: str, dataset: str,
                         where_clause_suffix: str = "") -> str:
    """catalog_columns-shaped query over BigQuery INFORMATION_SCHEMA.

    Same canonical aliases as the MySQL/Postgres shapes (sources/jdbc.py),
    so operators/metadata.py consumes all three identically.  BigQuery has
    no per-column comments in COLUMNS; descriptions come from
    COLUMN_FIELD_PATHS.
    """
    where = f"AND ({where_clause_suffix})" if where_clause_suffix else ""
    return f"""
SELECT
  'bigquery'               AS td_database,
  c.table_catalog          AS table_catalog,
  c.table_schema           AS table_schema,
  c.table_name             AS table_name,
  NULL                     AS table_description,
  LOWER(c.column_name)     AS col_name,
  LOWER(c.data_type)       AS col_type,
  p.description            AS col_description,
  c.ordinal_position       AS col_sort_order,
  FALSE                    AS is_view
FROM `{project}.{dataset}`.INFORMATION_SCHEMA.COLUMNS c
LEFT JOIN `{project}.{dataset}`.INFORMATION_SCHEMA.COLUMN_FIELD_PATHS p
  ON p.table_name = c.table_name AND p.column_name = c.column_name
WHERE c.ordinal_position > 0 {where}
""".strip()


@dataclass
class BigQueryCatalogSource:
    """Spark BigQuery connector read of the catalog query.

    ``viewsEnabled``/``materializationDataset`` are required by the
    connector to execute a SQL query (as opposed to a direct table read);
    reads stream over the BigQuery Storage Read API, already partitioned —
    no JDBC-style partition-column plumbing needed.
    """

    project: str
    dataset: str
    where_clause_suffix: str = ""
    materialization_dataset: str | None = None

    def reader_options(self) -> dict[str, str]:
        return {
            "query": bigquery_catalog_sql(self.project, self.dataset,
                                          self.where_clause_suffix),
            "parentProject": self.project,
            "viewsEnabled": "true",
            "materializationDataset": (self.materialization_dataset
                                       or self.dataset),
        }

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format("bigquery")
        for k, v in self.reader_options().items():
            reader = reader.option(k, v)
        try:
            return reader.load()
        except Exception as exc:  # pragma: no cover - no connector jar here
            raise NotImplementedError(
                "spark-bigquery-connector not on the classpath; add "
                "com.google.cloud.spark:spark-bigquery-with-dependencies "
                "to spark.jars.packages, or use the jar-free "
                "BigQueryStorageSource.load_storage distributed read "
                "path") from exc

    def load_rest(self, spark: SparkSession,
                  endpoint: str = "https://bigquery.googleapis.com/bigquery/v2",
                  token: str | None = None,
                  max_results_per_page: int = 10_000,
                  max_pages: int = 1_000,
                  http_timeout_sec: float = 60.0,
                  poll_backoff_sec: float = 0.5) -> DataFrame:
        """Run the catalog query over the public BigQuery REST protocol.

        POST ``{endpoint}/projects/{project}/queries`` (jobs.query), then
        page through ``getQueryResults`` on ``pageToken`` until the token
        runs out; incomplete jobs (``jobComplete: false``) are re-polled
        through the same GET.  The JSON wire shape (``schema.fields`` +
        ``rows[].f[].v`` with stringified scalars) is decoded by
        :func:`bq_schema_to_spark` / :func:`bq_rows_to_python`.

        Driver-built result by design: this source issues exactly one
        catalog-introspection query (bounded: rows = columns in the
        dataset), the same bounded-collect contract as the legacy
        catalog publish.  Corpus-scale table reads belong to ``load``
        (Storage Read API — distributed, partitioned).

        Robustness (r8 ADVICE): every HTTP call carries
        ``http_timeout_sec`` (a stalled endpoint raises instead of
        hanging the driver), and ``jobComplete: false`` re-polls sleep
        ``poll_backoff_sec`` with x2 exponential growth capped at 8s
        (jobs.query's own ``timeoutMs`` long-poll makes the first
        response usually complete; the backoff bounds the spin when it
        is not).
        """
        sql = bigquery_catalog_sql(self.project, self.dataset,
                                   self.where_clause_suffix)
        base = f"{endpoint.rstrip('/')}/projects/{self.project}/queries"
        headers = {"Content-Type": "application/json"}
        if token:
            headers["Authorization"] = f"Bearer {token}"

        def _call(url: str, payload: dict | None = None) -> dict:
            data = json.dumps(payload).encode() if payload is not None else None
            req = urllib.request.Request(url, data=data, headers=headers,
                                         method="POST" if payload else "GET")
            with urllib.request.urlopen(req,
                                        timeout=http_timeout_sec) as resp:
                return json.loads(resp.read())

        page = _call(base, {"query": sql, "useLegacySql": False,
                            "maxResults": max_results_per_page})
        schema_json = None
        raw_rows: list[dict] = []
        backoff = poll_backoff_sec
        for _ in range(max_pages):
            if page.get("jobComplete", True):
                if schema_json is None and "schema" in page:
                    schema_json = page["schema"]
                raw_rows.extend(page.get("rows", []))
                tok = page.get("pageToken")
                if not tok:
                    break
            else:
                tok = None  # incomplete: re-poll the job, no token yet
                time.sleep(backoff)
                backoff = min(backoff * 2, 8.0)
            job_id = page["jobReference"]["jobId"]
            url = f"{base}/{job_id}?maxResults={max_results_per_page}"
            if tok:
                url += f"&pageToken={tok}"
            page = _call(url)
        else:
            raise RuntimeError(
                f"BigQuery pagination did not terminate in {max_pages} pages")
        if schema_json is None:
            raise RuntimeError("BigQuery response carried no schema")
        spark_schema = bq_schema_to_spark(schema_json)
        rows = bq_rows_to_python(raw_rows, schema_json)
        return spark.createDataFrame(rows, spark_schema)


def _storage_landing_type(t):
    """Map one Arrow wire type to the type the landed DataFrame holds.

    BIGNUMERIC arrives as ``decimal256(76, 38)`` — wider than Spark's
    decimal(38) cap — so any decimal past 38 digits lands as STRING
    (exact decimal text), the same no-silent-truncation rule as
    ``load_rest``'s BIGNUMERIC mapping (note: the Arrow cast carries
    the full wire scale, e.g. ``1.50…0`` with 38 fractional digits,
    where the REST path carries the service's canonical short form).
    RECORD/STRUCT and REPEATED fields are walked recursively so a
    nested BIGNUMERIC is mapped too.  Everything else passes through
    untouched.  Returns (arrow_type, changed: bool)."""
    import pyarrow as pa

    if pa.types.is_decimal(t) and t.precision > 38:
        return pa.string(), True
    if pa.types.is_struct(t):
        fields, changed = [], False
        for f in t:
            ft, ch = _storage_landing_type(f.type)
            fields.append(pa.field(f.name, ft, f.nullable))
            changed = changed or ch
        return pa.struct(fields), changed
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        et, ch = _storage_landing_type(t.value_type)
        mk = pa.large_list if pa.types.is_large_list(t) else pa.list_
        return mk(et), ch
    return t, False


def _storage_landing_schema(arrow_schema):
    """The post-decode Arrow schema for a read session (see
    :func:`_storage_landing_type`).  Returns (schema, changed)."""
    import pyarrow as pa

    fields, changed = [], False
    for f in arrow_schema:
        ft, ch = _storage_landing_type(f.type)
        fields.append(pa.field(f.name, ft, f.nullable))
        changed = changed or ch
    return pa.schema(fields), changed


def _read_stream_batches(endpoint: str, stream: str, token: str | None,
                         schema_b64: str, offset: int = 0,
                         http_timeout_sec: float = 60.0,
                         max_attempts: int = 5,
                         retry_backoff_sec: float = 0.25) -> Iterator:
    """Executor-side ReadRows: yield pyarrow RecordBatches for one stream.

    Speaks the documented v1 REST binding ``GET /v1/{read_stream=
    projects/*/locations/*/sessions/*/streams/*}?offset=K``; the
    response is the server-streamed sequence of ReadRowsResponse
    messages as a JSON array, each carrying
    ``arrowRecordBatch.serializedRecordBatch`` (base64 Arrow IPC
    RecordBatch message) + ``rowCount``.  Batches decode against the
    session's serialized Arrow schema (``schema_b64``).

    Resumability is the Storage API's own contract: ``offset`` is the
    row offset within the stream, so a transport failure retries the
    GET from the offset of the last FULLY-DECODED batch (never
    re-yielding rows), with exponential backoff, ``max_attempts``
    per-position cap.  Pure stdlib + pyarrow — importable on executors
    with no Spark objects captured.
    """
    import pyarrow as pa  # local import: runs inside executor workers

    arrow_schema = pa.ipc.read_schema(
        pa.py_buffer(base64.b64decode(schema_b64)))
    headers = {"Authorization": f"Bearer {token}"} if token else {}
    attempts = 0
    while True:
        url = f"{endpoint.rstrip('/')}/v1/{stream}?offset={offset}"
        try:
            req = urllib.request.Request(url, headers=headers)
            with urllib.request.urlopen(req,
                                        timeout=http_timeout_sec) as resp:
                responses = json.loads(resp.read())
        # 4xx (bad auth, missing stream) is a CLIENT error the backoff
        # schedule cannot heal — fail the task immediately rather than
        # paying max_attempts * backoff per task (r9 ADVICE).  408/429
        # are the documented retryable exceptions to that rule.
        except urllib.error.HTTPError as exc:
            if 400 <= exc.code < 500 and exc.code not in (408, 429):
                raise
            attempts += 1
            if attempts >= max_attempts:
                raise
            time.sleep(retry_backoff_sec * (2 ** (attempts - 1)))
            continue
        # IncompleteRead (mid-body truncation) is an http.client
        # HTTPException — neither URLError nor OSError — and it is
        # exactly the failure the offset-resume exists for
        except (urllib.error.URLError, json.JSONDecodeError, OSError,
                http.client.HTTPException):
            attempts += 1
            if attempts >= max_attempts:
                raise
            time.sleep(retry_backoff_sec * (2 ** (attempts - 1)))
            continue
        attempts = 0  # progress resets the per-position retry budget
        for msg in responses:
            blob = msg.get("arrowRecordBatch", {}).get(
                "serializedRecordBatch")
            if not blob:
                continue
            batch = pa.ipc.read_record_batch(
                pa.py_buffer(base64.b64decode(blob)), arrow_schema)
            offset += batch.num_rows
            yield batch
        return


@dataclass
class BigQueryStorageSource:
    """Distributed BigQuery table read over the Storage Read API v1
    REST protocol — the 100 TB read path, pure PySpark (no connector
    jar).

    Same split model as the official spark-bigquery-connector: ONE
    driver-side ``CreateReadSession`` asks the service to partition the
    table into up to ``max_stream_count`` independent streams (with
    column projection + ``row_restriction`` predicate pushed down
    server-side, so executors never see dropped columns/rows); the
    session's stream list becomes an N-row DataFrame repartitioned to
    one stream per task, and ``mapInPandas`` turns each task into an
    Arrow-native ReadRows consumer (:func:`_read_stream_batches`).
    Scale properties: driver state is O(streams); executor memory is
    one record batch at a time; a lost task re-reads only its own
    stream (offset-resumable); no shuffle — the read lands already
    partitioned.

    SURVEY.md §2.A A7 (reference README.md:53 roadmap row).
    """

    project: str
    dataset: str
    table: str
    selected_fields: tuple[str, ...] = ()
    row_restriction: str = ""

    @property
    def table_path(self) -> str:
        return (f"projects/{self.project}/datasets/{self.dataset}"
                f"/tables/{self.table}")

    def create_read_session(
            self, endpoint: str, token: str | None = None,
            max_stream_count: int = 0,
            http_timeout_sec: float = 60.0) -> dict:
        """Driver-side ``CreateReadSession`` (documented REST binding
        ``POST /v1/{read_session.table=projects/*/datasets/*/tables/*}``).

        Returns the ReadSession JSON: ``name``,
        ``arrowSchema.serializedSchema`` (base64 Arrow IPC schema) and
        ``streams[].name``.  ``max_stream_count=0`` lets the service
        pick (its contract); Spark callers pass their parallelism.
        """
        body = {
            "readSession": {
                "table": self.table_path,
                "dataFormat": "ARROW",
                "readOptions": {
                    "selectedFields": list(self.selected_fields),
                    "rowRestriction": self.row_restriction,
                },
            },
            "maxStreamCount": max_stream_count,
        }
        headers = {"Content-Type": "application/json"}
        if token:
            headers["Authorization"] = f"Bearer {token}"
        url = f"{endpoint.rstrip('/')}/v1/{self.table_path}"
        req = urllib.request.Request(url, data=json.dumps(body).encode(),
                                     headers=headers, method="POST")
        with urllib.request.urlopen(req, timeout=http_timeout_sec) as resp:
            return json.loads(resp.read())

    def load_storage(self, spark: SparkSession, endpoint: str,
                     token: str | None = None,
                     max_stream_count: int | None = None,
                     http_timeout_sec: float = 60.0,
                     max_attempts: int = 5) -> DataFrame:
        """Read the table as a DataFrame partitioned one-task-per-stream.

        The returned frame's schema comes from the session's Arrow
        schema (``prefer_timestamp_ntz`` — wire instants are zoneless
        Arrow values, and NTZ keeps them identical under any session
        timezone, the same hostile-env discipline as ``load_rest``).
        """
        from pyspark.sql.pandas.types import from_arrow_schema
        import pyarrow as pa

        if max_stream_count is None:
            max_stream_count = spark.sparkContext.defaultParallelism
        session = self.create_read_session(
            endpoint, token, max_stream_count, http_timeout_sec)
        schema_b64 = session["arrowSchema"]["serializedSchema"]
        arrow_schema = pa.ipc.read_schema(
            pa.py_buffer(base64.b64decode(schema_b64)))
        landing, needs_cast = _storage_landing_schema(arrow_schema)
        spark_schema = from_arrow_schema(landing,
                                         prefer_timestamp_ntz=True)
        streams = [s["name"] for s in session.get("streams", [])]
        if not streams:  # empty table: session legitimately has 0 streams
            return spark.createDataFrame([], spark_schema)

        # plain locals only — the closure ships to executor workers
        # (the stream list is O(streams) driver state, a few KiB)
        _endpoint, _token, _timeout, _retries, _streams, _cast = (
            endpoint, token, http_timeout_sec, max_attempts, list(streams),
            needs_cast)

        def read_streams(parts: Iterator) -> Iterator:
            import pyarrow as _pa
            target = (_pa.ipc.read_schema(_pa.py_buffer(
                base64.b64decode(schema_b64))) if _cast else None)
            if target is not None:
                target = _storage_landing_schema(target)[0]
            for pdf in parts:
                for idx in pdf["id"]:
                    for batch in _read_stream_batches(
                            _endpoint, _streams[int(idx)], _token,
                            schema_b64, http_timeout_sec=_timeout,
                            max_attempts=_retries):
                        if target is not None:
                            batch = (_pa.Table.from_batches([batch])
                                     .cast(target).combine_chunks())
                        yield batch.to_pandas()

        # EXACTLY one stream per task (r9 ADVICE: round-robin
        # repartition of N single-row input partitions starts each at
        # an independent offset, so two streams could land in one task
        # and leave another empty).  spark.range(N, numPartitions=N)
        # partitions by CONTIGUOUS slices — row i IS partition i — so
        # the placement is guaranteed, not probabilistic, with no
        # exchange at all.
        stream_df = spark.range(0, len(streams), 1, len(streams))
        return stream_df.mapInPandas(read_streams, schema=spark_schema)


#: BigQuery scalar type -> (Spark DDL type, string-wire decoder).
#: REST scalars arrive as JSON strings (ints "1", bools "true",
#: timestamps as epoch-seconds strings); TIMESTAMP decodes through
#: datetime.utcfromtimestamp-equivalent arithmetic kept tz-naive so the
#: column round-trips as TIMESTAMP_NTZ semantics under any session TZ.
_BQ_SCALARS: dict[str, tuple[str, object]] = {
    "STRING": ("string", lambda v: v),
    "BYTES": ("binary", lambda v: __import__("base64").b64decode(v)),
    "INTEGER": ("bigint", int),
    "INT64": ("bigint", int),
    "FLOAT": ("double", float),
    "FLOAT64": ("double", float),
    "BOOLEAN": ("boolean", lambda v: v in (True, "true", "TRUE")),
    "BOOL": ("boolean", lambda v: v in (True, "true", "TRUE")),
    "NUMERIC": ("decimal(38,9)", Decimal),
    # BIGNUMERIC is decimal(76,38) on the wire — wider than Spark's
    # decimal(38) cap.  Mapping it to decimal(38,9) silently truncated
    # range AND scale (r8 ADVICE); carry the exact decimal string
    # instead and let the caller cast with explicit, visible loss.
    "BIGNUMERIC": ("string", str),
    "DATE": ("date", lambda v: __import__("datetime").date.fromisoformat(v)),
    # BQ TIMESTAMP is a UTC instant on the wire (epoch-seconds string);
    # decode to naive-UTC + TIMESTAMP_NTZ so the stored value is
    # identical under ANY session timezone (hostile-env discipline).
    "TIMESTAMP": ("timestamp_ntz", lambda v: (
        __import__("datetime").datetime(1970, 1, 1)
        + __import__("datetime").timedelta(seconds=float(v)))),
    # DATETIME is civil time (ISO string, no zone) — naturally NTZ.
    "DATETIME": ("timestamp_ntz", lambda v: (
        __import__("datetime").datetime.fromisoformat(v))),
}


def _bq_field_ddl(f: dict) -> str:
    t = f.get("type", "STRING").upper()
    if t in ("RECORD", "STRUCT"):
        inner = ", ".join(
            f"`{sf['name']}`: {_bq_field_ddl(sf)}"
            for sf in f.get("fields", []))
        ddl = f"struct<{inner}>"
    else:
        ddl = _BQ_SCALARS.get(t, ("string", str))[0]
    if f.get("mode", "NULLABLE").upper() == "REPEATED":
        ddl = f"array<{ddl}>"
    return ddl


def bq_schema_to_spark(schema_json: dict) -> str:
    """BigQuery ``schema.fields`` JSON -> Spark DDL schema string
    (scalars, RECORD structs, REPEATED arrays)."""
    return ", ".join(f"`{f['name']}` {_bq_field_ddl(f)}"
                     for f in schema_json.get("fields", []))


def _decode_value(v, f: dict):
    if v is None:
        return None
    mode = f.get("mode", "NULLABLE").upper()
    if mode == "REPEATED":
        elem = dict(f, mode="NULLABLE")
        return [_decode_value(x.get("v"), elem) for x in v]
    t = f.get("type", "STRING").upper()
    if t in ("RECORD", "STRUCT"):
        return tuple(_decode_value(cell.get("v"), sf)
                     for cell, sf in zip(v["f"], f.get("fields", [])))
    return _BQ_SCALARS.get(t, ("string", str))[1](v)


def bq_rows_to_python(rows: list[dict], schema_json: dict) -> list[tuple]:
    """BigQuery ``rows[].f[].v`` JSON -> Python row tuples matching
    :func:`bq_schema_to_spark`'s column order."""
    fields = schema_json.get("fields", [])
    return [tuple(_decode_value(cell.get("v"), f)
                  for cell, f in zip(r.get("f", []), fields))
            for r in rows]

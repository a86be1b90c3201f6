"""Source-interface shapes: BigQuery roadmap source (A7) and the pipeline
transform hook (C1)."""

from __future__ import annotations

from ab_metadata_pusher_spark.sources.bigquery import (
    BigQueryCatalogSource, bigquery_catalog_sql,
)


def test_bigquery_catalog_sql_shape():
    sql = bigquery_catalog_sql("proj", "ds", "c.table_name = 'orders'")
    # canonical catalog_columns aliases, same as the JDBC shapes
    for alias in ("td_database", "table_catalog", "table_schema",
                  "table_name", "table_description", "col_name", "col_type",
                  "col_description", "col_sort_order", "is_view"):
        assert alias in sql
    assert "INFORMATION_SCHEMA.COLUMNS" in sql
    assert "AND (c.table_name = 'orders')" in sql
    assert "`proj.ds`" in sql


def test_bigquery_reader_options():
    src = BigQueryCatalogSource(project="proj", dataset="ds")
    opts = src.reader_options()
    assert opts["viewsEnabled"] == "true"
    assert opts["materializationDataset"] == "ds"
    assert "INFORMATION_SCHEMA" in opts["query"]


def test_pipeline_transform_hook(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from ab_metadata_pusher_spark.operators.graph import to_nodes, to_relations
    from ab_metadata_pusher_spark.operators.metadata import table_metadata
    from ab_metadata_pusher_spark.pipeline import Pipeline
    from ab_metadata_pusher_spark.sinks.staging import StagingArea
    from ab_metadata_pusher_spark.sources.catalog import catalog_columns

    def extract(s):
        tm = table_metadata(catalog_columns(s, sf_dir))
        return to_nodes(tm), to_relations(tm)

    def transform(nodes, relations):
        return (nodes.withColumn("name", F.upper("name")), relations)

    p = Pipeline(identifier="t", staging=StagingArea(str(tmp_path)),
                 extract=extract, transform=transform)
    res = p.run(spark)
    assert res.succeeded and res.staged
    names = [r["name"] for r in p.staging.read_nodes(spark).collect()]
    assert names and all(n == n.upper() for n in names)


def test_envelope_datasource_roundtrip(spark, sf_dir, tmp_path):
    """Publish-side envelopes read back through the custom Python data
    source must reproduce every node/relation record, with one input
    partition per envelope file (the queue-drain parallelism contract)."""
    import json

    from ab_metadata_pusher_spark.operators.graph import to_nodes, to_relations
    from ab_metadata_pusher_spark.operators.metadata import table_metadata
    from ab_metadata_pusher_spark.sinks.envelope import pack_envelopes
    from ab_metadata_pusher_spark.sources.catalog import catalog_columns
    from ab_metadata_pusher_spark.sources.envelope_source import (
        EnvelopeDataSource,
    )

    tm = table_metadata(catalog_columns(spark, sf_dir))
    nodes, rels = to_nodes(tm), to_relations(tm)
    node_recs = [r.asDict() for r in nodes.collect()]
    rel_recs = [r.asDict() for r in rels.collect()]

    # small max_bytes forces several chunks -> several files/partitions
    bodies = list(pack_envelopes(node_recs, rel_recs, tag="t1",
                                 max_bytes=4096))
    assert len(bodies) > 1
    for i, body in enumerate(bodies):
        (tmp_path / f"chunk_{i:04d}.json").write_text(body)

    spark.dataSource.register(EnvelopeDataSource)
    df = (spark.read.format("metadata_envelope")
          .option("path", str(tmp_path)).load())

    assert df.rdd.getNumPartitions() == len(bodies)
    got_nodes = df.filter("kind = 'node'")
    got_rels = df.filter("kind = 'relation'")
    assert got_nodes.count() == len(node_recs)
    assert got_rels.count() == len(rel_recs)
    # value-level spot check: every node key survives, tags stamped
    assert ({r.key for r in got_nodes.select("key").collect()}
            == {r["key"] for r in node_recs})
    assert df.filter("tag <> 't1'").count() == 0
    # chunk provenance is dense 0..of-1
    chunks = {r.chunk for r in df.select("chunk").distinct().collect()}
    assert chunks == set(range(len(bodies)))


def test_binaryfile_media_ingest_sniffs_and_packs(spark, tmp_path):
    """binaryFile media ingest: distributed dir read, JVM-side magic-byte
    type sniffing (no UDF), glob pushdown, and parquet re-pack round-trip
    — the multimodal pipeline's front door."""
    from ab_metadata_pusher_spark.sources.binary_files import (
        pack_to_table, read_media_dir,
    )

    media = tmp_path / "media"
    media.mkdir()
    (media / "a.png").write_bytes(b"\x89PNG\r\n\x1a\n" + b"x" * 40)
    (media / "b.jpg").write_bytes(b"\xff\xd8\xff\xe0" + b"y" * 30)
    (media / "c.wav").write_bytes(b"RIFF1234WAVE" + b"z" * 20)
    (media / "d.txt").write_bytes(b"not media")
    sub = media / "nested"
    sub.mkdir()
    (sub / "e.png").write_bytes(b"\x89PNG\r\n\x1a\n" + b"q" * 10)

    df = read_media_dir(spark, str(media))
    got = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert got["a.png"]["media_type"] == "image/png"
    assert got["b.jpg"]["media_type"] == "image/jpeg"
    assert got["c.wav"]["media_type"] == "audio/wav"
    assert got["d.txt"]["media_type"] == "application/octet-stream"
    assert got["e.png"]["media_type"] == "image/png"  # recursive lookup
    assert got["a.png"]["n_bytes"] == 48
    assert got["a.png"]["content"][:4] == b"\x89PNG"
    # media_id is a deterministic function of path
    assert len({r["media_id"] for r in got.values()}) == 5

    only_png = read_media_dir(spark, str(media), glob="*.png")
    assert only_png.count() == 2

    out = tmp_path / "packed"
    n = pack_to_table(df, str(out))
    assert n == 1  # tiny corpus -> one right-sized file
    back = spark.read.parquet(str(out))
    assert back.count() == 5
    assert dict(back.dtypes)["content"] == "binary"


def test_parquet_merge_schema_reads_evolved_epochs(spark, tmp_path):
    """Schema-evolution READ path (pairs with the setop_union_evolve
    query): epoch 1 predates the `value` column, epoch 2 carries it;
    mergeSchema=true unions the schemas by NAME with null-fill, so
    long-lived staging dirs stay readable as columns accrete."""
    from pyspark.sql import Row

    base = str(tmp_path / "epochs")
    spark.createDataFrame(
        spark.sparkContext.parallelize(
            [Row(event_id=1, user_id=10), Row(event_id=2, user_id=20)], 1)) \
        .write.parquet(base + "/epoch=1")
    spark.createDataFrame(
        spark.sparkContext.parallelize(
            [Row(event_id=3, user_id=30, value=1.5)], 1)) \
        .write.parquet(base + "/epoch=2")

    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"event_id", "user_id", "value", "epoch"}
    rows = {r["event_id"]: r for r in df.collect()}
    assert rows[1]["value"] is None and rows[3]["value"] == 1.5
    assert rows[1]["epoch"] == 1 and rows[3]["epoch"] == 2  # discovery


def test_envelope_stream_reader_incremental_drain(spark, tmp_path):
    """The streaming side of the envelope source: two publish waves, two
    AvailableNow ticks sharing one checkpoint — the second tick must
    consume ONLY the files that appeared after the first committed
    offset (the incremental queue-drain contract)."""
    import json as _json

    from ab_metadata_pusher_spark.sinks.envelope import pack_envelopes
    from ab_metadata_pusher_spark.sources.envelope_source import (
        EnvelopeDataSource,
    )

    qdir = tmp_path / "queue"
    qdir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = tmp_path / "out"

    try:
        spark.dataSource.register(EnvelopeDataSource)
    except Exception:
        pass  # already registered in this session

    def publish(wave: int, keys: list[str]) -> None:
        recs = [{"key": k, "wave": wave} for k in keys]
        for i, body in enumerate(pack_envelopes(recs, [], f"w{wave}", 4096)):
            (qdir / f"wave{wave}_{i:04d}.json").write_text(body)

    def drain() -> None:
        sdf = (spark.readStream.format("metadata_envelope")
               .option("path", str(qdir)).load())
        q = (sdf.writeStream.format("json")
             .option("path", str(out)).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    publish(1, ["a", "b", "c"])
    drain()
    publish(2, ["d", "e"])
    drain()

    rows = [_json.loads(line)
            for p in out.glob("*.json") for line in p.read_text().splitlines()]
    keys = sorted(r["key"] for r in rows)
    assert keys == ["a", "b", "c", "d", "e"], keys
    tags = {r["tag"] for r in rows}
    assert tags == {"w1", "w2"}


def test_long_ts_divisor_magnitude_heuristic(tmp_path):
    """A raw unannotated int64 ts column is bucketed by magnitude:
    seconds/millis/micros/nanos are three orders apart, so one sampled
    value disambiguates the encoding."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ab_metadata_pusher_spark.sources.fixtures import _long_ts_divisor

    cases = {  # epoch value for ~2026 in each unit -> expected divisor
        1_770_000_000: -1_000_000,            # seconds -> multiply 1e6
        1_770_000_000_000: -1000,             # millis  -> multiply 1e3
        1_770_000_000_000_000: 1,             # micros  -> identity
        1_770_000_000_000_000_000: 1000,      # nanos   -> divide 1e3
    }
    for raw, want in cases.items():
        d = tmp_path / f"u{want}".replace("-", "m")
        d.mkdir()
        pq.write_table(
            pa.table({"ts": pa.array([raw, raw + 10], type=pa.int64())}),
            d / "events.parquet")
        assert _long_ts_divisor(str(d)) == want, (raw, want)


def test_warc_parser_roundtrip_and_truncation(spark, sf_dir, tmp_path):
    """WARC round trip: every document comes back with its exact body;
    the deliberately truncated trailing record is dropped WITHOUT losing
    the valid records before it in the same file."""
    from ab_metadata_pusher_spark.sources.warc import (
        parse_warc, prepare_documents_warc, read_warc_dir,
    )

    # pure-parser check: two records, second truncated
    good = (b"WARC/1.0\r\nWARC-Target-URI: u1\r\nContent-Length: 5\r\n\r\n"
            b"hello\r\n\r\n")
    bad = b"WARC/1.0\r\nContent-Length: 50\r\n\r\nshort"
    recs = list(parse_warc(good + bad))
    assert len(recs) == 1 and recs[0][1] == b"hello"

    path = prepare_documents_warc(spark, sf_dir, base_dir=str(tmp_path))
    got = {r.uri: r.body for r in read_warc_dir(spark, path).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    assert len(got) == len(docs)
    for d in docs:
        assert got[f"http://corpus.example/doc/{d.doc_id}"] == (d.text or "")


def test_warc_record_roundtrip_property():
    """Property check (no Spark): arbitrary bodies — including ones
    containing the record separator — and header values survive a
    synth -> parse round trip in order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ab_metadata_pusher_spark.sources.warc import (
        _record_bytes, parse_warc,
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(
        st.tuples(
            st.text(alphabet=st.characters(min_codepoint=33,
                                           max_codepoint=126),
                    min_size=1, max_size=30),
            st.binary(max_size=200)),
        min_size=1, max_size=8))
    def prop(records):
        blob = b"".join(
            _record_bytes(f"http://x/{uri}", "2026-01-01T00:00:00Z",
                          "en", body)
            for uri, body in records)
        parsed = list(parse_warc(blob))
        assert len(parsed) == len(records)
        for (uri, body), (headers, got) in zip(records, parsed):
            assert got == body
            assert headers["warc-target-uri"] == f"http://x/{uri}"

    prop()


def test_xml_corrupt_detection_requires_parsing_the_bad_column(spark, sf_dir,
                                                               tmp_path):
    """Schema-violation quarantine in the native XML source triggers
    only when the offending column survives column pruning: a plan that
    never reads doc_id sees the bad record as CLEAN.  Engine queries
    must aggregate the schema-critical column (xml_corpus_ingest does)."""
    from pyspark.sql import functions as F

    from ab_metadata_pusher_spark.sources.jsonl import DOCUMENTS_JSONL_SCHEMA
    from ab_metadata_pusher_spark.sources.xml_corpus import (
        prepare_documents_xml, read_xml_corpus,
    )

    path = prepare_documents_xml(spark, sf_dir, base_dir=str(tmp_path))
    parsed = read_xml_corpus(spark, path, DOCUMENTS_JSONL_SCHEMA)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    with_id = parsed.agg(
        F.count(F.lit(1)).alias("n"), F.count("doc_id").alias("ok"),
        F.sum(F.col("_corrupt_record").isNotNull().cast("long")).alias("bad")
    ).collect()[0]
    assert (with_id.n, with_id.ok, with_id.bad) == (n_docs + 1, n_docs, 1)

    # pruned plan (no doc_id): the same record parses clean — the
    # documented caveat this test pins down
    pruned = parsed.agg(
        F.count("lang").alias("langs"),
        F.sum(F.col("_corrupt_record").isNotNull().cast("long")).alias("bad")
    ).collect()[0]
    assert pruned.bad == 0 and pruned.langs == n_docs + 1


def test_jdbc_live_roundtrip_partitioned_and_pushed(spark, tmp_path):
    """LIVE JDBC round trip against the embedded Derby engine that ships
    in Spark's jars (no external DB needed): write a catalog-shaped
    table through the JDBC writer, read it back through
    JdbcCatalogSource in BOTH modes — whole-query (catalog-sized) and
    partitioned (partitionColumn range slices, the big-table shape) —
    and prove the scan parallelism and engine-side filter pushdown the
    A1 row claims.  MySQL/Postgres differ only in URL + dialect."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from ab_metadata_pusher_spark.sources.jdbc import JdbcCatalogSource

    url = f"jdbc:derby:{tmp_path}/livedb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    # Derby folds unquoted identifiers to UPPERCASE while Spark's writer
    # quotes exact case — uppercase names end-to-end keep both happy
    src = spark.range(1, 101).select(
        F.col("id").alias("COL_SORT_ORDER"),
        F.concat(F.lit("col_"), F.col("id")).alias("COL_NAME"),
        (F.col("id") % 7).alias("TBL"))
    (src.write.format("jdbc").option("url", url).option("driver", driver)
     .option("dbtable", "CAT_COLS").mode("overwrite").save())

    # mode 1: whole-query push (catalog-sized) — exact round trip
    whole = JdbcCatalogSource(
        url=url, driver=driver,
        query="SELECT COL_SORT_ORDER, COL_NAME, TBL FROM CAT_COLS")
    got = whole.load(spark)
    assert sorted(r.COL_SORT_ORDER for r in got.collect()) \
        == list(range(1, 101))

    # mode 2: partitioned read — 4 range slices, 4 real scan partitions
    part = JdbcCatalogSource(
        url=url, driver=driver,
        query="SELECT COL_SORT_ORDER, COL_NAME, TBL FROM CAT_COLS",
        partition_column="COL_SORT_ORDER",
        lower_bound=1, upper_bound=100, num_partitions=4)
    pdf = part.load(spark)
    assert pdf.rdd.getNumPartitions() == 4
    assert pdf.count() == 100  # range slicing must not drop/dup rows

    # engine-side filter pushes into the DB query (PushedFilters on the
    # JDBC relation), and the filtered result is exact
    filtered = pdf.filter(F.col("COL_SORT_ORDER") > 90)
    buf = io.StringIO()
    with redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters:" in plan \
        and "GreaterThan(COL_SORT_ORDER,90)" in plan, plan[:1200]
    assert filtered.count() == 10

    # error contract: partition_column without bounds fails at plan time
    import pytest as _pytest
    with _pytest.raises(ValueError, match="lower_bound"):
        JdbcCatalogSource(url=url, query="SELECT 1",
                          partition_column="x").reader_options()


def _bq_catalog_field(name, type_, mode="NULLABLE"):
    return {"name": name, "type": type_, "mode": mode}


_BQ_CATALOG_SCHEMA = {"fields": [
    _bq_catalog_field("td_database", "STRING"),
    _bq_catalog_field("table_catalog", "STRING"),
    _bq_catalog_field("table_schema", "STRING"),
    _bq_catalog_field("table_name", "STRING"),
    _bq_catalog_field("table_description", "STRING"),
    _bq_catalog_field("col_name", "STRING"),
    _bq_catalog_field("col_type", "STRING"),
    _bq_catalog_field("col_description", "STRING"),
    _bq_catalog_field("col_sort_order", "INTEGER"),
    _bq_catalog_field("is_view", "BOOLEAN"),
]}


def _bq_row(*vals):
    return {"f": [{"v": None if v is None else
                   (str(v).lower() if isinstance(v, bool) else str(v))}
                  for v in vals]}


def _bq_emulator(page1, page2, calls):
    """A local HTTP server speaking the documented jobs.query protocol:
    an incomplete first response (jobComplete=false), then TWO result
    pages chained by pageToken.  Returns the started server; the caller
    shuts it down.  Shared by the load_rest round-trip test and the A4
    dispatch end-to-end test."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class BqHandler(BaseHTTPRequestHandler):
        def _reply(self, payload):
            body = _json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            req = _json.loads(
                self.rfile.read(int(self.headers["Content-Length"])))
            calls.append(("POST", self.path, req))
            assert req["useLegacySql"] is False
            assert "INFORMATION_SCHEMA" in req["query"]
            # job still running: no schema, no rows yet
            self._reply({"kind": "bigquery#queryResponse",
                         "jobReference": {"projectId": "proj",
                                          "jobId": "job_1"},
                         "jobComplete": False})

        def do_GET(self):
            calls.append(("GET", self.path, None))
            if "pageToken=tok2" in self.path:
                self._reply({"jobReference": {"projectId": "proj",
                                              "jobId": "job_1"},
                             "jobComplete": True, "rows": page2})
            else:
                self._reply({"jobReference": {"projectId": "proj",
                                              "jobId": "job_1"},
                             "jobComplete": True,
                             "schema": _BQ_CATALOG_SCHEMA,
                             "rows": page1, "pageToken": "tok2"})

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), BqHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


_BQ_PAGE1 = [
    _bq_row("bigquery", "proj", "ds", "orders", None,
            "o_orderkey", "INT64", "order pk", 1, False),
    _bq_row("bigquery", "proj", "ds", "orders", None,
            "o_comment", "STRING", None, 2, False),
]
_BQ_PAGE2 = [
    _bq_row("bigquery", "proj", "ds", "orders", None,
            "o_totalprice", "NUMERIC", "gross", 3, False),
]


def test_bigquery_rest_round_trip_live_http(spark):
    """A7 end-to-end in-sandbox: drive load_rest through the REAL local
    HTTP emulator — incomplete first response, then two pageToken-chained
    pages — and fold the landed DataFrame through table_metadata into
    the nested B2 record."""
    from ab_metadata_pusher_spark.operators.metadata import table_metadata

    calls = []
    srv = _bq_emulator(_BQ_PAGE1, _BQ_PAGE2, calls)
    try:
        src = BigQueryCatalogSource(project="proj", dataset="ds")
        df = src.load_rest(
            spark, endpoint=f"http://127.0.0.1:{srv.server_address[1]}")
        assert [f.name for f in df.schema.fields] == [
            f["name"] for f in _BQ_CATALOG_SCHEMA["fields"]]
        assert df.schema["col_sort_order"].dataType.simpleString() == "bigint"
        assert df.count() == 3

        tm = table_metadata(df).collect()
        assert len(tm) == 1
        rec = tm[0]
        assert rec["table_name"] == "orders" and rec["cluster"] == "proj"
        cols = [(c["sort_order"], c["name"], c["description"]) for c in
                rec["columns"]]
        assert cols == [(1, "o_orderkey", "order pk"),
                        (2, "o_comment", ""),
                        (3, "o_totalprice", "gross")]
    finally:
        srv.shutdown()
    # protocol shape: one POST (incomplete), one job re-poll GET, one
    # pageToken GET
    assert [m for m, _, _ in calls] == ["POST", "GET", "GET"]


def test_bigquery_job_dispatch_end_to_end(spark, tmp_path, monkeypatch):
    """A4 x A7 (r8 VERDICT ask #3): TARGET_DB_TYPE=bigquery resolves
    through job_from_env — the same dispatch contract as
    mysql/postgres — and runs the full Pipeline against the live local
    jobs.query emulator, landing staged nodes/relations."""
    from ab_metadata_pusher_spark.jobs import job_from_env
    from ab_metadata_pusher_spark.sinks.staging import StagingArea

    calls = []
    srv = _bq_emulator(_BQ_PAGE1, _BQ_PAGE2, calls)
    staging = str(tmp_path / "bq_job")
    try:
        monkeypatch.setenv("TARGET_DB_TYPE", "bigquery")
        monkeypatch.setenv("TARGET_MESSAGE_QUEUE_TYPE", "none")
        monkeypatch.setenv("GCP_PROJECT", "proj")
        monkeypatch.setenv("BQ_DATASET", "ds")
        monkeypatch.setenv(
            "BQ_ENDPOINT", f"http://127.0.0.1:{srv.server_address[1]}")
        pipe = job_from_env({"staging_dir": staging})
        assert pipe.identifier == "bigquery_none"
        result = pipe.run(spark)
    finally:
        srv.shutdown()
    assert result.succeeded and result.staged and not result.published
    assert [m for m, _, _ in calls] == ["POST", "GET", "GET"]
    nodes = StagingArea(staging).read_nodes(spark)
    names = {r["name"] for r in nodes.collect() if r["label"] == "Column"}
    assert names == {"o_orderkey", "o_comment", "o_totalprice"}
    rels = StagingArea(staging).read_relations(spark)
    assert rels.count() > 0


def test_bigquery_rest_type_decoding():
    """Wire-shape decode: stringified scalars, REPEATED arrays, nested
    RECORD structs, NTZ timestamps."""
    from datetime import date, datetime
    from decimal import Decimal

    from ab_metadata_pusher_spark.sources.bigquery import (
        bq_rows_to_python, bq_schema_to_spark,
    )

    schema = {"fields": [
        _bq_catalog_field("s", "STRING"),
        _bq_catalog_field("i", "INT64"),
        _bq_catalog_field("x", "FLOAT64"),
        _bq_catalog_field("b", "BOOL"),
        _bq_catalog_field("n", "NUMERIC"),
        _bq_catalog_field("d", "DATE"),
        _bq_catalog_field("ts", "TIMESTAMP"),
        _bq_catalog_field("tags", "STRING", mode="REPEATED"),
        {"name": "rec", "type": "RECORD",
         "fields": [_bq_catalog_field("k", "INT64"),
                    _bq_catalog_field("v", "STRING")]},
    ]}
    ddl = bq_schema_to_spark(schema)
    assert "`i` bigint" in ddl and "array<string>" in ddl \
        and "struct<`k`: bigint, `v`: string>" in ddl \
        and "`ts` timestamp_ntz" in ddl
    rows = [{"f": [
        {"v": "abc"}, {"v": "42"}, {"v": "1.5"}, {"v": "true"},
        {"v": "12.100000000"}, {"v": "2026-08-15"}, {"v": "1755216000.0"},
        {"v": [{"v": "t1"}, {"v": "t2"}]},
        {"v": {"f": [{"v": "7"}, {"v": "x"}]}},
    ]}, {"f": [{"v": None}] * 9}]
    out = bq_rows_to_python(rows, schema)
    assert out[0] == ("abc", 42, 1.5, True, Decimal("12.100000000"),
                      date(2026, 8, 15),
                      datetime(2025, 8, 15, 0, 0), ["t1", "t2"], (7, "x"))
    assert out[1] == (None,) * 9


def test_bigquery_bignumeric_survives_as_exact_string():
    """r8 ADVICE: BIGNUMERIC is decimal(76,38) on the wire — wider than
    Spark's decimal(38) — so mapping it to decimal(38,9) silently lost
    range and scale.  It now lands as the exact decimal STRING; casting
    (and its loss) is the caller's explicit choice."""
    from ab_metadata_pusher_spark.sources.bigquery import (
        bq_rows_to_python, bq_schema_to_spark,
    )

    schema = {"fields": [_bq_catalog_field("big", "BIGNUMERIC")]}
    assert bq_schema_to_spark(schema) == "`big` string"
    # 50 integer digits + 38 fractional digits: representable in
    # neither decimal(38,9) range nor scale
    wire = "12345678901234567890123456789012345678901234567890." + "9" * 38
    out = bq_rows_to_python([{"f": [{"v": wire}]}], schema)
    assert out[0] == (wire,)


def test_bigquery_rest_polls_with_timeout_and_backoff(monkeypatch):
    """r8 ADVICE: every HTTP call must carry a timeout (a stalled
    endpoint raises, never hangs the driver) and jobComplete=false
    re-polls must back off instead of spinning."""
    import io
    import json as _json
    import urllib.request as _url

    from ab_metadata_pusher_spark.sources import bigquery as bq

    responses = [
        {"jobReference": {"jobId": "j"}, "jobComplete": False},
        {"jobReference": {"jobId": "j"}, "jobComplete": False},
        {"jobReference": {"jobId": "j"}, "jobComplete": True,
         "schema": {"fields": [_bq_catalog_field("s", "STRING")]},
         "rows": [{"f": [{"v": "ok"}]}]},
    ]
    seen_timeouts = []
    sleeps = []

    def fake_urlopen(req, timeout=None):
        seen_timeouts.append(timeout)
        return io.BytesIO(_json.dumps(responses.pop(0)).encode())

    monkeypatch.setattr(_url, "urlopen", fake_urlopen)
    monkeypatch.setattr(bq.time, "sleep", sleeps.append)

    class _FakeSpark:
        def createDataFrame(self, rows, schema):
            return (rows, schema)

    src = bq.BigQueryCatalogSource(project="p", dataset="d")
    rows, ddl = src.load_rest(
        _FakeSpark(), endpoint="http://x", http_timeout_sec=7.5,
        poll_backoff_sec=0.25)
    assert rows == [("ok",)] and ddl == "`s` string"
    assert seen_timeouts == [7.5, 7.5, 7.5]
    assert sleeps == [0.25, 0.5]  # exponential, per incomplete poll


# ---------------------------------------------------------------------------
# A7, the 100 TB path: Storage Read API v1 over live local HTTP
# ---------------------------------------------------------------------------

def _storage_emulator(parquet_path, n_streams, batch_rows, calls,
                      fail_first_get_on=None, require_token=None,
                      table=None):
    """A local HTTP server speaking the documented Storage Read API v1
    REST wire shape: CreateReadSession (``POST /v1/{table}``) answers
    with a session whose Arrow schema + stream names cover
    ``parquet_path`` split into ``n_streams`` row ranges (selected
    fields projected, rowRestriction applied — the server-side pushdown
    the real service performs); ReadRows (``GET /v1/{stream}?offset=K``)
    streams each range back as base64 Arrow IPC record batches of
    ``batch_rows`` rows.  ``fail_first_get_on`` injects one 503 on that
    stream index to prove the client's offset-resume retry."""
    import json as _json
    import base64 as _b64
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import urlparse, parse_qs

    import duckdb as _duckdb

    state = {"splits": None, "schema": None, "failed_once": set()}

    class StorageHandler(BaseHTTPRequestHandler):
        def _reply(self, payload, code=200):
            body = _json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _auth_ok(self):
            if require_token is None:
                return True
            return (self.headers.get("Authorization")
                    == f"Bearer {require_token}")

        def do_POST(self):
            req = _json.loads(
                self.rfile.read(int(self.headers["Content-Length"])))
            calls.append(("POST", self.path, req))
            if not self._auth_ok():
                return self._reply({"error": {"code": 401}}, code=401)
            rs = req["readSession"]
            assert rs["dataFormat"] == "ARROW"
            opts = rs.get("readOptions", {})
            if table is not None:
                # pre-built Arrow table: types DuckDB cannot produce
                # (struct, decimal256/BIGNUMERIC) ride the wire as-is
                tbl = table.combine_chunks()
            else:
                cols = ", ".join(opts.get("selectedFields") or ["*"])
                where = opts.get("rowRestriction") or "TRUE"
                tbl = _duckdb.query(
                    f"SELECT {cols} FROM read_parquet('{parquet_path}') "
                    f"WHERE {where}").arrow().combine_chunks()
            n = min(max(req.get("maxStreamCount") or n_streams, 1),
                    n_streams)
            per = -(-tbl.num_rows // n) if tbl.num_rows else 1
            state["splits"] = [tbl.slice(i * per, per) for i in range(n)
                               if i * per < tbl.num_rows]
            state["schema"] = tbl.schema
            name = "projects/p/locations/us/sessions/s1"
            self._reply({
                "name": name,
                "dataFormat": "ARROW",
                "arrowSchema": {"serializedSchema": _b64.b64encode(
                    tbl.schema.serialize().to_pybytes()).decode()},
                "streams": [{"name": f"{name}/streams/{i}"}
                            for i in range(len(state["splits"]))],
            })

        def do_GET(self):
            parsed = urlparse(self.path)
            offset = int(parse_qs(parsed.query).get("offset", ["0"])[0])
            calls.append(("GET", parsed.path, offset))
            if not self._auth_ok():
                return self._reply({"error": {"code": 401}}, code=401)
            idx = int(parsed.path.rsplit("/", 1)[1])
            if (fail_first_get_on == idx
                    and idx not in state["failed_once"]):
                state["failed_once"].add(idx)
                return self._reply({"error": {"code": 503}}, code=503)
            split = state["splits"][idx].slice(offset)
            out = []
            for start in range(0, split.num_rows, batch_rows):
                b = split.slice(start, batch_rows).to_batches()
                assert len(b) == 1
                out.append({
                    "arrowRecordBatch": {"serializedRecordBatch":
                        _b64.b64encode(
                            b[0].serialize().to_pybytes()).decode()},
                    "rowCount": str(b[0].num_rows)})
            self._reply(out)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), StorageHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def test_bigquery_storage_read_distributed_live_http(spark, sf_dir):
    """A7 100 TB path, end-to-end in-sandbox: CreateReadSession splits
    orders into 4 streams; executors read their streams over live HTTP
    (one injected 503 proves the offset-resume retry), decode Arrow
    batches, and the landed frame equals the parquet read under the
    pushed-down projection + restriction."""
    from ab_metadata_pusher_spark.sources.bigquery import (
        BigQueryStorageSource)

    calls = []
    srv = _storage_emulator(f"{sf_dir}/orders.parquet", n_streams=4,
                            batch_rows=100, calls=calls,
                            fail_first_get_on=1, require_token="tok-7")
    try:
        src = BigQueryStorageSource(
            project="p", dataset="d", table="orders",
            selected_fields=("o_orderkey", "o_totalprice", "o_orderdate"),
            row_restriction="o_totalprice > 150000")
        df = src.load_storage(
            spark, endpoint=f"http://127.0.0.1:{srv.server_address[1]}",
            token="tok-7", max_stream_count=4)
        # one stream per task, landed already partitioned — no shuffle
        assert df.rdd.getNumPartitions() == 4
        got = sorted(tuple(r) for r in df.collect())
    finally:
        srv.shutdown()

    exp_df = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .where("o_totalprice > 150000")
              .selectExpr("o_orderkey", "o_totalprice",
                          "CAST(o_orderdate AS timestamp_ntz)"))
    assert df.schema == exp_df.schema
    exp = sorted(tuple(r) for r in exp_df.collect())
    assert got == exp and len(got) > 100

    # wire shape: 1 POST; the stream-1 503 forces exactly one retry GET
    posts = [c for c in calls if c[0] == "POST"]
    gets = [c for c in calls if c[0] == "GET"]
    assert len(posts) == 1
    assert posts[0][2]["readSession"]["readOptions"]["rowRestriction"] == \
        "o_totalprice > 150000"
    assert len(gets) == 5
    retried = [c for c in gets if c[1].endswith("/streams/1")]
    assert [off for _, _, off in retried] == [0, 0]  # 503 then resume@0


def test_bigquery_storage_readrows_offset_resumes_mid_stream(sf_dir):
    """The offset contract itself: a nonzero ``offset`` skips exactly
    the rows already consumed (the Storage API's documented resume
    semantics), and batches decode against the session schema."""
    from ab_metadata_pusher_spark.sources.bigquery import (
        BigQueryStorageSource, _read_stream_batches)

    calls = []
    srv = _storage_emulator(f"{sf_dir}/orders.parquet", n_streams=1,
                            batch_rows=64, calls=calls)
    try:
        endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
        src = BigQueryStorageSource(project="p", dataset="d",
                                    table="orders")
        session = src.create_read_session(endpoint, max_stream_count=1)
        schema_b64 = session["arrowSchema"]["serializedSchema"]
        stream = session["streams"][0]["name"]
        full = [b.num_rows for b in _read_stream_batches(
            endpoint, stream, None, schema_b64)]
        resumed = sum(b.num_rows for b in _read_stream_batches(
            endpoint, stream, None, schema_b64, offset=1400))
    finally:
        srv.shutdown()
    assert sum(full) == 1500 and full[0] == 64
    assert resumed == 100


def test_bigquery_storage_empty_result_yields_empty_frame(spark, sf_dir):
    """A restriction matching nothing: the session has zero streams and
    load_storage returns an empty frame with the session schema."""
    from ab_metadata_pusher_spark.sources.bigquery import (
        BigQueryStorageSource)

    srv = _storage_emulator(f"{sf_dir}/orders.parquet", n_streams=2,
                            batch_rows=64, calls=[])
    try:
        src = BigQueryStorageSource(project="p", dataset="d",
                                    table="orders",
                                    selected_fields=("o_orderkey",),
                                    row_restriction="o_orderkey < 0")
        df = src.load_storage(
            spark, endpoint=f"http://127.0.0.1:{srv.server_address[1]}")
        assert df.columns == ["o_orderkey"]
        assert df.count() == 0
    finally:
        srv.shutdown()


def test_bigquery_storage_reads_list_columns(spark, sf_dir):
    """REPEATED fields ride the same Arrow wire: a list<float> column
    (embeddings) survives batch decode -> pandas -> mapInPandas intact,
    element-exact vs the parquet read."""
    from ab_metadata_pusher_spark.sources.bigquery import (
        BigQueryStorageSource)

    srv = _storage_emulator(f"{sf_dir}/embeddings.parquet", n_streams=3,
                            batch_rows=200, calls=[])
    try:
        src = BigQueryStorageSource(project="p", dataset="d",
                                    table="embeddings",
                                    row_restriction="vec_id < 300")
        df = src.load_storage(
            spark, endpoint=f"http://127.0.0.1:{srv.server_address[1]}",
            max_stream_count=3)
        got = sorted((r["vec_id"], tuple(r["embedding"]), r["label"])
                     for r in df.collect())
    finally:
        srv.shutdown()
    exp_df = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
              .where("vec_id < 300"))
    assert df.schema == exp_df.schema
    exp = sorted((r["vec_id"], tuple(r["embedding"]), r["label"])
                 for r in exp_df.collect())
    assert got == exp and len(got) == 300


def test_bigquery_storage_reads_struct_and_bignumeric(spark):
    """Closes the Storage-path type matrix (r9 VERDICT ask #3):
    RECORD/STRUCT and BIGNUMERIC columns over the Arrow wire.  A
    nested RECORD lands as a Spark struct; BIGNUMERIC —
    decimal256(76, 38) on the wire, wider than Spark's decimal cap —
    lands as its exact decimal STRING, the same no-silent-truncation
    mapping as load_rest's REST-path BIGNUMERIC handling
    (sources/bigquery.py _BQ_SCALARS), including one nested inside the
    struct."""
    from decimal import Decimal

    import pyarrow as pa

    from ab_metadata_pusher_spark.sources.bigquery import (
        BigQueryStorageSource)

    big = pa.array([Decimal("1.5"), None,
                    Decimal("-123456789012345678901234567890.25")],
                   type=pa.decimal256(76, 38))
    rec = pa.array([{"a": 7, "b": "x", "nested_big": Decimal("2.25")},
                    {"a": None, "b": "y", "nested_big": None},
                    None],
                   type=pa.struct([
                       pa.field("a", pa.int64()),
                       pa.field("b", pa.string()),
                       pa.field("nested_big", pa.decimal256(76, 38))]))
    table = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                      "rec": rec, "big": big})
    srv = _storage_emulator(None, n_streams=2, batch_rows=2, calls=[],
                            table=table)
    try:
        src = BigQueryStorageSource(project="p", dataset="d", table="t")
        df = BigQueryStorageSource.load_storage(
            src, spark,
            endpoint=f"http://127.0.0.1:{srv.server_address[1]}",
            max_stream_count=2)
        assert df.schema.simpleString() == (
            "struct<id:bigint,"
            "rec:struct<a:bigint,b:string,nested_big:string>,"
            "big:string>")
        got = {r["id"]: (None if r["rec"] is None
                         else (r["rec"]["a"], r["rec"]["b"],
                               r["rec"]["nested_big"]),
                         r["big"]) for r in df.collect()}
    finally:
        srv.shutdown()

    def full_scale(s):  # the Arrow cast carries all 38 wire digits
        import decimal
        if s is None:
            return None
        with decimal.localcontext() as ctx:
            ctx.prec = 100
            return str(Decimal(s).quantize(Decimal(1).scaleb(-38)))

    assert got == {
        1: ((7, "x", full_scale("2.25")), full_scale("1.5")),
        2: ((None, "y", None), None),
        3: (None, full_scale("-123456789012345678901234567890.25")),
    }


def test_bigquery_storage_4xx_fails_fast(sf_dir, monkeypatch):
    """r9 ADVICE: a 4xx client error (bad auth, missing stream) cannot
    be healed by backoff — the reader must raise immediately instead of
    paying max_attempts * exponential backoff per task, while 408/429
    and 5xx keep the retry schedule (5xx also proven over live HTTP by
    the injected-503 test above).  Synthesized HTTPErrors, not a live
    socket: the policy decision must be asserted without transport
    nondeterminism (a transient connect error would legitimately add a
    retry sleep and flake the zero-backoff assertion)."""
    import base64 as _b64
    import urllib.error

    import pyarrow as pa
    import pytest

    from ab_metadata_pusher_spark.sources import bigquery as bq
    from ab_metadata_pusher_spark.sources.bigquery import (
        _read_stream_batches)

    schema_b64 = _b64.b64encode(pa.schema(
        [pa.field("x", pa.int64())]).serialize().to_pybytes()).decode()
    sleeps = []
    monkeypatch.setattr(bq.time, "sleep", sleeps.append)

    def run(code):
        attempts = []

        def fake_urlopen(req, timeout=None):
            attempts.append(req.full_url)
            raise urllib.error.HTTPError(req.full_url, code, "err",
                                         {}, None)
        monkeypatch.setattr(bq.urllib.request, "urlopen", fake_urlopen)
        with pytest.raises(urllib.error.HTTPError) as exc:
            list(_read_stream_batches("http://x", "s/0", None,
                                      schema_b64, max_attempts=3,
                                      retry_backoff_sec=0.01))
        return exc.value.code, len(attempts)

    # non-retryable 4xx: one attempt, zero sleeps
    code, n = run(401)
    assert (code, n) == (401, 1) and sleeps == []
    code, n = run(404)
    assert (code, n) == (404, 1) and sleeps == []
    # 429 and 503 stay on the schedule: max_attempts tries, backoff paid
    code, n = run(429)
    assert (code, n) == (429, 3) and len(sleeps) == 2
    sleeps.clear()
    code, n = run(503)
    assert (code, n) == (503, 3) and len(sleeps) == 2


def test_bigquery_storage_exact_stream_placement(spark, sf_dir):
    """r9 ADVICE: round-robin repartition could co-locate two streams
    in one task (leaving another empty).  load_storage now rides
    spark.range(N, numPartitions=N) — contiguous slices, row i IS
    partition i — so every result partition holds EXACTLY its own
    stream's rows."""
    from pyspark.sql import functions as F

    from ab_metadata_pusher_spark.sources.bigquery import (
        BigQueryStorageSource)

    n_streams = 6
    srv = _storage_emulator(f"{sf_dir}/orders.parquet",
                            n_streams=n_streams, batch_rows=100,
                            calls=[])
    try:
        src = BigQueryStorageSource(project="p", dataset="d",
                                    table="orders")
        df = src.load_storage(
            spark, endpoint=f"http://127.0.0.1:{srv.server_address[1]}",
            max_stream_count=n_streams)
        assert df.rdd.getNumPartitions() == n_streams
        per_part = {r["pid"]: r["n"] for r in
                    (df.groupBy(F.spark_partition_id().alias("pid"))
                     .agg(F.count("*").alias("n")).collect())}
    finally:
        srv.shutdown()
    # every task read exactly one stream: all 6 partitions non-empty,
    # sizes equal to the emulator's contiguous splits (ceil(1500/6)=250)
    assert sorted(per_part) == list(range(n_streams))
    assert all(n == 250 for n in per_part.values())


def test_bigquery_storage_retries_truncated_body(sf_dir):
    """A mid-body truncation surfaces as http.client.IncompleteRead
    (an HTTPException, NOT a URLError/OSError) — the reader must retry
    from its offset instead of dying.  The emulator advertises a
    Content-Length longer than what it sends on the first GET."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from ab_metadata_pusher_spark.sources.bigquery import (
        BigQueryStorageSource, _read_stream_batches)

    calls = []
    inner = _storage_emulator(f"{sf_dir}/orders.parquet", n_streams=1,
                              batch_rows=512, calls=calls)

    class TruncatingHandler(BaseHTTPRequestHandler):
        truncated = []

        def do_POST(self):
            import urllib.request
            body = self.rfile.read(int(self.headers["Content-Length"]))
            req = urllib.request.Request(
                f"http://127.0.0.1:{inner.server_address[1]}{self.path}",
                data=body, method="POST",
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=10) as r:
                payload = r.read()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            import urllib.request
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{inner.server_address[1]}"
                    f"{self.path}", timeout=10) as r:
                payload = r.read()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            if not self.truncated:
                self.truncated.append(True)
                self.wfile.write(payload[: len(payload) // 2])
                self.wfile.flush()
                self.connection.close()
            else:
                self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), TruncatingHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
        src = BigQueryStorageSource(project="p", dataset="d",
                                    table="orders")
        session = src.create_read_session(endpoint, max_stream_count=1)
        total = sum(b.num_rows for b in _read_stream_batches(
            endpoint, session["streams"][0]["name"], None,
            session["arrowSchema"]["serializedSchema"],
            retry_backoff_sec=0.01))
    finally:
        srv.shutdown()
        inner.shutdown()
    assert total == 1500
    assert len(TruncatingHandler.truncated) == 1  # the retry happened


# ---------------------------------------------------------------------------
# A3 live wire: a local backend emulator speaking the PostgreSQL
# frontend/backend protocol v3 (r9 VERDICT "what's missing" #3 — the
# MySQL/Postgres dialects had only the Derby stand-in for live reads).
# ---------------------------------------------------------------------------

def _pg_backend_emulator(user, password, auth, result_fields, result_rows,
                         seen_sql):
    """Speaks enough of the documented v3 backend protocol to serve one
    catalog scan: StartupMessage parse, cleartext or md5 password auth
    (verified server-side), ParameterStatus/BackendKeyData/ReadyForQuery,
    simple Query -> RowDescription + text DataRows + CommandComplete.
    ``result_fields`` = [(name, type_oid)]; NULLs encode as len=-1."""
    import socketserver
    import struct
    import threading

    from ab_metadata_pusher_spark.sources.pgwire import (
        md5_password_response)

    SALT = b"\x01\xbe\xef\x42"

    class Handler(socketserver.BaseRequestHandler):
        def _recv(self, n):
            data = bytearray()
            while len(data) < n:
                part = self.request.recv(n - len(data))
                if not part:
                    raise ConnectionError("client gone")
                data += part
            return bytes(data)

        def _send(self, kind, body):
            self.request.sendall(
                kind + struct.pack(">i", len(body) + 4) + body)

        def _read_frontend(self):
            kind = self._recv(1)
            (length,) = struct.unpack(">i", self._recv(4))
            return kind, self._recv(length - 4)

        def handle(self):
            (length,) = struct.unpack(">i", self._recv(4))
            startup = self._recv(length - 4)
            (proto,) = struct.unpack(">i", startup[:4])
            assert proto == 196608
            params = dict(zip(*[iter(
                startup[4:].rstrip(b"\x00").split(b"\x00"))] * 2))
            assert params[b"user"].decode() == user
            if auth == "md5":
                self._send(b"R", struct.pack(">i", 5) + SALT)
                kind, body = self._read_frontend()
                assert kind == b"p"
                got = body.rstrip(b"\x00").decode()
                if got != md5_password_response(user, password, SALT):
                    self._send(b"E", b"SFATAL\x00C28P01\x00"
                                     b"Mpassword authentication failed\x00"
                                     b"\x00")
                    return
            elif auth == "cleartext":
                self._send(b"R", struct.pack(">i", 3))
                kind, body = self._read_frontend()
                assert kind == b"p"
                if body.rstrip(b"\x00").decode() != password:
                    self._send(b"E", b"SFATAL\x00C28P01\x00"
                                     b"Mpassword authentication failed\x00"
                                     b"\x00")
                    return
            self._send(b"R", struct.pack(">i", 0))  # AuthenticationOk
            self._send(b"S", b"server_version\x0016.0\x00")
            self._send(b"K", struct.pack(">ii", 1234, 5678))
            self._send(b"Z", b"I")
            while True:
                try:
                    kind, body = self._read_frontend()
                except ConnectionError:
                    return
                if kind != b"Q":
                    return
                seen_sql.append(body.rstrip(b"\x00").decode())
                desc = struct.pack(">h", len(result_fields))
                for name, oid in result_fields:
                    desc += name.encode() + b"\x00" + struct.pack(
                        ">ihihih", 0, 0, oid, -1, -1, 0)
                self._send(b"T", desc)
                for row in result_rows:
                    payload = struct.pack(">h", len(row))
                    for v in row:
                        if v is None:
                            payload += struct.pack(">i", -1)
                        else:
                            raw = str(v).encode()
                            payload += struct.pack(">i", len(raw)) + raw
                    self._send(b"D", payload)
                self._send(b"C", f"SELECT {len(result_rows)}\x00".encode())
                self._send(b"Z", b"I")

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


_PG_CATALOG_FIELDS = [
    ("td_database", 25), ("table_catalog", 19), ("table_schema", 19),
    ("table_name", 19), ("table_description", 25), ("col_name", 19),
    ("col_type", 25), ("col_description", 25), ("col_sort_order", 23),
    ("is_view", 16),
]
_PG_CATALOG_ROWS = [
    ("postgres", "demo", "shop", "orders", "orders table", "o_orderkey",
     "bigint", "pk", 1, "f"),
    ("postgres", "demo", "shop", "orders", "orders table", "o_comment",
     "text", None, 2, "f"),
    ("postgres", "demo", "shop", "orders_v", None, "o_orderkey",
     "bigint", None, 1, "t"),
]


def test_postgres_wire_catalog_scan_live(spark):
    """A3 over live TCP with md5 auth: the exact postgres_catalog_sql
    text reaches the server; the landed frame carries OID-mapped Spark
    types (bool is_view, int sort order, NULL descriptions) and feeds
    operators/metadata.py unchanged."""
    from ab_metadata_pusher_spark.operators.metadata import table_metadata
    from ab_metadata_pusher_spark.sources.jdbc import postgres_catalog_sql
    from ab_metadata_pusher_spark.sources.pgwire import PostgresWireSource

    seen = []
    srv = _pg_backend_emulator("amundsen", "s3cret", "md5",
                               _PG_CATALOG_FIELDS, _PG_CATALOG_ROWS, seen)
    try:
        src = PostgresWireSource(
            "127.0.0.1", srv.server_address[1], user="amundsen",
            database="demo", password="s3cret")
        df = src.load_catalog(spark, schema="shop")
        got = sorted(tuple(r) for r in df.collect())
    finally:
        srv.shutdown()

    assert seen == [postgres_catalog_sql("shop", database="demo")]
    assert df.schema.simpleString() == (
        "struct<td_database:string,table_catalog:string,"
        "table_schema:string,table_name:string,table_description:string,"
        "col_name:string,col_type:string,col_description:string,"
        "col_sort_order:int,is_view:boolean>")
    exp = sorted([
        ("postgres", "demo", "shop", "orders", "orders table",
         "o_orderkey", "bigint", "pk", 1, False),
        ("postgres", "demo", "shop", "orders", "orders table",
         "o_comment", "text", None, 2, False),
        ("postgres", "demo", "shop", "orders_v", None, "o_orderkey",
         "bigint", None, 1, True)])
    assert got == exp
    # the landed frame IS a catalog_columns frame: the metadata fold
    # consumes it unchanged
    tm = table_metadata(df)
    names = {r["table_name"] for r in tm.collect()}
    assert names == {"orders", "orders_v"}


def test_postgres_wire_bad_password_raises(spark):
    from ab_metadata_pusher_spark.sources.pgwire import PostgresWireSource

    import pytest

    srv = _pg_backend_emulator("amundsen", "s3cret", "cleartext",
                               _PG_CATALOG_FIELDS, [], [])
    try:
        src = PostgresWireSource(
            "127.0.0.1", srv.server_address[1], user="amundsen",
            database="demo", password="WRONG")
        with pytest.raises(RuntimeError, match="authentication failed"):
            src.query("SELECT 1")
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# A2 live wire: a local server emulator speaking the MySQL client/server
# protocol (HandshakeV10 / HandshakeResponse41 / COM_QUERY text
# resultset), completing the dialect pair with the Postgres emulator.
# ---------------------------------------------------------------------------

def _mysql_server_emulator(user, password, result_fields, result_rows,
                           seen_sql):
    """``result_fields`` = [(name, type_byte)]; rows are text-protocol
    values (None -> 0xfb NULL).  The server VERIFIES the client's
    mysql_native_password scramble against its own computation over the
    20-byte salt it issued."""
    import socketserver
    import struct
    import threading

    from ab_metadata_pusher_spark.sources.mysqlwire import (
        native_password_scramble)

    SALT = bytes(range(1, 21))  # 20 non-zero bytes

    def lenenc(n):
        if n < 251:
            return bytes([n])
        if n < 1 << 16:
            return b"\xfc" + n.to_bytes(2, "little")
        return b"\xfd" + n.to_bytes(3, "little")

    def lestr(s):
        raw = s.encode()
        return lenenc(len(raw)) + raw

    class Handler(socketserver.BaseRequestHandler):
        def _recv(self, n):
            data = bytearray()
            while len(data) < n:
                part = self.request.recv(n - len(data))
                if not part:
                    raise ConnectionError("client gone")
                data += part
            return bytes(data)

        def _recv_packet(self):
            head = self._recv(4)
            return self._recv(int.from_bytes(head[:3], "little"))

        def _send(self, seq, payload):
            self.request.sendall(len(payload).to_bytes(3, "little")
                                 + bytes([seq & 0xFF]) + payload)

        def handle(self):
            # HandshakeV10
            greeting = (b"\x0a" + b"8.0.99-emulator\x00"
                        + struct.pack("<I", 77)
                        + SALT[:8] + b"\x00"
                        + struct.pack("<H", 0xFFFF)      # caps lower
                        + b"\x21"                         # charset
                        + struct.pack("<H", 0x0002)       # status
                        + struct.pack("<H", 0xFFFF)       # caps upper
                        + bytes([21])                     # auth data len
                        + b"\x00" * 10
                        + SALT[8:] + b"\x00"
                        + b"mysql_native_password\x00")
            self._send(0, greeting)
            resp = self._recv_packet()
            import io as _io
            b = _io.BytesIO(resp)
            caps, _maxp, _cs = struct.unpack("<IIB", b.read(9))
            assert caps & 0x200, "client must set CLIENT_PROTOCOL_41"
            b.read(23)
            uname = bytearray()
            while (ch := b.read(1)) != b"\x00":
                uname += ch
            (alen,) = b.read(1)
            auth = b.read(alen)
            expected = native_password_scramble(password, SALT)
            if uname.decode() != user or auth != expected:
                self._send(2, b"\xff" + struct.pack("<H", 1045)
                           + b"#28000Access denied".replace(b"#28000",
                                                            b"#28000"))
                return
            self._send(2, b"\x00\x00\x00\x02\x00\x00\x00")  # OK
            while True:
                try:
                    q = self._recv_packet()
                except ConnectionError:
                    return
                if not q or q[:1] != b"\x03":
                    return
                seen_sql.append(q[1:].decode())
                self._send(1, lenenc(len(result_fields)))
                seq = 2
                for name, t in result_fields:
                    col = (lestr("def") + lestr("information_schema")
                           + lestr("c") + lestr("c") + lestr(name)
                           + lestr(name) + b"\x0c"
                           + struct.pack("<HIBHB", 33, 255, t, 0, 0)
                           + b"\x00\x00")
                    self._send(seq, col)
                    seq += 1
                self._send(seq, b"\xfe\x00\x00\x02\x00")  # EOF
                seq += 1
                for row in result_rows:
                    payload = b"".join(
                        b"\xfb" if v is None else lestr(str(v))
                        for v in row)
                    self._send(seq, payload)
                    seq += 1
                self._send(seq, b"\xfe\x00\x00\x02\x00")  # EOF

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


_MY_CATALOG_FIELDS = [
    ("td_database", 0xFD), ("table_catalog", 0xFD), ("table_schema", 0xFD),
    ("table_name", 0xFD), ("table_description", 0xFC), ("col_name", 0xFD),
    ("col_type", 0xFD), ("col_description", 0xFC), ("col_sort_order", 0x08),
    ("is_view", 0x08),
]
_MY_CATALOG_ROWS = [
    ("shopdb", "def", "shop", "orders", "orders table", "o_orderkey",
     "bigint", "pk", 1, 0),
    ("shopdb", "def", "shop", "orders", "orders table", "o_comment",
     "varchar", None, 2, 0),
]


def test_mysql_wire_catalog_scan_live(spark):
    """A2 over live TCP with verified mysql_native_password auth: the
    exact mysql_catalog_sql text reaches the server; the landed frame is
    a catalog_columns frame (is_view cast to the contract boolean) that
    feeds operators/metadata.py unchanged."""
    from ab_metadata_pusher_spark.operators.metadata import table_metadata
    from ab_metadata_pusher_spark.sources.jdbc import mysql_catalog_sql
    from ab_metadata_pusher_spark.sources.mysqlwire import MysqlWireSource

    seen = []
    srv = _mysql_server_emulator("amundsen", "s3cret",
                                 _MY_CATALOG_FIELDS, _MY_CATALOG_ROWS, seen)
    try:
        src = MysqlWireSource(
            "127.0.0.1", srv.server_address[1], user="amundsen",
            database="shopdb", password="s3cret")
        df = src.load_catalog(spark, "c.table_schema = 'shop'")
        got = sorted(tuple(r) for r in df.collect())
    finally:
        srv.shutdown()

    assert seen == [mysql_catalog_sql("c.table_schema = 'shop'",
                                      database="shopdb")]
    assert dict(df.dtypes)["is_view"] == "boolean"
    assert dict(df.dtypes)["col_sort_order"] == "bigint"
    assert got == sorted([
        ("shopdb", "def", "shop", "orders", "orders table", "o_orderkey",
         "bigint", "pk", 1, False),
        ("shopdb", "def", "shop", "orders", "orders table", "o_comment",
         "varchar", None, 2, False)])
    tm = table_metadata(df)
    assert {r["table_name"] for r in tm.collect()} == {"orders"}


def test_mysql_wire_bad_password_raises():
    import pytest

    from ab_metadata_pusher_spark.sources.mysqlwire import MysqlWireSource

    srv = _mysql_server_emulator("amundsen", "s3cret",
                                 _MY_CATALOG_FIELDS, [], [])
    try:
        src = MysqlWireSource(
            "127.0.0.1", srv.server_address[1], user="amundsen",
            database="shopdb", password="WRONG")
        with pytest.raises(RuntimeError, match="mysql error 1045"):
            src.query("SELECT 1")
    finally:
        srv.shutdown()


def test_postgres_wire_tolerates_notices_and_long_values(spark):
    """Protocol edges: NoticeResponse and ParameterStatus interleaved in
    the query stream are consumed, and a value longer than one TCP
    segment decodes intact (exercises the exact-length recv loop)."""
    import socketserver
    import struct
    import threading

    from ab_metadata_pusher_spark.sources.pgwire import PostgresWireSource

    big = "x" * 100_000

    class Handler(socketserver.BaseRequestHandler):
        def _recv(self, n):
            data = bytearray()
            while len(data) < n:
                part = self.request.recv(n - len(data))
                if not part:
                    raise ConnectionError("gone")
                data += part
            return bytes(data)

        def _send(self, kind, body):
            self.request.sendall(
                kind + struct.pack(">i", len(body) + 4) + body)

        def handle(self):
            (length,) = struct.unpack(">i", self._recv(4))
            self._recv(length - 4)
            self._send(b"R", struct.pack(">i", 0))   # trust auth
            self._send(b"Z", b"I")
            kind = self._recv(1)
            (qlen,) = struct.unpack(">i", self._recv(4))
            self._recv(qlen - 4)
            assert kind == b"Q"
            # notices/parameter-status interleave legally with data
            self._send(b"N", b"SNOTICE\x00Mjust so you know\x00\x00")
            self._send(b"T", struct.pack(">h", 1) + b"v\x00"
                       + struct.pack(">ihihih", 0, 0, 25, -1, -1, 0))
            self._send(b"S", b"application_name\x00x\x00")
            raw = big.encode()
            self._send(b"D", struct.pack(">hi", 1, len(raw)) + raw)
            self._send(b"N", b"SNOTICE\x00Magain\x00\x00")
            self._send(b"C", b"SELECT 1\x00")
            self._send(b"Z", b"I")

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        src = PostgresWireSource("127.0.0.1", srv.server_address[1],
                                 user="u", database="d")
        fields, rows = src.query("SELECT v")
    finally:
        srv.shutdown()
    assert fields == [("v", 25)]
    assert rows == [(big,)]


def test_mysql_wire_lenenc_two_byte_strings():
    """Values past the 251-byte single-byte length bound take the 0xfc
    two-byte length encoding — round-trip one through the emulator."""
    from ab_metadata_pusher_spark.sources.mysqlwire import MysqlWireSource

    long_comment = "c" * 4000
    rows = [("db", "def", "s", "t", long_comment, "col", "text",
             None, 1, 0)]
    seen = []
    srv = _mysql_server_emulator("u", "", _MY_CATALOG_FIELDS, rows, seen)
    try:
        src = MysqlWireSource("127.0.0.1", srv.server_address[1],
                              user="u", database="db", password="")
        fields, got = src.query("SELECT 1")
    finally:
        srv.shutdown()
    assert got[0][4] == long_comment and got[0][7] is None

"""Fixture-size invariants behind oracle literal bounds (r4 VERDICT #6).

Several DuckDB oracles use a FIXED series bound plus a WHERE filter
because generate_series cannot take a lateral column argument; each is
correct only while the fixture stays under the literal.  The r4 round
derived the n-gram oracle's bound per row; this module is the audit of
every REMAINING literal, asserting the invariant the oracle assumes so
a regenerated/larger fixture fails loudly here instead of silently
truncating an oracle:

* ``multimodal_decode_features`` (plans/llm_queries.py, series 1..4096
  over document chars): requires max doc length <= 4096.
* char-pair / BPE-symbol oracles (series 1..64 over token chars;
  ``_bpe_train_oracle`` series 1..64 over word symbols, which only
  shrink under merges): require max whitespace-token length <= 64.
* ``timeseries_gap_fill`` / gapfill-interpolate (series 0..2000 hourly
  buckets): require the events table's timestamp span <= 2000 hours.
* the 64-wide dim loops in embedding oracles are STRUCTURAL, not
  fixture-size: they unroll the embedding dimension — asserted equal to
  64 (the engine's _EMB_D) rather than bounded.

Pure DuckDB — no Spark session — so the audit runs at both the test SF
and the driver's correctness SF in well under a second.
"""

import duckdb
import pytest
from conftest import SF_DIR, SF_DIR_CORRECTNESS

#: (oracle site, literal) — keep in sync with the docstring above.
MAX_DOC_CHARS = 4096      # llm_queries.py multimodal_decode_features
MAX_TOKEN_CHARS = 64      # llm_queries.py char-pair + _bpe_train_oracle
MAX_EVENT_SPAN_HOURS = 2000  # timeseries_queries.py gapfill oracles
EMB_DIM = 64              # structural: _EMB_D, embedding list width

SF_DIRS = sorted({SF_DIR, SF_DIR_CORRECTNESS, "/root/testdata/sf0.1"})


@pytest.fixture(scope="module", params=SF_DIRS)
def con(request):
    c = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{request.param}/{t}.parquet')")
    yield c
    c.close()


def test_doc_length_under_series_bound(con):
    n = con.execute("SELECT max(length(text)) FROM documents").fetchone()[0]
    assert n <= MAX_DOC_CHARS, (
        f"documents outgrew the multimodal_decode_features oracle's "
        f"generate_series(1, {MAX_DOC_CHARS}) bound: max doc {n} chars")


def test_token_length_under_series_bound(con):
    n = con.execute(
        "SELECT max(length(w)) FROM (SELECT unnest(list_filter("
        "string_split(text, ' '), x -> x <> '')) AS w FROM documents)"
    ).fetchone()[0]
    assert n <= MAX_TOKEN_CHARS, (
        f"documents outgrew the char-pair/BPE oracles' "
        f"generate_series(1, {MAX_TOKEN_CHARS}) bound: max token {n} chars")


def test_event_span_under_gapfill_bound(con):
    h = con.execute("SELECT date_diff('hour', min(ts), max(ts)) "
                    "FROM events").fetchone()[0]
    assert h <= MAX_EVENT_SPAN_HOURS, (
        f"events outgrew the gapfill oracles' generate_series(0, "
        f"{MAX_EVENT_SPAN_HOURS}) hourly-bucket bound: span {h} hours")


def test_embedding_dim_is_structural_64(con):
    lo, hi = con.execute(
        "SELECT min(len(embedding)), max(len(embedding)) FROM embeddings"
    ).fetchone()
    assert lo == hi == EMB_DIM, (
        f"embedding width {lo}..{hi} != {EMB_DIM}; the unrolled dim loops "
        f"in the embedding oracles assume exactly {EMB_DIM} elements")


def test_pinned_oracles_cover_every_generated_sf():
    """Each pinned-constant oracle must carry a VALUES branch for every
    generated scale factor (keyed on the orders row count — see
    scripts/gen_pinned_oracles.py SF_BASE).  A missing branch selects
    the empty fallback and fails the driver/bench comparison loudly at
    that SF; this asserts the r5 invariant that all three SFs are
    pinned, so a testdata regeneration that changes a row count fails
    here with an actionable message instead of as an opaque
    rowcount-0 oracle mismatch."""
    import pyarrow.parquet as pq

    from ab_metadata_pusher_spark.plans.generated_oracles import (
        PINNED_ORACLES,
    )

    for sf_dir in SF_DIRS:
        key = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
        for name, sql in PINNED_ORACLES.items():
            assert f"(SELECT count(*) FROM orders) = {key}" in sql, (
                f"pinned oracle {name} has no branch for SF key {key} "
                f"({sf_dir}); rerun scripts/gen_pinned_oracles.py")

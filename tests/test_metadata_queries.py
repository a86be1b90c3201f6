"""Oracle-differential tests for the flagship metadata pipeline
(SURVEY.md §2.A-§2.C) — every registered metadata query must match its
DuckDB oracle at the smoke scale factor."""

from __future__ import annotations

import pytest

from ab_metadata_pusher_spark.plans.registry import REGISTRY, queries, oracle_sql

from tests.conftest import assert_matches_oracle

ALL = queries()
ORACLES = oracle_sql()
METADATA_QUERIES = sorted(n for n in ALL if n.startswith("metadata_"))


@pytest.mark.parametrize("name", METADATA_QUERIES)
def test_metadata_query_matches_oracle(spark, duck, sf_dir, name):
    assert name in ORACLES, f"{name} lacks an oracle"
    df = ALL[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ORACLES[name])


def test_registry_covers_core_operators():
    covered = {c for spec in REGISTRY.values() for c in spec.covers}
    for op in ("B1", "B4", "B8", "C2"):
        assert any(op in c for c in covered), f"operator {op} uncovered"

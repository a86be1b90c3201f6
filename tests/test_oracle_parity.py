"""Oracle-differential tests for every registered query that declares a
DuckDB oracle — the engine's sqllogictest equivalent (SURVEY.md §5.2),
run at the smoke scale factor for speed; scripts/driver_sim.py runs the
same comparison at sf0.01 like the driver."""

from __future__ import annotations

import pytest

from ab_metadata_pusher_spark.plans.registry import queries, oracle_sql

from tests.conftest import assert_matches_oracle

ALL = queries()
ORACLES = oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    df = ALL[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLES)))
def test_weak_query_runs(spark, sf_dir, name):
    """Queries without an oracle must still run and return a stable schema."""
    df = ALL[name](spark, sf_dir)
    assert df.columns, f"{name} returned no columns"
    assert df.count() >= 0

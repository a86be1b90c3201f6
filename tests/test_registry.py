"""Registry invariants: unique names, operator coverage, oracle hygiene."""

from ab_metadata_pusher_spark.plans.registry import REGISTRY, queries, oracle_sql


def test_core_operator_coverage():
    queries()  # force load
    covered = {c for spec in REGISTRY.values() for c in spec.covers}
    for op in ("B1", "B4", "B5", "B8", "C2", "G.agg", "G.window.rank",
               "G.join.semi", "G.setop", "G.topk", "G.fn.string",
               "G.fn.json", "G.udtf.explode"):
        assert any(op in c for c in covered), f"operator {op} uncovered"


def test_oracles_are_nonempty_sql():
    for name, sql in oracle_sql().items():
        assert "SELECT" in sql.upper(), f"{name} oracle is not SQL"

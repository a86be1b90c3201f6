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


def test_results_invariant_under_shuffle_width(spark):
    """Representative queries must produce IDENTICAL results whether the
    shuffle runs 3-wide or 8-wide — partition-layout determinism is what
    lets the driver hash-compare against a single-threaded oracle (and
    is why the layout-dependent MG estimates are registered rows-only
    while agg_heavy_hitters_guaranteed is hash-checked)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from conftest import SF_DIR, normalized_rows

    names = ["dedup_minhash_lsh", "sample_global_shuffle",
             "agg_heavy_hitters_guaranteed", "sessionize_events",
             "dedup_substring_spans", "corpus_build_pipeline"]
    reg = queries()
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key)
    results = {}
    try:
        for width in ("8", "3"):
            spark.conf.set(conf_key, width)
            for n in names:
                df = reg[n](spark, SF_DIR)
                cols = df.columns
                _, rows = normalized_rows(
                    cols, [tuple(r) for r in df.collect()])
                results.setdefault(n, []).append(rows)
    finally:
        spark.conf.set(conf_key, prev)
    for n, (a, b) in results.items():
        assert a == b, f"{n} result depends on shuffle width"


def test_prefix_queries_output_flat_atomic_schemas(spark):
    """Every DRIVER_PREFIX query must return only flat atomic columns:
    the driver canonicalizes results through pandas sort_values, which
    cannot hash array/map/struct cells (CORRECTNESS_r03's one red row,
    scalar_regexp_funcs returning array<string>).  Flatten complex
    outputs with array_join/to_json before registering."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from conftest import SF_DIR
    from pyspark.sql import types as T

    from ab_metadata_pusher_spark.plans.registry import DRIVER_PREFIX
    reg = queries()
    bad = {}
    for name in DRIVER_PREFIX:
        schema = reg[name](spark, SF_DIR).schema
        complex_cols = [
            f.name for f in schema.fields
            if isinstance(f.dataType,
                          (T.ArrayType, T.MapType, T.StructType))]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"complex-typed output columns in prefix: {bad}"

"""Round-5 retired queries stay locally verified.

Registration is frozen at 239 (r4 VERDICT ask #8), so the two round-5
additions (graph_link_prediction_capped, sink_envelope_chunking) each
replaced a retired never-scored near-duplicate 1:1:

* ``metadata_schema_drift`` — same full-outer-join drift semantics as
  the driver-green ``metadata_snapshot_diff``;
* ``sessionize_events_pandas`` — byte-identical output contract to the
  driver-green ``sessionize_events`` via grouped-map applyInPandas.

Retired means out of the registry, NOT out of the engine: both plans
remain importable public surface, and this module keeps each verified
against the same DuckDB oracle it was registered with.
"""

from conftest import SF_DIR, assert_matches_oracle

from ab_metadata_pusher_spark.plans.metadata_queries import (
    SCHEMA_DRIFT_ORACLE, q_schema_drift,
)
from ab_metadata_pusher_spark.plans.registry import REGISTRY, queries
from ab_metadata_pusher_spark.plans.timeseries_queries import (
    _SESSION_SQL, q_sessionize_pandas,
)


def test_retired_names_stay_unregistered():
    queries()  # force load
    assert "metadata_schema_drift" not in REGISTRY
    assert "sessionize_events_pandas" not in REGISTRY
    assert len(REGISTRY) == 239, "registration freeze violated"


def test_schema_drift_still_matches_oracle(spark, duck):
    assert_matches_oracle(q_schema_drift(spark, SF_DIR), duck,
                          SCHEMA_DRIFT_ORACLE)


def test_sessionize_pandas_still_matches_oracle(spark, duck):
    assert_matches_oracle(q_sessionize_pandas(spark, SF_DIR), duck,
                          _SESSION_SQL)

"""Plan-hygiene guard over the whole query registry: catches
regressions that correctness tests can't see (a join silently turning
into a cartesian product, Python creeping into a JVM-only path).
Plans are inspected at sf0.001 — plan SHAPE is scale-invariant for
these checks even though join-strategy choices are not."""

from __future__ import annotations

import pytest

from apache_iceberg_tables_migration_tool_spark.queries import QUERIES
from apache_iceberg_tables_migration_tool_spark.sources.bucketed import physical_plan
from tests.conftest import SF_DIR

#: queries whose operators legitimately run Python (Arrow-batched
#: mapInPandas / applyInPandasWithState / vectorized pandas UDFs —
#: documented in PERFORMANCE.md; "arrow" marks the minhash signature
#: fold, the measured exception where interpreted higher-order-lambda
#: evaluation loses to numpy, see dedup.minhash_signatures)
_PYTHON_OK = {"vector", "multimodal", "stateful", "arrow"}

#: broadcast nested-loop is the *intended* strategy for the tiny-side
#: non-equi range join and for 1-row scalar-aggregate broadcasts;
#: nowhere else
_BNLJ_OK = {"range", "scalar-broadcast"}

#: queries that execute during planning (streaming drain / filesystem
#: catalog) — skipped here, covered by their own e2e tests
_SKIP = {
    "migration_e2e_report",
    "snapshot_history_ops",
    "stateful_user_totals",
    "migration_history_replay",
    "wap_audit_publish",
    "snapshot_row_diff",
    "dedup_clusters",  # iterative: localCheckpoint jobs run during planning
    "rowlevel_merge_delete",
    "dedup_embedding_clusters",  # iterative localCheckpoint
}


def _plans():
    return [(n, s) for n, s in sorted(QUERIES.items()) if n not in _SKIP]


@pytest.mark.parametrize("name,spec", _plans(), ids=[n for n, _ in _plans()])
def test_plan_hygiene(spark, name, spec):
    plan = physical_plan(spec.fn(spark, SF_DIR))
    tags = set(spec.tags)

    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if not tags & _BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join — a join condition probably stopped "
            "being an equi-join"
        )
    if not tags & _PYTHON_OK:
        assert "PythonUDF" not in plan and "MapInPandas" not in plan, (
            f"{name}: Python on a JVM-only path"
        )

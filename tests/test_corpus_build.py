"""Structural pins for the corpus-build composition (plans/corpus.py).

The DATA outcome is oracle-checked by the driver via
``corpus_build_e2e``; these tests pin what the oracle can't see — the
WAP commit discipline, the persisted band index, and replay
determinism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.operators import dedup as D
from apache_iceberg_tables_migration_tool_spark.plans.corpus import build_corpus
from apache_iceberg_tables_migration_tool_spark.sources.fixtures import load

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    docs = load(spark, SF_DIR, "documents")
    wh = str(tmp_path_factory.mktemp("corpus_wh"))
    return build_corpus(spark, docs, wh), docs


def test_wap_history_every_ingest_staged_then_published(built, spark):
    result, _ = built
    tbl = result.catalog.table("corpus", "docs")
    snaps = tbl.snapshots()
    # one staged append per batch; publishes took the fast path (no
    # concurrent commits), so the log holds exactly the 3 staged
    # snapshots and the published head is the last of them
    assert len(snaps) == 3
    assert [s.summary.get("wap.id") for s in snaps] == [
        "ingest-0", "ingest-1", "ingest-2",
    ]
    assert tbl.current_snapshot().snapshot_id == snaps[-1].snapshot_id
    # each batch's stats row matches its snapshot's added-records
    for st, snap in zip(result.batch_stats, snaps):
        assert int(snap.summary["added-records"]) == st["accepted"]


def test_band_index_matches_recomputation(built, spark):
    result, _ = built
    idx = result.catalog.table("corpus", "band_index").read(spark)
    final = result.catalog.table("corpus", "docs").read(spark)
    recomputed = D.band_table(final, num_hashes=48, bands=12, seed=42)
    assert idx.count() == final.count() * 12
    # partition-column read-back reorders/widens `band` — align explicitly
    cols = [F.col("doc_id"), F.col("band").cast("int").alias("band"), F.col("bh")]
    idx_n = idx.select(*cols)
    rec_n = recomputed.select(*cols)
    assert idx_n.exceptAll(rec_n).count() == 0
    assert rec_n.exceptAll(idx_n).count() == 0
    # partitioned by band → per-ingest commit dirs carry band=… paths
    files = result.catalog.table("corpus", "band_index").files_df(spark)
    assert files.where(F.col("file_path").contains("band=")).count() > 0


def test_published_corpus_never_contains_benchmark_docs(built, spark):
    result, _ = built
    final = result.catalog.table("corpus", "docs").read(spark)
    assert final.where(F.col("doc_id") % 97 == 0).count() == 0
    assert final.select("doc_id").distinct().count() == final.count()


def test_mixture_respects_quotas(built, spark):
    result, _ = built
    mix = result.mixture
    rows = mix.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    quotas = {"en": 100, "zh": 40, "es": 30, "de": 20, "fr": 10}
    assert set(r["lang"] for r in rows) <= set(quotas)
    for r in rows:
        assert r["n"] <= quotas[r["lang"]]


def test_replay_is_deterministic(built, spark, tmp_path):
    result, docs = built
    again = build_corpus(spark, docs, str(tmp_path / "wh2"))
    a = sorted(map(tuple, result.mixture.collect()))
    b = sorted(map(tuple, again.mixture.collect()))
    assert a == b
    assert [s["accepted"] for s in again.batch_stats] == [
        s["accepted"] for s in result.batch_stats
    ]

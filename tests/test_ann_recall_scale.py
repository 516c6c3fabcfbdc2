"""ANN recall at the 10×-grading scale (round-4 verdict action #7).

The operator recall tests assert at sf0.001 (500-vector fixtures); a
quantizer that degrades with corpus size (IVF cells overflowing, PQ
codebooks trained on an unrepresentative sample, LSH buckets
saturating) would sail through them and first surface as a red driver
row. These tests pin the REGISTERED configurations' recall against
brute force at sf0.1 (2 000 vectors — the largest fixture tier), so
degradation is caught in pytest before it reaches a scoreboard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.operators import similarity as S
from apache_iceberg_tables_migration_tool_spark.sources.fixtures import load

SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def emb01(spark):
    return load(spark, SF01, "embeddings").cache()


@pytest.fixture(scope="module")
def exact_top5(spark, emb01):
    queries = emb01.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    pairs = {
        (r["qid"], r["vec_id"])
        for r in S.cosine_topk(emb01, queries, k=5).collect()
    }
    return queries, pairs


def _recall(approx: set, exact: set) -> float:
    return len(approx & exact) / len(exact)


def test_ivf_recall_at_sf01(spark, emb01, exact_top5):
    queries, exact = exact_top5
    approx = {
        (r["qid"], r["vec_id"])
        for r in S.knn_ivf(emb01, queries, k=5, nlist=16, nprobe=12).collect()
    }
    assert _recall(approx, exact) >= 0.9, f"ivf recall {_recall(approx, exact)}"


def test_pq_adc_recall_at_sf01(spark, emb01, exact_top5):
    queries, exact = exact_top5
    approx = {
        (r["qid"], r["vec_id"])
        for r in S.knn_pq(
            emb01, queries, k=5, m=16, ksub=32, rerank=200
        ).collect()
    }
    assert _recall(approx, exact) >= 0.9, f"pq recall {_recall(approx, exact)}"


def test_lsh_recall_at_sf01(spark, emb01, exact_top5):
    queries, exact = exact_top5
    approx = {
        (r["qid"], r["vec_id"])
        for r in S.knn_lsh(
            emb01, queries, k=5, bands=32, planes_per_band=3
        ).collect()
    }
    assert _recall(approx, exact) >= 0.9, f"lsh recall {_recall(approx, exact)}"

"""Operator-level tests: approximate-dedup/search recall vs exact
ground truth, as-of join semantics, integrity checksums."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.operators import dedup as D
from apache_iceberg_tables_migration_tool_spark.operators import similarity as S
from apache_iceberg_tables_migration_tool_spark.operators.asof import asof_join
from apache_iceberg_tables_migration_tool_spark.operators.integrity import (
    row_diff,
    table_checksum,
    tables_match,
)
from apache_iceberg_tables_migration_tool_spark.sources.fixtures import load
from tests.conftest import SF_DIR


# ---------------------------------------------------------------- as-of join

def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture()
def asof_frames(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "l1"),
         (1, _ts("2024-01-01T12:00:00"), "l2"),
         (2, _ts("2024-01-01T09:00:00"), "l3"),
         (3, _ts("2024-01-01T09:00:00"), "l4")],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:30:00"), "r1"),
         (1, _ts("2024-01-01T11:00:00"), "r2"),
         (2, _ts("2024-01-01T09:00:00"), "r3"),  # exact tie with l3
         (2, _ts("2024-01-01T23:00:00"), "r4")],
        "k int, ts timestamp, rv string",
    )
    return left, right


def test_asof_backward(spark, asof_frames):
    left, right = asof_frames
    out = {
        r["lv"]: r["rv"]
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="ts").collect()
    }
    assert out == {"l1": "r1", "l2": "r2", "l3": "r3", "l4": None}  # inclusive tie


def test_asof_inner_drops_unmatched(spark, asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts", how="inner")
    assert {r["lv"] for r in out.collect()} == {"l1", "l2", "l3"}


def test_asof_forward(spark, asof_frames):
    left, right = asof_frames
    out = {
        r["lv"]: r["rv"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", direction="forward"
        ).collect()
    }
    assert out == {"l1": "r2", "l2": None, "l3": "r3", "l4": None}


# ------------------------------------------------------------------ recall

def _pairs(df) -> set[tuple[int, int]]:
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_minhash_recall_vs_exact(spark):
    docs = load(spark, SF_DIR, "documents")
    exact = _pairs(D.ngram_jaccard_pairs(docs, threshold=0.5))
    approx = _pairs(D.minhash_lsh_pairs(docs, threshold=0.5))
    assert exact, "fixture should contain near-dup pairs"
    assert approx <= exact  # exact-verified candidates → perfect precision
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.95, f"minhash recall {recall}"


def test_incremental_dedup_precomputed_index_matches_inline(spark):
    """dedup_batch_against_corpus must return identical pairs whether
    the corpus band table is computed inline or passed precomputed
    (the persisted-index path an incremental ingest actually uses),
    and every returned doc_a must come from the new batch."""
    docs = load(spark, SF_DIR, "documents")
    new = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    inline = {
        (r["doc_a"], r["doc_b"])
        for r in D.dedup_batch_against_corpus(
            new, corpus, threshold=0.5, num_hashes=48, bands=12
        ).collect()
    }
    idx = D.band_table(corpus, num_hashes=48, bands=12)
    via_index = {
        (r["doc_a"], r["doc_b"])
        for r in D.dedup_batch_against_corpus(
            new, corpus, threshold=0.5, num_hashes=48, bands=12, corpus_bands=idx
        ).collect()
    }
    assert inline == via_index
    assert all(a % 5 == 0 and b % 5 != 0 for a, b in inline)


def test_simhash_finds_near_dups(spark):
    docs = load(spark, SF_DIR, "documents")
    exact = _pairs(D.ngram_jaccard_pairs(docs, threshold=0.5))
    sim = {(r["doc_a"], r["doc_b"]) for r in D.simhash_pairs(docs, max_hamming=6).collect()}
    recall = len(sim & exact) / len(exact)
    assert recall >= 0.8, f"simhash recall {recall}"
    # threshold at/above the band count would silently lose recall —
    # the guard must refuse it (round-2 shipped exactly this bug)
    with pytest.raises(ValueError, match="pigeonhole"):
        D.simhash_pairs(docs, max_hamming=10, bands=10)


def test_simhash_banding_equals_bruteforce_hamming(spark):
    """Pigeonhole completeness: with max_hamming < bands the banded
    operator must EXACTLY equal a brute-force all-pairs Hamming
    filter — this equality is what lets the dedup_simhash oracle
    derive the found flag from recomputed signatures alone."""
    docs = load(spark, SF_DIR, "documents").limit(400)
    sigs = D.simhash_signatures(docs)
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in sa.crossJoin(sb)
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 9)
        .collect()
    }
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in D.simhash_pairs(docs, max_hamming=9, bands=10).collect()
    }
    assert banded == brute


def test_knn_lsh_recall_vs_bruteforce(spark):
    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = {(r["qid"], r["vec_id"]) for r in S.cosine_topk(emb, queries, k=5).collect()}
    approx = {
        (r["qid"], r["vec_id"])
        for r in S.knn_lsh(emb, queries, k=5, bands=32, planes_per_band=4).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"knn-lsh recall@5 {recall}"
    # the registered knn_lsh_bucketed config (3 planes/band) must be
    # EXACT on the fixtures — its oracle is the brute-force top-5 SQL
    reg = {
        (r["qid"], r["vec_id"])
        for r in S.knn_lsh(emb, queries, k=5, bands=32, planes_per_band=3).collect()
    }
    assert reg == exact, f"registered knn-lsh config missed {exact - reg}"


def test_cosine_pairs_blocked_matches_broadcast(spark):
    """The distributed grid self-join must emit EXACTLY the broadcast
    path's pairs (incl. cross-block pairs where the lower id hashes to
    the higher block), and the size-guarded dispatcher must route big
    corpora to it without any driver-side corpus collect."""
    emb = load(spark, SF_DIR, "embeddings")
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in S.cosine_pairs(emb, threshold=0.4).collect()
    }
    assert exact
    for n_blocks in (1, 3, 7):
        blocked = {
            (r["vec_a"], r["vec_b"])
            for r in S.cosine_pairs_blocked(
                emb, threshold=0.4, n_blocks=n_blocks
            ).collect()
        }
        assert blocked == exact, f"n_blocks={n_blocks}"
    # dispatcher: corpus over the bound must not reach DataFrame.collect
    import unittest.mock as mock

    with mock.patch.object(
        DataFrame, "collect", side_effect=AssertionError("driver collect")
    ):
        guarded = S.cosine_pairs(
            emb, threshold=0.4, max_broadcast_rows=10, target_block_rows=100
        )
    assert {(r["vec_a"], r["vec_b"]) for r in guarded.collect()} == exact


def test_knn_graph_matches_per_query_topk(spark):
    """The blocked k-NN graph must equal cosine_topk run with the whole
    corpus as the query set, for any block count."""
    emb = load(spark, SF_DIR, "embeddings")
    all_q = emb.select(F.col("vec_id").alias("qid"), "embedding")
    want = {
        (r["qid"], r["vec_id"], r["rk"])
        for r in S.cosine_topk(emb, all_q, k=3).collect()
    }
    for n_blocks in (1, 4):
        got = {
            (r["qid"], r["vec_id"], r["rk"])
            for r in S.knn_graph(emb, k=3, n_blocks=n_blocks).collect()
        }
        assert got == want, f"n_blocks={n_blocks}"


def test_hash_split_deterministic_and_proportional(spark):
    from apache_iceberg_tables_migration_tool_spark.operators.curation import hash_split

    docs = load(spark, SF_DIR, "documents")
    s1 = hash_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    s2 = hash_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    a = {(r["doc_id"], r["split"]) for r in s1.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in s2.select("doc_id", "split").collect()}
    assert a == b  # rerun-stable
    counts = {r["split"]: r["n"] for r in s1.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / total > 0.8  # 90% nominal, small-sample slack
    # a document keeps its split when the corpus grows (subset stability)
    sub = hash_split(docs.limit(50), {"train": 0.9, "val": 0.05, "test": 0.05})
    for r in sub.select("doc_id", "split").collect():
        assert (r["doc_id"], r["split"]) in a
    # salt re-deals the split
    s3 = hash_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05}, salt="v2")
    c = {(r["doc_id"], r["split"]) for r in s3.select("doc_id", "split").collect()}
    assert c != a
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_split(docs, {"train": 0.9, "val": 0.2})


def test_cosine_pairs_lsh_recall(spark):
    emb = load(spark, SF_DIR, "embeddings")
    exact = {
        (r["vec_a"], r["vec_b"]) for r in S.cosine_pairs(emb, threshold=0.4).collect()
    }
    approx = {
        (r["vec_a"], r["vec_b"])
        for r in S.cosine_pairs_lsh(
            emb, threshold=0.4, bands=32, planes_per_band=4
        ).collect()
    }
    assert exact
    assert approx <= exact
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"cosine-lsh recall {recall}"


# ------------------------------------------------------------------ integrity

def test_checksum_order_insensitive_and_sensitive_to_change(spark):
    li = load(spark, SF_DIR, "lineitem")
    shuffled = li.repartition(7).sortWithinPartitions("l_partkey")
    assert tables_match(li, shuffled)
    changed = li.withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") == 7, F.col("l_quantity") + 1).otherwise(
            F.col("l_quantity")
        ),
    )
    assert not tables_match(li, changed)
    c = table_checksum(li)
    assert c.n_rows == li.count()


def test_row_diff_localizes_mismatch(spark):
    a = spark.range(10).withColumn("v", F.col("id") * 2)
    b = a.where(F.col("id") != 3).unionByName(
        spark.range(3, 4).withColumn("v", F.lit(999).cast("bigint"))
    )
    d = row_diff(a, b).collect()
    sides = {(r["id"], r["side"]) for r in d}
    assert (3, "left_only") in sides and (3, "right_only") in sides
    assert len(d) == 2


# ------------------------------------------------------------- IVF ANN index

def test_knn_ivf_recall_vs_bruteforce(spark):
    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = {(r["qid"], r["vec_id"]) for r in S.cosine_topk(emb, queries, k=5).collect()}
    approx = {
        (r["qid"], r["vec_id"])
        for r in S.knn_ivf(emb, queries, k=5, nlist=16, nprobe=12).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"knn-ivf recall@5 {recall}"
    # the registered knn_ivf query pins PER-QUERY recall@5 >= 0.8
    # (its oracle pins the recall_ok boolean TRUE for every qid)
    from collections import Counter

    found = Counter(q for q, v in approx & exact)
    assert all(found[q] >= 4 for q in range(10)), f"per-qid overlap {dict(found)}"


# ----------------------------------------------------------- skew primitives

def test_salted_agg_matches_direct(spark):
    from apache_iceberg_tables_migration_tool_spark.operators.skew import salted_agg

    ev = load(spark, SF_DIR, "events")
    direct = {
        r["event_type"]: (r["n"], r["mn"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["mn"], r["mx"])
        for r in salted_agg(
            ev,
            keys=["event_type"],
            aggs={"n": ("1", "count"), "mn": ("value", "min"), "mx": ("value", "max")},
            salt_cols=["event_id"],
            salt_buckets=16,
        ).collect()
    }
    assert salted == direct


def test_salted_join_matches_direct(spark):
    from apache_iceberg_tables_migration_tool_spark.operators.skew import salted_join

    orders = load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, SF_DIR, "customer").select("c_custkey", "c_name").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    direct = {
        (r["o_orderkey"], r["c_name"]) for r in orders.join(cust, "o_custkey").collect()
    }
    salted = {
        (r["o_orderkey"], r["c_name"])
        for r in salted_join(orders, cust, on=["o_custkey"], salt_buckets=8).collect()
    }
    assert salted == direct


def test_salted_join_left_keeps_unmatched(spark):
    from apache_iceberg_tables_migration_tool_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], "k int, v string")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    out = salted_join(big, small, on=["k"], salt_buckets=4, how="left").collect()
    assert len(out) == 3
    assert {r["k"]: r["w"] for r in out} == {1: "x", 2: "y", 99: None}


def test_asof_tolerance_bounds_match_gap(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "l1"), (2, _ts("2024-01-01T12:00:00"), "l2")],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T11:59:00"), "recent"),
         (2, _ts("2024-01-01T09:00:00"), "stale")],
        "k int, ts timestamp, rv string",
    )
    out = {
        r["k"]: r["rv"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", tolerance_sec=600
        ).collect()
    }
    assert out == {1: "recent", 2: None}  # stale match nulled by tolerance
    inner = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", how="inner", tolerance_sec=600
    ).count()
    assert inner == 1


def test_connected_components_chain_and_convergence(spark):
    from apache_iceberg_tables_migration_tool_spark.operators.dedup import (
        connected_components,
    )

    # 1-2-3-4-5 chain (diameter 4 → several propagation rounds),
    # a separate 2-clique {10,11}, and pair (20,21) joined via 21-22
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_raises_without_convergence(spark):
    from apache_iceberg_tables_migration_tool_spark.operators.dedup import (
        connected_components,
    )
    import pytest as _pytest

    long_chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="converge"):
        connected_components(long_chain, max_iter=1)


def test_int8_quantization_bounds_and_recall(spark):
    """SQ8 codes are in [0,255], reconstruction error ≤ scale/2 per
    component, and quantized top-5 recalls ≥0.9 of the exact top-5."""
    emb = load(spark, SF_DIR, "embeddings")
    qz = S.dequantize_int8(S.quantize_int8(emb))
    row = qz.join(emb, "vec_id").select("embedding", "codes", "scale", "dq").first()
    assert all(0 <= c <= 255 for c in row["codes"])
    for x, d in zip(row["embedding"], row["dq"]):
        assert abs(x - d) <= row["scale"] / 2 + 1e-12

    from apache_iceberg_tables_migration_tool_spark.queries.northstar import (
        knn_int8_quantized,
        knn_topk_cosine,
    )

    exact = {
        (r["qid"], r["vec_id"]) for r in knn_topk_cosine(spark, SF_DIR).collect()
    }
    quant = {
        (r["qid"], r["vec_id"]) for r in knn_int8_quantized(spark, SF_DIR).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, f"quantized recall {recall}"


def test_duplicate_spans_rejects_degenerate_params(spark):
    docs = load(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="window"):
        D.duplicate_spans(docs, window=0)
    with pytest.raises(ValueError, match="min_occurrences"):
        D.duplicate_spans(docs, min_occurrences=0)


def test_minhash_arrow_matches_sql_formulation(spark):
    """The Arrow-batched numpy signature fold must stay bit-identical
    to the pure-JVM SQL formulation it replaced (same universal hash
    family, int64-exact on both engines)."""
    docs = load(spark, SF_DIR, "documents").limit(200)
    arrow = {r["doc_id"]: list(r["sig"]) for r in D.minhash_signatures(docs, num_hashes=48).collect()}
    sql = {r["doc_id"]: list(r["sig"]) for r in D.minhash_signatures_sql(docs, num_hashes=48).collect()}
    assert arrow == sql


def test_asof_prefilter_right_is_output_identical(spark):
    """prefilter_right semi-joins right to the left key set — a pure
    shuffle-size optimization, so output must match exactly even when
    the right side carries keys the left never mentions."""
    left = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 15.0)], "k bigint, lts double"
    )
    right = spark.createDataFrame(
        [(1, 5.0, "a"), (1, 15.0, "b"), (2, 14.0, "c"),
         (99, 1.0, "ghost"), (98, 2.0, "ghost2")],
        "k bigint, rts double, v string",
    )
    base = asof_join(left, right, on="k", left_ts="lts", right_ts="rts")
    pre = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", prefilter_right=True
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, pre.collect()))
    for how, direction in (("inner", "forward"), ("left", "backward")):
        b = asof_join(left, right, "k", "lts", "rts", how, direction, 6.0)
        p = asof_join(left, right, "k", "lts", "rts", how, direction, 6.0, True)
        assert sorted(map(tuple, b.collect())) == sorted(map(tuple, p.collect()))


def test_ngram_df_cap_defuses_hot_shingle_skew(spark):
    """Scale-hazard evidence: a boilerplate shingle shared by EVERY doc
    would fan the pair join out quadratically (n docs -> n^2 candidate
    rows). With max_shingle_docs the hot shingle is dropped from sizes
    and intersections on both engines, so the join stays bounded and
    genuinely-similar pairs still surface."""
    import pandas as pd

    n = 300
    boiler = "copyright footer all rights reserved contact us terms"
    rows = []
    for i in range(n):
        # distinct bodies, one shared boilerplate tail
        body = f"unique body {i} " + " ".join(f"w{i}_{j}" for j in range(10))
        rows.append((i, body + " " + boiler))
    # one true near-dup pair: same body, different id
    rows.append((n, rows[0][1]))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    pairs = D.ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_docs=20)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (0, n) in got, "true near-dup must survive the cap"
    # boilerplate-only overlaps (every doc shares the tail) must NOT
    # produce pairs: their post-cap intersection is empty
    assert all(a == 0 and b == n for a, b in got), f"skew pairs leaked: {got}"


def test_knn_pq_recall_vs_exact(spark):
    """PQ/ADC approximate search: compressed-code scoring + exact
    re-rank must recover >= 4 of the true top-5 per query."""
    from apache_iceberg_tables_migration_tool_spark.operators import similarity as S
    from apache_iceberg_tables_migration_tool_spark.sources.fixtures import load
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.where("vec_id < 6").selectExpr("vec_id AS qid", "embedding")
    approx = S.knn_pq(emb, queries, k=5, m=16, ksub=32, rerank=200).select("qid", "vec_id")
    exact = S.cosine_topk(emb, queries, k=5).select("qid", "vec_id")
    hits = approx.join(exact, ["qid", "vec_id"]).groupBy("qid").count().collect()
    assert len(hits) == 6
    for r in hits:
        assert r["count"] >= 4, f"recall too low for qid={r['qid']}"
    # every query returns exactly k results
    n = approx.groupBy("qid").count().collect()
    assert all(r["count"] == 5 for r in n)


def test_pq_codes_compress_and_deterministic(spark):
    from apache_iceberg_tables_migration_tool_spark.operators import similarity as S
    from apache_iceberg_tables_migration_tool_spark.sources.fixtures import load
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings").limit(200)
    codes1, books1 = S.pq_index(emb, m=8, ksub=16)
    codes2, books2 = S.pq_index(emb, m=8, ksub=16)
    import numpy as np

    assert np.array_equal(books1, books2)  # seeded: deterministic
    c1 = {r["vec_id"]: tuple(r["codes"]) for r in codes1.collect()}
    c2 = {r["vec_id"]: tuple(r["codes"]) for r in codes2.collect()}
    assert c1 == c2 and len(c1) == 200
    assert all(len(v) == 8 and all(0 <= x < 16 for x in v) for v in c1.values())


def test_bigram_surprisal_hand_corpus(spark):
    """Tiny corpus scored against a pure-Python bigram-LM reference:
    first token at unigram surprisal, the rest at
    floor(log2(C1(prev)/C2(prev,cur))) — all exact bit_length math."""
    from collections import Counter

    texts = {1: "a b a b", 2: "a b a b", 3: "b a", 4: "a a b"}
    toks = {i: t.split(" ") for i, t in texts.items()}
    c1 = Counter(w for ws in toks.values() for w in ws)
    total = sum(c1.values())
    c2 = Counter(
        (ws[i - 1], ws[i]) for ws in toks.values() for i in range(1, len(ws))
    )

    def ref(ws):
        s = (total // c1[ws[0]]).bit_length() - 1
        for i in range(1, len(ws)):
            s += (c1[ws[i - 1]] // c2[(ws[i - 1], ws[i])]).bit_length() - 1
        return s

    from apache_iceberg_tables_migration_tool_spark.operators.text import bigram_surprisal

    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["surprisal_scaled"])
           for r in bigram_surprisal(df).collect()}
    for i, ws in toks.items():
        assert got[i] == (len(ws), ref(ws)), f"doc {i}"
    # word order matters: 'b a' repeated never follows corpus order a->b
    # as often, so docs of equal unigram composition can differ here


# ------------------------------------------------------------------ IVM

def test_ivm_group_birth_and_death(spark):
    """apply_agg_delta must drop groups whose count reaches zero and
    create groups born in the delta — matching a recompute exactly."""
    from apache_iceberg_tables_migration_tool_spark.operators import ivm

    base_rows = [("a", 1, 10), ("a", 2, 20), ("b", 3, 30)]
    base_df = spark.createDataFrame(base_rows, "g string, k int, v int")
    base = ivm.grouped_aggregate(base_df, ["g"], ["v"])
    # delete both 'a' rows, insert two 'c' rows, adjust 'b'
    cl = spark.createDataFrame(
        [
            ("delete", "a", 10), ("delete", "a", 20),
            ("insert", "c", 5), ("insert", "c", 7),
            ("insert", "b", 1),
        ],
        "_change_type string, g string, v int",
    )
    delta = ivm.agg_delta(cl, ["g"], ["v"])
    got = {
        r["g"]: (r["group_count"], r["sum_v"])
        for r in ivm.apply_agg_delta(base, delta, ["g"], ["v"]).collect()
    }
    assert got == {"b": (2, 31), "c": (2, 12)}  # 'a' died, 'c' born


def test_ivm_null_group_key_merges(spark):
    """NULL group keys must merge base+delta like any other group —
    the union+re-group formulation's reason to exist."""
    from apache_iceberg_tables_migration_tool_spark.operators import ivm

    base = ivm.grouped_aggregate(
        spark.createDataFrame([(None, 1), ("a", 2)], "g string, v int"), ["g"], ["v"]
    )
    cl = spark.createDataFrame(
        [("insert", None, 4), ("delete", "a", 2)], "_change_type string, g string, v int"
    )
    got = {
        r["g"]: (r["group_count"], r["sum_v"])
        for r in ivm.apply_agg_delta(
            base, ivm.agg_delta(cl, ["g"], ["v"]), ["g"], ["v"]
        ).collect()
    }
    assert got == {None: (2, 5)}  # null group merged; 'a' died


def test_cosine_pairs_single_upstream_execution(spark):
    """The dispatch count must not re-execute the upstream lineage
    (round-6 verdict): an accumulator-instrumented upstream runs
    exactly once per call on BOTH the broadcast and the blocked
    path."""
    import pandas as pd

    from apache_iceberg_tables_migration_tool_spark.sources.fixtures import load
    from tests.conftest import SF_DIR

    base = (
        load(spark, SF_DIR, "embeddings")
        .limit(40)
        .select("vec_id", "embedding")
    )

    def run(**kw):
        acc = spark.sparkContext.accumulator(0)

        def bump(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        emb = base.mapInPandas(bump, schema="vec_id long, embedding array<double>")
        S.cosine_pairs(emb, threshold=0.4, **kw).collect()
        return acc.value

    assert run() == 40  # broadcast path
    assert run(max_broadcast_rows=10, target_block_rows=8) == 40  # blocked path


def test_resample_forward_fill_gap_days(spark):
    from apache_iceberg_tables_migration_tool_spark.operators.windows import (
        resample_forward_fill,
    )

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1.5),
            (1, "2024-01-01 12:00:00", 2.0),   # day 1: sum 3.5
            (1, "2024-01-04 09:00:00", 10.0),  # days 2-3 are gaps
            (2, "2024-01-02 00:00:00", 7.0),   # single-day span
        ],
        "user_id bigint, ts_s string, value double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    out = {
        (r["user_id"], str(r["day"])): r
        for r in resample_forward_fill(df).collect()
    }
    # user 1: dense grid 01-01..01-04
    assert {k[1] for k in out if k[0] == 1} == {
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"
    }
    d1 = out[(1, "2024-01-01")]
    assert d1["n_events"] == 2 and d1["day_sum"] == 3_500_000
    gap = out[(1, "2024-01-02")]
    assert gap["n_events"] == 0 and gap["day_sum"] is None
    assert gap["filled_sum"] == 3_500_000  # carried forward
    assert out[(1, "2024-01-03")]["filled_sum"] == 3_500_000
    d4 = out[(1, "2024-01-04")]
    assert d4["day_sum"] == 10_000_000 and d4["filled_sum"] == 10_000_000
    # user 2: one day, no gaps
    assert {k[1] for k in out if k[0] == 2} == {"2024-01-02"}


def test_pin_reliable_checkpoint(spark, monkeypatch, tmp_path):
    """SPARK_GRAFT_RELIABLE_CHECKPOINT routes the engine's lineage
    barriers through a reliable checkpoint (blocks on durable storage,
    survives executor loss) instead of localCheckpoint."""
    import os

    from apache_iceberg_tables_migration_tool_spark.session import pin

    ckpt = tmp_path / "ckpt"
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(ckpt))
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    out = pin(df, eager=True)
    assert out.count() == 100
    assert sorted(r["x"] for r in out.collect()) == [2 * i for i in range(100)]
    # the reliable path materialized blocks under the checkpoint dir
    files = [
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(ckpt)
        for f in fn
    ]
    assert files, "reliable checkpoint wrote nothing under SPARK_GRAFT_CHECKPOINT_DIR"
    # default path (env unset) stays localCheckpoint: nothing new on disk
    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CHECKPOINT")
    out2 = pin(spark.range(10), eager=True)
    assert out2.count() == 10

"""Full-text search over the ``documents`` corpus: BM25 ranking and
inverted-index posting lists, built entirely from DataFrame
transformations (north-star extension beyond SURVEY §2 — the
reference has no text-retrieval surface; this is the query side of
the LLM-data-pipeline story, e.g. "find the corpus documents most
relevant to an eval prompt").

Scale design (100 TB corpus, ~10-term query):

- The corpus is scanned ONCE for token statistics. Per-document
  length ``dl`` is a codegen ``size(split(...))`` — no explode, no
  shuffle, just a narrow map over the scan.
- Term frequencies are computed only for the QUERY terms: the token
  array is filtered with ``array_contains`` against a literal array
  BEFORE the explode, so the exploded relation is O(matching tokens),
  not O(corpus tokens).
- Document frequencies and corpus totals are tiny aggregates
  (|query| rows and 1 row); both are broadcast back, so the only
  exchange in the whole plan is the final per-document sum over at
  most |query| rows per document.

Cross-engine determinism: BM25 uses transcendental ``log`` and float
division, which are NOT bit-stable across engines. Scores here are
therefore computed in exact int64 arithmetic — the BM25 rational
form is scaled and floored, every intermediate stays integral, and
integer division of non-negative operands truncates identically in
Spark (``div``) and DuckDB (``//``). With k1 = 1.2 and b = 0.75:

    idf_scaled(t) = max(0, (1000 * (2N - 2*df + 1)) div (2*df + 1))
    score(d)      = sum_t (idf_scaled(t) * 22 * tf * T)
                          div (10*tf*T + 3*T + 9*dl*N)

which is floor(1000 * idf_BM25+) and floor of the classic
tf-saturation term multiplied through by the common denominator
(T = corpus token count, N = corpus docs, dl = doc length). int64
bounds: idf ≤ 1000*(2N), numerator ≤ 2e3*N*22*tf*T — safe past
SF 1 (N=5e4, T=3e6 → ~3e17 < 2^63).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

IDF_SCALE = 1000


def _tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + token array + doc length, one narrow projection."""
    return docs.select(
        "doc_id",
        F.split(F.col(text_col), " ").alias("toks"),
    ).select(
        "doc_id",
        "toks",
        F.size("toks").cast("long").alias("dl"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under integer-scaled
    BM25 (k1=1.2, b=0.75). Returns (doc_id, bm25_scaled) ordered by
    score desc, doc_id asc.

    One corpus scan; the explode is pre-filtered to query terms; df
    and corpus stats are broadcast joins; the final TopK is a
    TakeOrderedAndProject, never a global sort materialization.
    """
    terms = sorted(set(query_terms))
    toks = _tokens(docs, text_col)

    # corpus stats: 1 row (N docs, T tokens) — broadcast scalar dim
    stats = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("n_tokens"),
    )

    # term frequency of QUERY terms only: filter the token array
    # before exploding so the exploded relation is O(hits)
    lit_terms = F.array(*[F.lit(t) for t in terms])
    tf = (
        toks.select(
            "doc_id",
            "dl",
            F.explode(
                F.filter("toks", lambda t: F.array_contains(lit_terms, t))
            ).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )

    # document frequency per query term: |query| rows — broadcast
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_scaled",
            F.greatest(
                F.lit(0).cast("long"),
                F.expr(
                    f"({IDF_SCALE} * (2*n_docs - 2*df + 1)) div (2*df + 1)"
                ),
            ),
        )
        .withColumn(
            "term_score",
            F.expr(
                "(idf_scaled * 22 * tf * n_tokens) "
                "div (10*tf*n_tokens + 3*n_tokens + 9*dl*n_docs)"
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_score").cast("long").alias("bm25_scaled"))
    )
    return scored.orderBy(F.desc("bm25_scaled"), F.asc("doc_id")).limit(k)


def posting_lists(
    docs: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
) -> DataFrame:
    """Inverted-index slice for the given terms: per term, document
    frequency, total term frequency, and the sorted posting list of
    doc_ids rendered as a CSV string (a string, not an array, so the
    result is portable across engines byte-for-byte).

    Same pre-filtered-explode shape as :func:`bm25_topk`; the posting
    list aggregation shuffles only O(hits) rows. At 100 TB a full
    index build would partition BY TERM with this exact plan — the
    per-term slice here is the unit of that build.
    """
    tset = sorted(set(terms))
    lit_terms = F.array(*[F.lit(t) for t in tset])
    hits = (
        _tokens(docs, text_col)
        .select(
            "doc_id",
            F.explode(
                F.filter("toks", lambda t: F.array_contains(lit_terms, t))
            ).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return (
        hits.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.array_join(F.array_sort(F.collect_list("doc_id")), ",").alias(
                "postings_csv"
            ),
        )
        .orderBy("term")
    )

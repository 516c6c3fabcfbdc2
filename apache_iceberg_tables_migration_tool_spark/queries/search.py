"""Full-text retrieval as oracle-checked queries: integer-scaled
BM25 ranking and an inverted-index slice over ``documents``
(operators/search.py). Scores use exact int64 rational arithmetic
(no ``log``, no float division), so DuckDB reproduces every value
bit-for-bit — see the determinism note in the operator module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from apache_iceberg_tables_migration_tool_spark.operators import search as S
from apache_iceberg_tables_migration_tool_spark.queries.registry import query
from apache_iceberg_tables_migration_tool_spark.sources.fixtures import load

_QUERY_TERMS = ("join", "spark", "stream", "window")
_TERMS_SQL = ", ".join(f"'{t}'" for t in _QUERY_TERMS)
_K = 10

# Shared DuckDB tokenization CTEs (twin of operators/search._tokens)
_TOKEN_CTE = f"""
w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM w),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS n_tokens FROM dl),
tok AS (SELECT doc_id, unnest(toks) AS term FROM w),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM tok WHERE term IN ({_TERMS_SQL}) GROUP BY 1, 2),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1)
"""


@query(
    "bm25_search_topk",
    # scalar-broadcast: the 1-row corpus-stats aggregate joins in via
    # BroadcastNestedLoopJoin by design (see test_plans._BNLJ_OK)
    tags=("search", "text", "scalar-broadcast"),
    oracle=f"""
WITH {_TOKEN_CTE}
SELECT tf.doc_id,
       CAST(SUM(
         (GREATEST(0, ({S.IDF_SCALE} * (2*n_docs - 2*df + 1)) // (2*df + 1))
            * 22 * tf * n_tokens)
         // (10*tf*n_tokens + 3*n_tokens + 9*dl.dl*n_docs)
       ) AS BIGINT) AS bm25_scaled
FROM tf
JOIN dfreq USING (term)
JOIN dl USING (doc_id)
CROSS JOIN stats
GROUP BY tf.doc_id
ORDER BY bm25_scaled DESC, tf.doc_id
LIMIT {_K}
""",
)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents for the query {{join, spark, stream, window}}
    under integer-scaled BM25. One corpus scan, explode pre-filtered
    to query terms, df/corpus stats broadcast, TakeOrderedAndProject
    final — the relevance-retrieval step of an eval-vs-corpus audit
    at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    return S.bm25_topk(docs, _QUERY_TERMS, k=_K)


@query(
    "inverted_index_terms",
    tags=("search", "text"),
    oracle=f"""
WITH {_TOKEN_CTE}
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
         AS postings_csv
FROM tf
GROUP BY term
ORDER BY term
""",
)
def inverted_index_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index slice for four terms: per-term document
    frequency, total term frequency, and the sorted posting list as
    CSV. The per-term build unit of a full search index — partition
    by term and this exact plan scales out."""
    docs = load(spark, sf_dir, "documents")
    return S.posting_lists(docs, _QUERY_TERMS)


from apache_iceberg_tables_migration_tool_spark.operators import text as X  # noqa: E402


@query(
    "unigram_surprisal_quality",
    tags=("text", "curation", "scalar-broadcast"),
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1),
total AS (SELECT CAST(SUM(c) AS BIGINT) AS t_total FROM counts),
s AS (SELECT doc_id,
             CAST(length(bin(t_total // c)) - 1 AS BIGINT) AS s
      FROM tok JOIN counts USING (term) CROSS JOIN total)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(s) AS BIGINT) AS surprisal_scaled,
       CAST((SUM(s) * 100) // COUNT(*) AS BIGINT) AS mean_surprisal_x100
FROM s GROUP BY doc_id
""",
)
def unigram_surprisal_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring, exact: per-token surprisal
    floor(log2(T/C(t))) via integer ops (length(bin(x))-1), summed
    per document — the unigram-LM filter of a pretraining pipeline
    with a bit-identical DuckDB twin (no transcendental functions)."""
    docs = load(spark, sf_dir, "documents")
    return X.unigram_surprisal(docs)


@query(
    "bigram_surprisal_quality",
    tags=("text", "curation", "scalar-broadcast"),
    oracle="""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS term FROM d),
uni AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c1 FROM tok GROUP BY 1),
total AS (SELECT CAST(SUM(c1) AS BIGINT) AS t_total FROM uni),
firsts AS (
  SELECT doc_id, CAST(length(bin(t_total // c1)) - 1 AS BIGINT) AS s
  FROM (SELECT doc_id, w[1] AS term FROM d WHERE len(w) >= 1)
  JOIN uni USING (term) CROSS JOIN total),
bg AS (
  SELECT doc_id, w[i] AS prev, w[i + 1] AS cur
  FROM d, unnest(range(1, len(w))) AS r(i)),
bgc AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2),
rest AS (
  SELECT bg.doc_id, CAST(length(bin(u.c1 // bgc.c2)) - 1 AS BIGINT) AS s
  FROM bg JOIN bgc USING (prev, cur)
  JOIN uni u ON u.term = bg.prev),
s AS (SELECT * FROM firsts UNION ALL SELECT * FROM rest)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(s) AS BIGINT) AS surprisal_scaled,
       CAST((SUM(s) * 100) // COUNT(*) AS BIGINT) AS mean_surprisal_x100
FROM s GROUP BY doc_id
""",
)
def bigram_surprisal_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity-style quality scoring, exact: token i
    scores floor(log2(C1(prev)/C2(prev,cur))) — word-ORDER
    improbability the unigram filter can't see — with the first token
    at its unigram surprisal. Self-scoring the corpus means every
    bigram has C2 >= 1 (no smoothing branch), so both engines compute
    identical integers (length(bin(x))-1, no transcendentals)."""
    docs = load(spark, sf_dir, "documents")
    return X.bigram_surprisal(docs)

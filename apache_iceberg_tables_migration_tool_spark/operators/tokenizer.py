"""Distributed BPE tokenizer training and encoding (north star X4
extension — the tokenizer-construction step of a training-data
pipeline; the reference has no counterpart, its pipeline stops at
table migration).

Classic byte-pair-encoding (Sennrich et al. 2016, public method):
train on the WORD-FREQUENCY table, not the raw corpus — one
distributed ``groupBy(word)`` collapses 100 TB of text into a
distinct-word table (millions/billions of tiny rows), and every merge
round after that touches only that table:

  round k: explode adjacent token pairs weighted by word frequency
           → one hash-shuffle pair count
           → argmax pair (the driver sees ONE row — a control-plane
             scalar, not a data collect)
           → apply the merge to the word table (a regexp ``replace``
             inside whole-stage codegen — no Python in the row path)

The loop is K rounds = K narrow shuffles over the distinct-word
table; the corpus itself is read exactly once. ``localCheckpoint``
truncates the growing lineage every few rounds (same discipline as
``dedup.connected_components``).

Words are carried as SEP-joined token strings (SEP = ``\\x00``, a
byte that never appears in text). A merge of (a, b) is the regex
``\\Qsep+a+sep+b\\E(?=\\Qsep\\E)`` → ``sep+ab``: the lookahead keeps
the trailing separator unconsumed, so back-to-back occurrences
(``a b a b``) each see their own leading separator and all merge in
one round, while a repeated-token run (``a a a``) merges
leftmost-greedily (``aa a``) — exactly the sequential BPE convention.
Determinism: pair argmax breaks count ties lexicographically on
(left, right); pytest pins the distributed trainer bit-for-bit
against a pure-Python reference implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F
from apache_iceberg_tables_migration_tool_spark.session import pin

#: token separator inside the "word as token string" encoding
SEP = "\x00"
#: end-of-word marker fused onto a word's last character (standard BPE
#: practice — prevents merges from acting across word boundaries and
#: distinguishes word-final tokens)
EOW = "▁"


def _merge_pattern(left: str, right: str) -> str:
    """Regex applying merge (left, right) to a SEP-wrapped token
    string. ``\\Q…\\E`` quoting — tokens are data, not patterns."""
    return (
        "\\Q" + SEP + left + SEP + right + "\\E" + "(?=\\Q" + SEP + "\\E)"
    )


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan → the distinct-word frequency table BPE trains
    on: (word, freq). Normalization: lowercase, whitespace split,
    alphanumeric-edge strip (deterministic and cheap; real pipelines
    plug their own pre-tokenizer here)."""
    return (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("raw"))
        .select(F.regexp_replace("raw", r"^[^0-9a-z]+|[^0-9a-z]+$", "").alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _to_token_string(word_col: Column) -> Column:
    """``abc`` → ``a␀b␀c▁``: one token per character, EOW fused onto
    the last."""
    return F.concat(F.array_join(F.split(word_col, ""), SEP), F.lit(EOW))


def _apply_merge(toks_col: Column, left: str, right: str) -> Column:
    """Merge adjacent (left, right) throughout a token string."""
    wrapped = F.concat(F.lit(SEP), toks_col, F.lit(SEP))
    replaced = F.regexp_replace(
        wrapped, _merge_pattern(left, right), SEP + left + right
    )
    return F.substring(replaced, F.lit(2), F.length(replaced) - F.lit(2))


def train_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> list[Row]:
    """Learn ``num_merges`` BPE merges; returns the ordered merge
    table as rows of (rank, left, right, merged, pair_count)."""
    words = word_frequencies(docs, text_col).select(
        _to_token_string(F.col("word")).alias("toks"), "freq"
    )
    # reused K times: materialize once, keep lineage flat (at scale:
    # a persisted temp table / dataset cache)
    words = words.transform(pin, eager=True)
    merges: list[Row] = []
    for rank in range(num_merges):
        pairs = (
            words.withColumn("__t", F.split(F.col("toks"), SEP))
            .where(F.size("__t") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(__t) - 2), "
                        "i -> struct(__t[i] AS l, __t[i + 1] AS r))"
                    )
                ).alias("pair"),
                F.col("freq"),
            )
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair.l"), F.asc("pair.r"))
            .limit(1)
            .collect()
        )
        if not best:
            break  # every word is a single token — vocabulary saturated
        left, right, cnt = best[0]["pair"]["l"], best[0]["pair"]["r"], best[0]["cnt"]
        merges.append(
            Row(rank=rank, left=left, right=right, merged=left + right, pair_count=cnt)
        )
        words = words.withColumn("toks", _apply_merge(F.col("toks"), left, right))
        if (rank + 1) % checkpoint_every == 0:
            words = words.transform(pin, eager=True)
    return merges


def train_bpe_df(
    docs: DataFrame, num_merges: int, text_col: str = "text"
) -> DataFrame:
    """:func:`train_bpe` as a DataFrame (rank, left, right, merged,
    pair_count) for registry/query use."""
    spark = docs.sparkSession
    merges = train_bpe(docs, num_merges, text_col)
    schema = "rank int, left string, right string, merged string, pair_count long"
    return (
        spark.createDataFrame(merges, schema)
        if merges
        else spark.createDataFrame([], schema)
    )


def _word_token_count(word_col: Column, merges: list[Row]) -> Column:
    """Tokens a single normalized word encodes to under the merge
    table — K chained regexp replaces, all whole-stage codegen; the
    merge table ships as plan literals, so encoding is a pure map."""
    expr = F.concat(F.lit(SEP), _to_token_string(word_col), F.lit(SEP))
    for m in merges:
        expr = F.regexp_replace(
            expr, _merge_pattern(m["left"], m["right"]), SEP + m["merged"]
        )
    return F.size(F.split(expr, SEP)) - 2  # sentinel wraps split to ""


def encode_token_counts(
    df: DataFrame,
    merges: list[Row],
    text_col: str = "text",
    out_col: str = "bpe_token_count",
) -> DataFrame:
    """Per-document BPE token count under a learned merge table —
    the sizing primitive of a training-data pipeline (sequence
    packing, token budgeting)."""
    norm = lambda w: F.regexp_replace(w, r"^[^0-9a-z]+|[^0-9a-z]+$", "")  # noqa: E731
    words_arr = F.filter(
        F.transform(F.split(F.lower(F.col(text_col)), r"\s+"), norm),
        lambda w: w != "",
    )
    counts = F.transform(words_arr, lambda w: _word_token_count(w, merges))
    return df.withColumn(
        out_col, F.coalesce(F.aggregate(counts, F.lit(0), lambda a, b: a + b), F.lit(0))
    )

"""Text-analysis operators for training-data pipelines (north star X4).

Whitespace tokenization, character n-gram-free word shingles,
quality/stat features, rule-based language scoring, and a rolling
polynomial fingerprint — all as JVM-side expressions (split /
higher-order array functions), no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FP_MOD = 1_000_000_007
FP_MULT = 31

#: tiny per-language stopword marker sets for the rule-based language
#: scorer (heuristic n-gram/stopword language-ID, X4)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "et", "un"),
    "de": ("der", "und", "das"),
}


def words(col: Column | str) -> Column:
    """Whitespace tokenization (single-space; fixture texts are
    single-spaced word soup)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    return F.size(words(col))


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, window_expr: str
) -> DataFrame:
    """Shared shingle scaffold: tokenize once, slide an ``n``-window
    ``transform`` over the token array, dedupe, explode → (id,
    shingle). ``window_expr`` is the per-window SQL expression (it
    sees ``__toks`` and the window start ``i``); both shingle
    variants differ ONLY in it, so tokenizer/guard fixes land once.

    The split happens once into a projected column — the naive form
    re-evaluates split() inside the guard, the sequence bound, and
    every window (Catalyst does not CSE across those positions;
    measured ~3× the scan cost at sf0.1). Docs shorter than ``n``
    words yield no rows (guarded — Spark's ``sequence`` would
    otherwise run backwards).
    """
    toks = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__toks"))
    shingle_arr = F.expr(
        f"array_distinct(transform(sequence(0, size(__toks) - {n}), "
        f"i -> {window_expr}))"
    )
    return (
        toks.where(F.size("__toks") >= n)
        .select(F.col(id_col), F.explode(shingle_arr).alias("shingle"))
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document → (id, shingle).

    Built with sequence/transform/slice so shingling happens inside
    whole-stage codegen (see ``_exploded_shingles`` for the shared
    scaffold and its guards).
    """
    return _exploded_shingles(
        df, id_col, text_col, n,
        f"concat_ws(' ', slice(__toks, i + 1, {n}))",
    )


def hashed_word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Word n-gram shingles hashed to longs → (id, shingle: long).

    Self-joins and shuffles then move 8-byte longs instead of
    variable-length strings — measured ~20% off the exact-Jaccard
    pair join at sf0.1. The hash is ``xxhash64`` over the n token
    strings DIRECTLY (multi-argument form) instead of hashing a
    ``concat_ws`` of them: the concatenated shingle string is never
    materialized and ``array_distinct`` compares 8-byte longs instead
    of strings — measured 2.60 s → 1.74 s on the capped exact-Jaccard
    query at sf0.1 (r14). Any injective-modulo-collisions token→long
    map yields the same Jaccard values, so consumers (exact pairs,
    LSH verify, contamination) are hash-family-independent; only the
    MinHash signature kernel pins its own hash (seed-sensitive recall
    contract) and does not route through here. A cross-doc collision
    would need two of the corpus's distinct shingles to share a
    64-bit hash (birthday bound ≈ d²/2⁶⁴: ~3e-9 at the sf0.01 oracle
    gate, ~0.05 even at 10¹² shingles — and a single collision shifts
    one intersection count by 1, far inside near-dup tolerance).

    NOTE: do NOT carry the per-doc shingle-array (or anything derived
    from it) past the explode — an array column referenced above a
    ``Generate`` is copied into every exploded row (~doc-length² bytes;
    measured 2× the whole pipeline at sf0.1). The separate sizes
    aggregation in the Jaccard path exists to avoid exactly that.
    """
    args = ", ".join(f"element_at(__toks, i + {j + 1})" for j in range(n))
    return _exploded_shingles(df, id_col, text_col, n, f"xxhash64({args})")


def quality_features(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality stats: token count, distinct-token count,
    chars/token, uniq-token ratio. Integer-derived doubles, so values
    are bit-deterministic across engines."""
    w = words(text_col)
    n_tok = F.size(w)
    n_uniq = F.size(F.array_distinct(w))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_uniq_tokens"),
        (F.length(text_col).cast("double") / n_tok).alias("chars_per_token"),
        (n_uniq.cast("double") / n_tok).alias("uniq_ratio"),
    )


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Stopword-overlap score per candidate language: number of
    distinct marker words present in the text."""
    w = words(text_col)
    return {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(text_col: str = "text") -> Column:
    """Argmax of marker-overlap scores with fixed priority order on
    ties (en > es > fr > de > 'und' when all zero)."""
    scores = lang_scores(text_col)
    langs = list(LANG_MARKERS)
    best = scores[langs[0]]
    for lang in langs[1:]:
        best = F.greatest(best, scores[lang])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best == 0, F.lit("und")).otherwise(pred)


def rolling_fingerprint(text_col: str = "text") -> Column:
    """Order-sensitive polynomial rolling hash over tokens:
    ``acc = (acc*31 + ascii(first_char) + len(word)) mod 1e9+7``.

    Deterministic document fingerprint (X4); the DuckDB twin is
    ``list_reduce(list_prepend(0, …))`` — parity-tested."""
    return F.aggregate(
        words(text_col),
        F.lit(0).cast("bigint"),
        lambda acc, wd: (acc * FP_MULT + F.ascii(wd) + F.length(wd)) % FP_MOD,
    )


#: BPE-ish pre-tokenizer segmentation (GPT-2-style classes, rewritten
#: without lookaheads so Java (Spark) and RE2 (DuckDB) agree):
#: contraction suffixes, space-prefixed letter runs, digit runs,
#: punctuation runs, whitespace runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_count_bpe(col: Column | str) -> Column:
    """Subword-style token count: number of BPE-ish pre-tokenizer
    segments (the unit LLM data budgets are measured in, vs the
    whitespace count of :func:`token_count`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0)))


def unigram_surprisal(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document corpus surprisal under a unigram LM — the classic
    perplexity-style quality filter (docs whose tokens are uniformly
    corpus-frequent score low; rare-token-dense docs score high),
    with every value EXACT: instead of float ``-log p`` the per-token
    surprisal is ``floor(log2(T / C(t)))`` computed as
    ``length(bin(T intdiv C(t))) - 1`` — pure integer ops any engine
    reproduces bit-for-bit (no transcendental functions).

    Returns (id, n_tokens, surprisal_scaled, mean_surprisal_x100).

    Scale shape: one explode + two hash shuffles (term-count
    aggregate ≈ vocabulary size, then per-doc sum); the 1-row corpus
    total broadcasts. No Python, no floats until the final x100
    ratio (one exact integer division per doc).
    """
    toks = df.select(F.col(id_col), F.explode(words(text_col)).alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c"))
    total = counts.agg(F.sum("c").cast("long").alias("t_total"))
    scored = (
        toks.join(counts, "term")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            (F.length(F.bin(F.expr("t_total div c"))) - 1).cast("long").alias("s"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("s").cast("long").alias("surprisal_scaled"),
        )
    )
    return scored.select(
        F.col(id_col),
        "n_tokens",
        "surprisal_scaled",
        F.expr("(surprisal_scaled * 100) div n_tokens").alias("mean_surprisal_x100"),
    )


def bigram_surprisal(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document surprisal under a corpus-trained BIGRAM LM — the
    stronger perplexity-style filter (a doc of corpus-frequent words
    in corpus-IMPROBABLE order now scores high, which the unigram
    filter cannot see). Token i scores
    ``floor(log2(C1(prev) / C2(prev, cur)))`` — the exact integer
    form of ``-log2 p(cur | prev)`` — and the document's first token
    falls back to its unigram surprisal ``floor(log2(T / C1))``.
    Self-scoring a corpus means every document bigram exists in the
    counts (C2 >= 1), so no smoothing/backoff branch is needed and
    every value is exact integer arithmetic (``length(bin(x)) - 1``),
    bit-identical across engines.

    Returns (id, n_tokens, surprisal_scaled, mean_surprisal_x100).

    Scale shape: one explode for unigram counts, one for bigram
    counts (vocabulary² upper bound, corpus-bigram actual), then the
    scoring joins — all hash-partitioned, no Python, the 1-row total
    broadcast. The bigram-count join keys on (prev, cur), so hot
    pairs skew-split under AQE like any aggregation."""
    d = df.select(F.col(id_col), words(text_col).alias("__w")).where(
        F.size("__w") >= 1
    )
    tok = d.select(F.col(id_col), F.explode("__w").alias("term"))
    uni = tok.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    total = uni.agg(F.sum("c1").cast("long").alias("t_total"))
    firsts = (
        d.select(F.col(id_col), F.col("__w")[0].alias("term"))
        .join(uni, "term")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            (F.length(F.bin(F.expr("t_total div c1"))) - 1).cast("long").alias("s"),
        )
    )
    bg = d.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(1, size(__w) - 1), "
                "i -> struct(__w[i - 1] AS prev, __w[i] AS cur))"
            )
        ).alias("p"),
    ).select(id_col, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    bgc = bg.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).cast("long").alias("c2")
    )
    rest = (
        bg.join(bgc, ["prev", "cur"])
        .join(uni.select(F.col("term").alias("prev"), "c1"), "prev")
        .select(
            F.col(id_col),
            (F.length(F.bin(F.expr("c1 div c2"))) - 1).cast("long").alias("s"),
        )
    )
    scored = firsts.unionByName(rest).groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("s").cast("long").alias("surprisal_scaled"),
    )
    return scored.select(
        F.col(id_col),
        "n_tokens",
        "surprisal_scaled",
        F.expr("(surprisal_scaled * 100) div n_tokens").alias("mean_surprisal_x100"),
    )


def vocab_coverage(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Out-of-vocabulary audit: the token vocabulary observed in
    ``train`` vs every token OCCURRENCE in ``eval_df``, reported per
    ``group_col`` — the split-health check run before training (a
    val/test slice whose OOV rate spikes for some language signals a
    broken split or an under-covered stratum).

    Plan shape at 100 TB: the vocabulary is a distinct-shuffle over
    train tokens; eval tokens LEFT-join it (AQE promotes the
    vocabulary to broadcast while it fits) and one grouped agg
    produces (group, n_tokens, n_oov, oov token ratio). Everything is
    whole-stage-codegen split/explode — zero Python."""
    vocab = (
        train.select(F.explode(words(text_col)).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
        .withColumn("__in_vocab", F.lit(True))
    )
    toks = eval_df.select(
        F.col(group_col), F.explode(words(text_col)).alias("tok")
    ).where(F.col("tok") != "")
    return (
        toks.join(vocab, "tok", "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("__in_vocab").isNull().cast("long")).alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
        )
    )

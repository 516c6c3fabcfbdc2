"""Distributed BPE trainer vs a pure-Python sequential reference —
bit-for-bit merge-table equality, plus encode-path pinning."""

from __future__ import annotations

from collections import Counter

from apache_iceberg_tables_migration_tool_spark.operators.tokenizer import (
    EOW,
    encode_token_counts,
    train_bpe,
    word_frequencies,
)


# ---- sequential reference (the algorithm BPE papers describe) --------


def _norm_words(texts: list[str]) -> Counter:
    import re

    c: Counter = Counter()
    for t in texts:
        for raw in t.lower().split():
            w = re.sub(r"^[^0-9a-z]+|[^0-9a-z]+$", "", raw)
            if w:
                c[w] += 1
    return c


def _to_tokens(word: str) -> tuple[str, ...]:
    chars = list(word)
    chars[-1] += EOW
    return tuple(chars)


def _merge_word(toks: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return tuple(out)


def ref_train(freqs: Counter, num_merges: int):
    words = {_to_tokens(w): f for w, f in freqs.items()}
    merges = []
    for rank in range(num_merges):
        cnt: Counter = Counter()
        for toks, f in words.items():
            for i in range(len(toks) - 1):
                cnt[(toks[i], toks[i + 1])] += f
        if not cnt:
            break
        (left, right), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, left + right, c))
        words = {
            _merge_word(t, left, right): f for t, f in words.items()
        }
    return merges


def _ref_encode_count(word: str, merges) -> int:
    toks = _to_tokens(word)
    for _rank, left, right, _m, _c in merges:
        toks = _merge_word(toks, left, right)
    return len(toks)


# ---- tests -----------------------------------------------------------

CORPUS = [
    "the cat sat on the mat",
    "the bat and the cat chat",
    "low lower lowest slow slower",
    "ababab ab ab abab",
    "aaaa aa aaa a",
    "newer new newest renew",
]


def test_word_frequencies_match_python(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = {r["word"]: r["freq"] for r in word_frequencies(df).collect()}
    assert got == dict(_norm_words(CORPUS))


def test_train_bpe_matches_sequential_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = [
        (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
        for m in train_bpe(df, 12)
    ]
    assert got == ref_train(_norm_words(CORPUS), 12)


def test_train_bpe_back_to_back_and_runs(spark):
    """The regex merge must handle non-overlapping repeats (ab ab)
    and leftmost-greedy runs (aaa) exactly like the sequential loop."""
    texts = ["ab ab abab ababab", "aaa aaaa aa", "xyxy xy yx"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert [
        (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
        for m in train_bpe(df, 8)
    ] == ref_train(_norm_words(texts), 8)


def test_train_bpe_on_fixture_documents(spark):
    from apache_iceberg_tables_migration_tool_spark.sources.fixtures import load

    from tests.conftest import SF_DIR
    docs = load(spark, SF_DIR, "documents").limit(40)
    texts = [r["text"] for r in docs.select("text").collect()]
    got = [
        (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
        for m in train_bpe(docs, 10)
    ]
    assert got == ref_train(_norm_words(texts), 10)


def test_encode_token_counts_match_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges_rows = train_bpe(df, 10)
    merges_ref = [
        (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
        for m in merges_rows
    ]
    got = {
        r["text"]: r["bpe_token_count"]
        for r in encode_token_counts(df, merges_rows).collect()
    }
    for text in CORPUS:
        want = sum(
            _ref_encode_count(w, merges_ref) * n
            for w, n in _norm_words([text]).items()
        )
        assert got[text] == want, text
    # zero-word text encodes to 0, not null
    z = spark.createDataFrame([("!!!",), ("",)], "text string")
    assert [
        r["bpe_token_count"] for r in encode_token_counts(z, merges_rows).collect()
    ] == [0, 0]

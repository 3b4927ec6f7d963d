"""Unigram-LM tokenizer (text.train_unigram_vocab / unigram_viterbi /
unigram_tokenize_arrow).

The Viterbi oracle is brute-force enumeration of EVERY segmentation on
short words — optimal score and the full tie rule (score DESC, pieces
ASC, longest-piece-last) must agree exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import themis_spark.operators.text as X

VOCAB = dict(
    [(c, -11_000_000 - (ord(c) - 97) * 1000) for c in "abcdefghij"]
    + [("ab", -15_000_000), ("bc", -15_500_000), ("abc", -18_000_000),
       ("cde", -17_000_000), ("de", -16_000_000)]
)


def _all_segs(word, max_len=6):
    if not word:
        yield []
        return
    for k in range(1, min(max_len, len(word)) + 1):
        piece = word[:k]
        lp = VOCAB.get(piece)
        if lp is None and k != 1:
            continue
        for rest in _all_segs(word[k:], max_len):
            yield [piece] + rest


def _brute(word):
    def score(seg):
        return sum(VOCAB.get(p, X.UNIGRAM_UNK_LP) for p in seg)

    def starts(seg):
        out, pos = [], 0
        for p in seg:
            out.append(pos)
            pos += len(p)
        return out

    segs = list(_all_segs(word))
    # score DESC, pieces ASC, then longest-piece-LAST tie rule — which
    # the backward DP realizes as: compare start positions of pieces
    # from the END, preferring the SMALLER start (longer piece)
    best = min(segs, key=lambda s: (-score(s), len(s), starts(s)[::-1]))
    return best, score(best)


@pytest.mark.parametrize("word", [
    "a", "ab", "abc", "abcd", "abcde", "bcdea", "xqz", "axbc",
    "cdeab", "ababab", "zzzzz",
])
def test_viterbi_matches_brute_force(word):
    pieces, score = X.unigram_viterbi(word, VOCAB)
    bp, bs = _brute(word)
    assert score == bs, (word, pieces, bp)
    assert pieces == bp, (word, pieces, bp)


def test_tie_breaks_prefer_fewer_then_longest_last():
    v = {"a": -10, "b": -10, "c": -10, "ab": -20, "bc": -20}
    # a+bc and ab+c both score -30 with 2 pieces; the cell tie rule
    # (j ASC at the last position = longest final piece) picks a+bc
    pieces, score = X.unigram_viterbi("abc", v)
    assert score == -30 and pieces == ["a", "bc"]


def test_training_is_deterministic_and_sized(spark):
    docs = spark.createDataFrame(
        [(i, "the data batch custom filter stream " * 3) for i in range(40)]
        + [(99, "zebra quartz jukebox")],
        "doc_id long, text string")
    v1 = X.train_unigram_vocab(docs, vocab_size=60, sample_docs=50)
    v2 = X.train_unigram_vocab(docs, vocab_size=60, sample_docs=50)
    assert v1 == v2
    d = dict(v1)
    chars = {p for p in d if len(p) == 1}
    # every char of the sample survives with a usable logprob
    for c in "thedabcusfilmrz":
        assert c in chars, c
    assert all(lp > X.UNIGRAM_UNK_LP for lp in d.values())
    # frequent whole words become single pieces
    assert X.unigram_viterbi("data", d)[0] == ["data"]
    assert X.unigram_viterbi("batch", d)[0] == ["batch"]


def test_arrow_kernel_splits_ascii_whitespace_only(spark):
    # review finding (r5): str.split() splits on Unicode whitespace
    # (NBSP etc., common in crawl text) while the Spark-side \s+ filter
    # and the SQL oracle are ASCII-only — the kernel must treat
    # "ab cd" as ONE word (NBSP = unk char inside it), exactly as
    # the oracle DP does, or the cross-engine replay breaks
    vocab = sorted(VOCAB.items())
    rows = [(0, "ab cd"), (1, "ab cd ef"), (2, "ab\tcd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           X.unigram_tokenize_arrow(df, vocab).collect()}
    import re
    for doc_id, text in rows:
        toks, score = [], 0
        for w in re.split(r"[ \t\n\r\f\x0b]+", text.lower()):
            if not w:
                continue
            p, s = X.unigram_viterbi(w, VOCAB)
            toks += p
            score += s
        r = got[doc_id]
        assert list(r["tokens"]) == toks and r["score_micro"] == score, doc_id
    # the NBSP doc is one word: its tokens contain the NBSP char piece
    assert " " in got[0]["tokens"], got[0]["tokens"]
    # the tab doc IS split: no piece contains a tab
    assert all("\t" not in t for t in got[2]["tokens"])


def test_arrow_kernel_matches_local_viterbi(spark):
    vocab = sorted(VOCAB.items())
    rows = [(0, "abc cde xqz"), (1, None), (2, "   "), (3, "ab ab ab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           X.unigram_tokenize_arrow(df, vocab).collect()}
    for doc_id, text in rows:
        toks, score = [], 0
        for w in (text or "").lower().split():
            p, s = X.unigram_viterbi(w, VOCAB)
            toks += p
            score += s
        r = got[doc_id]
        assert list(r["tokens"]) == toks and r["score_micro"] == score, doc_id
        assert r["n_pieces"] == len(toks)

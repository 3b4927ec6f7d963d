"""DSIR importance resampling (text.dsir_*).

Independent Python reference: re-derive hashed-bucket distributions and
log-ratio weights with hashlib/math on a tiny corpus, then check the
Spark frame bit-for-bit (the integer micro-unit contract makes this
exact). Plus the selection semantics (target-like docs outrank), the
gramless-doc neutral path, Gumbel determinism, and plan shape.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

import themis_spark.operators.text as X

B = 64  # small bucket space so collisions actually occur in the test


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text: str) -> list[str]:
    toks = [t for t in text.strip().lower().split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _ref_weights(raw: list[tuple[int, str | None]],
                 target_langs: dict[int, str]) -> dict[int, tuple[int, float]]:
    rawg = [(i, g) for i, t in raw if t is not None for g in _grams(t)]
    tgtg = [g for i, g in rawg if target_langs.get(i) == "en"]
    rb: dict[int, int] = {}
    tb: dict[int, int] = {}
    for _, g in rawg:
        rb[_h60(g) % B] = rb.get(_h60(g) % B, 0) + 1
    for g in tgtg:
        tb[_h60(g) % B] = tb.get(_h60(g) % B, 0) + 1
    tr, tt = len(rawg), len(tgtg)
    lr = {b: round(math.log(((tb.get(b, 0) + 1) * (tr + B))
                            / ((tt + B) * (cr + 1))) * 1e6)
          for b, cr in rb.items()}
    out: dict[int, tuple[int, float]] = {}
    for i, t in raw:
        gs = _grams(t) if t is not None else []
        w = sum(lr[_h60(g) % B] for g in gs)
        out[i] = (len(gs), round(w / 1e6, 6))
    return out


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the cat and the dog play in the garden all day"),
    (2, "der schnelle braune fuchs springt ueber den faulen hund"),
    (3, "le chat et le chien jouent dans le jardin"),
    (4, "the dog and the fox and the cat run in the garden"),
    (5, None),
    (6, "   "),
]
LANGS = {0: "en", 1: "en", 2: "de", 3: "fr", 4: "en", 5: "en", 6: "de"}


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t, LANGS[i]) for i, t in CORPUS]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_weights_match_python_reference(spark, corpus):
    got = {r["doc_id"]: (r["n_grams"], r["dsir_weight"])
           for r in X.dsir_weights(corpus,
                                   corpus.where(F.col("lang") == "en"),
                                   n_buckets=B).collect()}
    expect = _ref_weights(CORPUS, LANGS)
    assert got == expect


def test_gramless_docs_score_neutral_zero(spark, corpus):
    w = {r["doc_id"]: r for r in X.dsir_weights(
        corpus, corpus.where(F.col("lang") == "en"),
        n_buckets=B).collect()}
    assert len(w) == len(CORPUS)  # every raw row survives
    for i in (5, 6):  # null text / whitespace-only
        assert w[i]["n_grams"] == 0 and w[i]["dsir_weight"] == 0.0


def test_target_like_docs_outrank(spark, corpus):
    top = X.dsir_take(corpus, corpus.where(F.col("lang") == "en"),
                      k=3, n_buckets=B).collect()
    assert [LANGS[r["doc_id"]] for r in top] == ["en", "en", "en"]


def test_sample_is_deterministic_and_seed_sensitive(spark, corpus):
    tgt = corpus.where(F.col("lang") == "en")
    a = [r["doc_id"] for r in X.dsir_sample(corpus, tgt, k=4,
                                            n_buckets=B, seed=1).collect()]
    b = [r["doc_id"] for r in X.dsir_sample(corpus, tgt, k=4,
                                            n_buckets=B, seed=1).collect()]
    c = [r["doc_id"] for r in X.dsir_sample(corpus, tgt, k=4,
                                            n_buckets=B, seed=2).collect()]
    assert a == b
    assert a != c  # Gumbel keys reshuffle with the seed


def test_ratio_frame_broadcasts_onto_gram_stream(spark, corpus):
    plan = X.dsir_weights(corpus, corpus.where(F.col("lang") == "en"),
                          n_buckets=B)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_empty_target_raises_loudly(spark, corpus):
    # review finding: a target with zero grams NULLed the totals and
    # silently zeroed every weight -- must raise instead
    with pytest.raises(ValueError, match="target"):
        X.dsir_weights(corpus, corpus.where(F.col("lang") == "xx"),
                       n_buckets=B)
    with pytest.raises(ValueError, match="target"):
        X.dsir_weights(corpus,
                       corpus.where(F.col("doc_id") == 5),  # null text
                       n_buckets=B)

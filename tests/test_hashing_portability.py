"""Third-implementation cross-check for the portable hash families.

The DuckDB oracles prove Spark↔DuckDB agreement on the driver's parquet;
this file proves both agree with an INDEPENDENT pure-Python
reimplementation from the written spec (md5 → first 15 hex digits →
60-bit int; affine MinHash family over 2^31-1; SimHash per-bit
majority) — so a shared misreading of the spec by the two SQL engines
can't hide.
"""

import hashlib

import pytest

from themis_spark.functions.hashing import MERSENNE_P, affine_params
from themis_spark.operators import dedup as D

TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog in the morning"),
    (2, "spark engines shuffle data between executors during wide transformations"),
    (3, "a b c d e f g h i j k l m"),
    (4, "short"),                      # < 3 tokens -> zero shingles -> NULLs
    (5, "repeat repeat repeat repeat repeat repeat"),  # duplicate shingles
    (6, "  leading   and trailing   whitespace   normalization   check  "),
]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _py_shingles(text: str, n: int = 3) -> list[str]:
    toks = text.strip().lower().split()
    out, seen = [], set()
    for i in range(len(toks) - n + 1):
        g = " ".join(toks[i:i + n])
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _py_minhash(text: str, k: int) -> list[int | None]:
    base = [_h60(s) % MERSENNE_P for s in _py_shingles(text)]
    if not base:
        return [None] * k
    sigs = []
    for i in range(k):
        a, b = affine_params(i)
        sigs.append(min((a * h + b) % MERSENNE_P for h in base))
    return sigs


def _py_simhash(text: str, bits: int = 16) -> int:
    toks = text.strip().lower().split()
    th = [_h60(t) for t in toks]
    acc = 0
    for b in range(bits):
        ones = sum((h >> b) & 1 for h in th)
        if 2 * ones > len(th):
            acc |= 1 << b
    return acc


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_minhash_matches_pure_python(spark, docs):
    k = 6
    got = {r["doc_id"]: [r[f"minhash_{i}"] for i in range(k)]
           for r in D.minhash_signatures(docs, num_hashes=k).collect()}
    for doc_id, text in TEXTS:
        assert got[doc_id] == _py_minhash(text, k), (doc_id, text)


def test_simhash_matches_pure_python(spark, docs):
    from pyspark.sql import functions as F

    got = {r["doc_id"]: r["sh"]
           for r in docs.select("doc_id",
                                D.simhash_col(F.col("text"), 16).alias("sh")).collect()}
    for doc_id, text in TEXTS:
        assert got[doc_id] == _py_simhash(text, 16), (doc_id, text)

"""Bloom-filter decontamination (operators/dedup.py bloom_*)."""

import hashlib

from themis_spark.operators import dedup as D


def _docs(spark):
    boiler = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, f"{boiler} one two three four"),           # shares bench grams
        (1, "red orange yellow green blue indigo violet ultraviolet x"),
        (2, f"intro words {boiler} trailing tail"),     # shares bench grams
        (3, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    boiler = "alpha beta gamma delta epsilon zeta eta theta"
    return spark.createDataFrame(
        [(100, f"prefix {boiler} suffix words here")],
        "doc_id long, text string")


def _py_positions(gram: str, m_bits: int, n_hashes: int) -> list[int]:
    out = []
    for i in range(n_hashes):
        h = hashlib.md5(f"{D._BLOOM_SEED0 + i}:{gram}".encode()).hexdigest()
        out.append(int(h[:15], 16) % m_bits)
    return out


def test_bloom_build_sets_exactly_the_gram_positions(spark):
    bench = spark.createDataFrame(
        [(0, "a b c d e f g h")], "doc_id long, text string")
    m = 1 << 12
    words = D.bloom_filter_build(bench, m_bits=m, n_hashes=3)
    got = {w * 64 + b for w, word in enumerate(words)
           for b in range(64) if (word >> b) & 1}
    assert got == set(_py_positions("a b c d e f g h", m, 3))


def test_bloom_no_false_negatives_vs_exact(spark):
    docs, bench = _docs(spark), _bench(spark)
    exact = {r.doc_id: r.n_contaminated
             for r in D.contamination_hits(docs, bench).collect()}
    words = D.bloom_filter_build(bench, m_bits=1 << 16)
    bloom = {r.doc_id: r.n_flagged
             for r in D.bloom_contamination_hits(docs, words).collect()}
    assert exact, "fixture must actually share grams"
    for d, n in exact.items():
        assert bloom.get(d, 0) >= n
    assert {0, 2} <= set(bloom)


def test_bloom_decontaminate_is_conservative(spark):
    docs, bench = _docs(spark), _bench(spark)
    kept = {r.doc_id
            for r in D.bloom_decontaminate(docs, bench,
                                           m_bits=1 << 16).collect()}
    exact_hit = {r.doc_id
                 for r in D.contamination_hits(docs, bench).collect()}
    # kept docs never include a truly contaminated one
    assert kept & exact_hit == set()
    # at a sane m the clean docs survive (no FP in this tiny fixture)
    assert kept == {1, 3}


def test_bloom_counts_grams(spark):
    docs = _docs(spark)
    words = D.bloom_filter_build(_bench(spark), m_bits=1 << 16)
    rows = {r.doc_id: (r.n_grams, r.n_flagged)
            for r in D.bloom_contamination_hits(docs, words).collect()}
    # doc 0: 12 tokens → 5 8-gram shingles, 1 fully inside the boiler
    assert rows[0][0] == 5 and rows[0][1] >= 1


def test_bloom_rejects_bad_m():
    try:
        D.bloom_filter_build(None, m_bits=100)
    except ValueError:
        return
    raise AssertionError("expected ValueError")


def test_bloom_membership_is_scan_stage(spark):
    docs = _docs(spark)
    words = D.bloom_filter_build(_bench(spark), m_bits=1 << 12)
    plan = D.bloom_contamination_hits(docs, words) \
        ._jdf.queryExecution().executedPlan().toString()
    # one broadcast (the bit array), no sort-merge join, no cartesian
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan

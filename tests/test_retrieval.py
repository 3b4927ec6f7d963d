"""BM25 ranked retrieval + term postings (operators/retrieval.py)."""

import math

from pyspark.sql import functions as F

from themis_spark.operators import retrieval as R


def _docs(spark):
    rows = [
        (0, "spark join window join"),
        (1, "merge sort table sort sort"),
        (2, "spark window window merge"),
        (3, "the the the the the the"),
        (4, "join table"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(0, "spark join"), (1, "sort")],
        "query_id long, query string")


def _bm25_expected(corpus, qterms, k1=1.2, b=0.75):
    """Reference BM25 in plain python over a dict corpus."""
    tfs = {d: {} for d in corpus}
    for d, text in corpus.items():
        for t in text.split():
            tfs[d][t] = tfs[d].get(t, 0) + 1
    n = len(corpus)
    dls = {d: sum(tf.values()) for d, tf in tfs.items()}
    avgdl = sum(dls.values()) / n
    dfreq = {}
    for tf in tfs.values():
        for t in tf:
            dfreq[t] = dfreq.get(t, 0) + 1
    out = {}
    for d, tf in tfs.items():
        s = 0.0
        hit = False
        for t in qterms:
            if t not in tf:
                continue
            hit = True
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * (tf[t] * (k1 + 1)
                        / (tf[t] + k1 * (1 - b + b * dls[d] / avgdl)))
        if hit:
            out[d] = round(s, 6)
    return out


def test_bm25_scores_match_reference(spark):
    res = R.bm25_topk(_docs(spark), _queries(spark), k=10)
    rows = {(r.query_id, r.doc_id): (r.score, r.rank)
            for r in res.collect()}
    corpus = {r.doc_id: r.text for r in _docs(spark).collect()}
    exp0 = _bm25_expected(corpus, ["spark", "join"])
    exp1 = _bm25_expected(corpus, ["sort"])
    got0 = {d: s for (q, d), (s, _) in rows.items() if q == 0}
    got1 = {d: s for (q, d), (s, _) in rows.items() if q == 1}
    assert got0 == exp0
    assert got1 == exp1
    # only doc 1 contains 'sort'; it must be rank 1 and alone
    assert got1 == {1: exp1[1]}
    # ranks are 1..n contiguous per query, ordered by score desc
    r0 = sorted(((rk, d) for (q, d), (s, rk) in rows.items() if q == 0))
    assert [rk for rk, _ in r0] == list(range(1, len(r0) + 1))
    scores_in_rank_order = [rows[(0, d)][0] for _, d in r0]
    assert scores_in_rank_order == sorted(scores_in_rank_order, reverse=True)


def test_bm25_repeated_query_term_counts_once(spark):
    docs = _docs(spark)
    q1 = spark.createDataFrame([(0, "join")], "query_id long, query string")
    q2 = spark.createDataFrame([(0, "join join join")],
                               "query_id long, query string")
    a = {r.doc_id: r.score for r in R.bm25_topk(docs, q1, k=10).collect()}
    b = {r.doc_id: r.score for r in R.bm25_topk(docs, q2, k=10).collect()}
    assert a == b


def test_bm25_topk_truncates_and_tiebreaks(spark):
    # five docs all containing 'the' with identical tf/dl → identical
    # scores; tie-break must be ascending doc_id, k must truncate.
    rows = [(i, "the the the") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame([(0, "the")], "query_id long, query string")
    res = R.bm25_topk(docs, q, k=3).orderBy("rank").collect()
    assert [r.doc_id for r in res] == [0, 1, 2]
    assert len({r.score for r in res}) == 1


def test_bm25_query_side_broadcasts(spark):
    plan = R.bm25_topk(_docs(spark), _queries(spark), k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_term_postings(spark):
    res = R.term_postings(_docs(spark), ["JOIN", "sort"]).collect()
    got = {(r.token, r.doc_id): r.tf for r in res}
    assert got == {("join", 0): 2, ("join", 4): 1, ("sort", 1): 3}

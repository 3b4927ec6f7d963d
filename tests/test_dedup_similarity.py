"""Dedup + similarity operators on seeded data with planted duplicates."""

import pytest
from pyspark.sql import functions as F

from themis_spark.operators import dedup as D
from themis_spark.operators import similarity as S

DOCS = [
    # (doc_id, text) — 1/2 exact dups; 3/4 near-dups (1 word changed);
    # 5 shares nothing; 6/7 near via shared boilerplate tail
    (1, "the quick brown fox jumps over the lazy dog in the morning sun"),
    (2, "the quick brown fox jumps over the lazy dog in the morning sun"),
    (3, "spark engines shuffle data between executors during wide transformations every day"),
    (4, "spark engines shuffle data between executors during wide transformations every night"),
    (5, "completely different text about cooking pasta with garlic and olive oil"),
    (6, "unique preamble words here followed by common suffix tokens shared across documents"),
    (7, "another distinct opening phrase followed by common suffix tokens shared across documents"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_duplicates(spark, docs):
    groups = D.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["members"] == [1, 2] and groups[0]["keep_key"] == 1
    # normalization catches case/whitespace variants
    noisy = spark.createDataFrame(
        [(10, "Hello  World"), (11, "hello world"), (12, "other")], "doc_id long, text string"
    )
    g = D.exact_duplicates(noisy).collect()
    assert len(g) == 1 and g[0]["members"] == [10, 11]


def test_minhash_signatures_deterministic(spark, docs):
    a = D.minhash_signatures(docs, num_hashes=8).collect()
    b = D.minhash_signatures(docs.repartition(5), num_hashes=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_id = {r["doc_id"]: r for r in a}
    # identical docs → identical signatures
    assert tuple(by_id[1])[1:] == tuple(by_id[2])[1:]


def test_lsh_candidates_catch_planted_pairs(spark, docs):
    pairs = {(r["a_key"], r["b_key"]) for r in
             D.lsh_candidate_pairs(docs, num_hashes=12, bands=6).collect()}
    assert (1, 2) in pairs          # exact dup always collides
    assert (3, 4) in pairs          # near-dup should collide in ≥1 band
    assert (1, 5) not in pairs and (2, 5) not in pairs


def test_ngram_jaccard_exact(spark, docs):
    pairs = {(r["a_key"], r["b_key"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.5 < pairs[(3, 4)] < 1.0
    assert all(k[0] != 5 and k[1] != 5 for k in pairs)


def test_simhash_near_duplicates(spark, docs):
    sigs = {r["doc_id"]: r["sh"] for r in
            docs.select("doc_id", D.simhash_col(F.col("text"), 16).alias("sh")).collect()}
    assert sigs[1] == sigs[2]
    ham34 = bin(sigs[3] ^ sigs[4]).count("1")
    ham15 = bin(sigs[1] ^ sigs[5]).count("1")
    assert ham34 < ham15  # near-dup closer than unrelated
    pairs = {(r["a_key"], r["b_key"]) for r in
             D.simhash_near_duplicates(docs, bits=16, max_hamming=3).collect()}
    assert (1, 2) in pairs


def test_degenerate_bucket_caps_bound_pair_explosion(spark):
    """10k identical boilerplate docs share one LSH bucket per band; the
    cap drops those buckets BEFORE the self-join (O(b²) output otherwise
    — AQE splits join work, not output) and routes the group to exact
    dedup, which handles it in linear work (round-1 verdict item 5)."""
    n = 200
    rows = [(i, "identical boilerplate page text repeated endlessly on every page")
            for i in range(n)]
    rows += [(1000, "genuinely unique content about regional railway timetables"),
             (1001, "genuinely unique content about regional railway schedules")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = D.lsh_candidate_pairs(df, num_hashes=12, bands=6, max_bucket_size=16)
    capped_pairs = capped.collect()
    # boilerplate bucket dropped entirely; the near-dup pair survives
    assert all(r["a_key"] >= 1000 for r in capped_pairs)
    assert (1000, 1001) in {(r["a_key"], r["b_key"]) for r in capped_pairs}

    uncapped = D.lsh_candidate_pairs(df, num_hashes=12, bands=6,
                                     max_bucket_size=None).count()
    assert uncapped >= n * (n - 1) / 2, "sanity: uncapped explodes quadratically"

    # the dropped group is exact-dup territory — linear-work recovery
    g = D.exact_duplicates(df).collect()
    assert len(g) == 1 and g[0]["group_size"] == n

    # same guard on the SimHash block join
    sim = D.simhash_near_duplicates(df, bits=16, max_hamming=3,
                                    max_bucket_size=16).collect()
    assert all(r["a_key"] >= 1000 for r in sim)


def test_duplicate_input_keys_never_self_pair(spark):
    """Dirty input with the same key on multiple rows (the data a dedup
    engine actually ingests) must not emit (k, k) candidate pairs —
    the strict a < b contract of the oracle self-join."""
    rows = [(42, "the quick brown fox jumps over the lazy dog again today"),
            (42, "the quick brown fox jumps over the lazy dog again today"),
            (42, "the quick brown fox leaps over the lazy dog again today"),
            (7, "the quick brown fox jumps over the lazy dog again today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for pairs in (
        D.lsh_candidate_pairs(df, num_hashes=8, bands=4),
        D.simhash_near_duplicates(df, max_hamming=8),
        D.ngram_jaccard_pairs(df, threshold=0.1),
    ):
        got = pairs.select("a_key", "b_key").collect()
        assert all(r["a_key"] < r["b_key"] for r in got), got
        # the genuine cross-key duplicate is still found
        assert any({r["a_key"], r["b_key"]} == {7, 42} for r in got)


def test_jaccard_shingle_df_cap(spark, docs):
    # a shingle shared by >cap docs leaves the inverted index; remaining
    # (discriminative) shingles still pair near-dups 6/7 via their tail
    pairs = {(r["a_key"], r["b_key"]) for r in
             D.ngram_jaccard_pairs(docs, threshold=0.2, max_shingle_df=2).collect()}
    assert (6, 7) in pairs
    # with cap 1 every shared shingle is excluded → no pairs at all
    none = D.ngram_jaccard_pairs(docs, threshold=0.01, max_shingle_df=1).count()
    assert none == 0


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_cosine_topk_exact(spark, embeddings):
    queries = embeddings.where("vec_id < 3")
    topk = S.cosine_topk(embeddings, queries, k=5)
    rows = topk.collect()
    assert {r["query_key"] for r in rows} == {0, 1, 2}
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_key"], []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == 5
        ordered = sorted(rs, key=lambda r: r["rank"])
        cosines = [r["cosine"] for r in ordered]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_key"] != q for r in rs)


def test_lsh_ann_recall_against_exact(spark, embeddings):
    queries = embeddings.where("vec_id < 10")
    exact = S.cosine_topk(embeddings, queries, k=5)
    approx = S.lsh_ann_topk(embeddings, queries, k=5, n_planes=4)
    e = {(r["query_key"], r["neighbor_key"]) for r in exact.collect()}
    a = {(r["query_key"], r["neighbor_key"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall > 0.3, f"LSH recall collapsed: {recall}"
    # bucketed candidates must score identically to exact for shared pairs
    ec = {(r["query_key"], r["neighbor_key"]): r["cosine"] for r in exact.collect()}
    for r in approx.collect():
        k = (r["query_key"], r["neighbor_key"])
        if k in ec:
            assert abs(ec[k] - r["cosine"]) < 1e-9


def test_ivf_ann_recall_against_exact(spark, embeddings):
    queries = embeddings.where("vec_id < 10")
    exact = S.cosine_topk(embeddings, queries, k=5)
    cents = embeddings.where("vec_id < 8")
    approx = S.ivf_topk(embeddings, queries, k=5, centroids=cents, n_probe=3)
    e = {(r["query_key"], r["neighbor_key"]) for r in exact.collect()}
    a = {(r["query_key"], r["neighbor_key"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall > 0.3, f"IVF recall collapsed: {recall}"
    # in-cell candidates score with the exact kernel
    ec = {(r["query_key"], r["neighbor_key"]): r["cosine"] for r in exact.collect()}
    for r in approx.collect():
        key = (r["query_key"], r["neighbor_key"])
        if key in ec:
            assert abs(ec[key] - r["cosine"]) < 1e-9


def test_ivf_cell_assignment_deterministic(spark, embeddings):
    cents = S.collect_centroids(embeddings.where("vec_id < 8"))
    a = embeddings.select("vec_id", S.ivf_cell_col(F.col("embedding"), cents).alias("cell"))
    got = {r["vec_id"]: r["cell"] for r in a.collect()}
    again = {r["vec_id"]: r["cell"] for r in a.collect()}
    assert got == again
    assert set(got.values()) <= set(range(8))
    # every centroid vector lands in its own cell (sim=1 with itself)
    for i in range(8):
        assert got[i] == i


def test_ivf_training_converges_and_probes_cover(spark, embeddings):
    # iterated Lloyd centroids stay well-formed and the full probe set
    # (n_probe = n_cells) recovers the exact top-k (IVF is then lossless)
    cents = S.train_ivf_centroids(embeddings, n_cells=4, iters=2)
    assert len(cents) == 4 and all(len(c) == 64 for c in cents)
    queries = embeddings.where("vec_id < 3")
    exact = S.cosine_topk(embeddings, queries, k=5)
    full = S.ivf_topk(embeddings, queries, k=5, centroids=cents, n_probe=4)
    e = {(r["query_key"], r["neighbor_key"]) for r in exact.collect()}
    f = {(r["query_key"], r["neighbor_key"]) for r in full.collect()}
    assert e == f


def test_embedding_near_duplicates_planted(spark):
    import numpy as np
    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = [
        (1, [float(x) for x in base]),
        (2, [float(x) for x in base * 2.0]),            # same direction → cosine 1
        (3, [float(x) for x in base + rng.standard_normal(16) * 0.01]),  # tiny noise
        (4, [float(x) for x in rng.standard_normal(16)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["a_key"], r["b_key"]) for r in
             S.embedding_near_duplicates(df, threshold=0.98, n_planes=4).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_duplicate_clusters_transitive(spark):
    # a~b, b~c chain must merge into one cluster labeled by the min key;
    # d~e stays separate; isolated nodes (no pairs) don't appear
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 5), (9, 8)], "a_key long, b_key long")
    got = {(r["member"], r["cluster"])
           for r in D.duplicate_clusters(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (8, 8), (9, 8)}


def test_duplicate_clusters_long_chain_converges(spark):
    # a 12-hop chain needs multiple propagation rounds
    chain = [(i, i + 1) for i in range(12)]
    pairs = spark.createDataFrame(chain, "a_key long, b_key long")
    got = D.duplicate_clusters(pairs).collect()
    assert {r["cluster"] for r in got} == {0}
    assert len(got) == 13


# ------------------------------------------------------- cross-corpus dedup

def test_cross_corpus_duplicates_finds_near_dup(spark):
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the river runs past the old mill every single day")
    left = spark.createDataFrame(
        [(1, base), (2, "completely unrelated words about database engines "
                        "and distributed shuffles with columnar formats")],
        "doc_id long, text string")
    right = spark.createDataFrame(
        [(10, base + " extra"), (11, "other corpus text entirely different "
                                     "topic cooking recipes and baking bread")],
        "doc_id long, text string")
    from themis_spark.operators.dedup import cross_corpus_duplicates

    got = cross_corpus_duplicates(left, right, num_hashes=12, bands=6,
                                  threshold=0.3).collect()
    assert {(r["a_key"], r["b_key"]) for r in got} == {(1, 10)}
    assert all(0 <= r["est_jaccard"] <= 1 for r in got)


def test_cross_corpus_never_pairs_within_a_side(spark):
    # identical docs on the SAME side must not pair with each other
    txt = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lambda mu nu xi omicron pi rho sigma tau upsilon")
    left = spark.createDataFrame([(1, txt), (2, txt)], "doc_id long, text string")
    right = spark.createDataFrame([(9, "nothing in common here at all "
                                       "with the left corpus documents")],
                                  "doc_id long, text string")
    from themis_spark.operators.dedup import cross_corpus_duplicates

    got = cross_corpus_duplicates(left, right, num_hashes=12, bands=6,
                                  threshold=0.1).collect()
    assert got == []


def test_dedup_against_filters_matches(spark):
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the river runs past the old mill every single day")
    left = spark.createDataFrame(
        [(1, base), (2, "fresh unique content with no counterpart in the "
                        "reference corpus so it must survive the filter")],
        "doc_id long, text string")
    right = spark.createDataFrame([(10, base)], "doc_id long, text string")
    from themis_spark.operators.dedup import dedup_against

    kept = [r["doc_id"] for r in
            dedup_against(left, right, num_hashes=12, bands=6,
                          threshold=0.3).collect()]
    assert kept == [2]


def test_cross_corpus_single_bucket_exchange(spark):
    left = spark.createDataFrame([(1, "a b c d e f g h i j")],
                                 "doc_id long, text string")
    right = spark.createDataFrame([(2, "a b c d e f g h i j")],
                                  "doc_id long, text string")
    from themis_spark.operators.dedup import cross_corpus_duplicates

    plan = (cross_corpus_duplicates(left, right)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" not in plan and "BatchEvalPython" not in plan


# --------------------------------------------------------- embedding audit

def test_centroid_components_and_array(spark):
    from themis_spark.operators.similarity import (
        centroid_components, group_centroids,
    )
    df = spark.createDataFrame(
        [(1, "a", [1.0, 0.0]), (2, "a", [3.0, 2.0]), (3, "b", [0.0, 4.0]),
         (4, None, [9.0, 9.0]), (5, "b", None)],
        "vec_id long, label string, embedding array<float>")
    comp = {(r["label"], r["pos"]): (r["m"], r["n"])
            for r in centroid_components(df).collect()}
    assert comp[("a", 0)] == (2.0, 2) and comp[("a", 1)] == (1.0, 2)
    assert comp[("b", 0)] == (0.0, 1) and comp[("b", 1)] == (4.0, 1)
    cents = {r["label"]: (list(r["centroid"]), r["n"])
             for r in group_centroids(df).collect()}
    assert cents["a"] == ([2.0, 1.0], 2)
    assert cents["b"] == ([0.0, 4.0], 1)


def test_centroid_cosine_stats(spark):
    from themis_spark.operators.similarity import centroid_cosine_stats
    # tight group: identical directions -> mean_cos = 1; loose group:
    # orthogonal pair -> cos(v, centroid) = cos45 = ~0.7071 each
    df = spark.createDataFrame(
        [(1, "tight", [1.0, 0.0]), (2, "tight", [2.0, 0.0]),
         (3, "loose", [1.0, 0.0]), (4, "loose", [0.0, 1.0])],
        "vec_id long, label string, embedding array<float>")
    got = {r["label"]: r for r in centroid_cosine_stats(df).collect()}
    assert got["tight"]["mean_cos"] == 1.0 and got["tight"]["n"] == 2
    assert abs(got["loose"]["mean_cos"] - 0.707107) < 1e-6
    assert got["loose"]["min_cos"] == got["loose"]["mean_cos"]


def test_centroid_stats_broadcast_no_python(spark):
    from themis_spark.operators.similarity import centroid_cosine_stats
    df = spark.createDataFrame(
        [(i, f"l{i % 3}", [float(i), 1.0]) for i in range(30)],
        "vec_id long, label string, embedding array<float>")
    plan = (centroid_cosine_stats(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "SortMergeJoin" not in plan


# ------------------------------------------------------------ containment

def test_containment_catches_quote_jaccard_misses(spark):
    quote = "the quick brown fox jumps over the lazy dog tonight"
    page = quote + " " + " ".join(f"filler{i} word{i} extra{i}" for i in range(40))
    df = spark.createDataFrame([(1, quote), (2, page)],
                               "doc_id long, text string")
    from themis_spark.operators.dedup import (
        ngram_containment_pairs, ngram_jaccard_pairs,
    )

    cont = ngram_containment_pairs(df, threshold=0.9).collect()
    assert len(cont) == 1 and cont[0]["a_key"] == 1 and cont[0]["b_key"] == 2
    assert cont[0]["containment"] >= 0.9
    # symmetric Jaccard misses the same pair at any reasonable threshold
    jac = ngram_jaccard_pairs(df, threshold=0.3).collect()
    assert jac == []


def test_containment_threshold_filters(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z w v u")], "doc_id long, text string")
    from themis_spark.operators.dedup import ngram_containment_pairs

    assert ngram_containment_pairs(df, threshold=0.1).collect() == []


def test_recall_at_k_counts_overlap(spark):
    from themis_spark.operators.similarity import recall_at_k

    ref = spark.createDataFrame(
        [(1, n, r) for r, n in enumerate([10, 11, 12], 1)]
        + [(2, n, r) for r, n in enumerate([20, 21], 1)],
        "query_key long, neighbor_key long, rank long")
    cand = spark.createDataFrame(
        # query 1: hits 10, 12 within k; 99 is noise; query 2: misses all
        [(1, 10, 1), (1, 99, 2), (1, 12, 3), (2, 77, 1), (2, 78, 2)],
        "query_key long, neighbor_key long, rank long")
    out = {r["query_key"]: r for r in recall_at_k(ref, cand, k=3).collect()}
    assert out[1]["n_ref"] == 3 and out[1]["n_hit"] == 2
    assert abs(out[1]["recall"] - 2 / 3) < 1e-6
    assert out[2]["n_ref"] == 2 and out[2]["n_hit"] == 0 and out[2]["recall"] == 0.0
    # rank > k rows in either frame are ignored
    out2 = {r["query_key"]: r for r in recall_at_k(ref, cand, k=1).collect()}
    assert out2[1]["n_ref"] == 1 and out2[1]["n_hit"] == 1

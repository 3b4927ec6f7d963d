"""Round-2 late additions: sequence packing, SemDeDup-style semantic
dedup, hashed-linear classifier inference, crawl-snapshot consolidation."""

import math

import pytest
from pyspark.sql import functions as F

from themis_spark.operators.similarity import semantic_duplicates, semdedup_keep
from themis_spark.operators.stats import pack_offsets, pack_summary
from themis_spark.operators.text import classifier_scores, hashed_weights
from themis_spark.operators.web import latest_revisions


# --------------------------------------------------------- sequence packing

def _docs(spark, toks):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long")


def test_pack_offsets_single_stream_layout(spark):
    # one bucket -> a single concat stream ordered by key
    df = _docs(spark, [100, 50, 2000, 0, 148])
    out = {r["doc_id"]: r for r in
           pack_offsets(df, ctx_len=256, buckets=1).collect()}
    assert out[0]["start_tok"] == 0 and out[0]["first_chunk"] == 0
    assert out[0]["n_chunks"] == 1
    assert out[1]["start_tok"] == 100
    # doc 2 starts at 150, ends at 2149 -> chunks 0..8 = 9 chunks
    assert out[2]["start_tok"] == 150
    assert out[2]["first_chunk"] == 0 and out[2]["n_chunks"] == 9
    # zero-token doc occupies nothing
    assert out[3]["n_chunks"] == 0 and out[3]["first_chunk"] is None
    assert out[4]["start_tok"] == 2150


def test_pack_offsets_exact_boundary_no_span(spark):
    # a doc ending exactly on a chunk boundary must not claim the next chunk
    df = _docs(spark, [256, 256])
    out = {r["doc_id"]: r for r in
           pack_offsets(df, ctx_len=256, buckets=1).collect()}
    assert out[0]["n_chunks"] == 1 and out[1]["first_chunk"] == 1


def test_pack_offsets_streams_are_independent(spark):
    df = _docs(spark, [10] * 200)
    out = pack_offsets(df, ctx_len=64, buckets=8).collect()
    # per-bucket starts are dense: within each bucket sorted by key the
    # offsets are a prefix sum of the tokens
    by_bucket = {}
    for r in sorted(out, key=lambda r: (r["bucket"], r["doc_id"])):
        assert r["start_tok"] == by_bucket.get(r["bucket"], 0)
        by_bucket[r["bucket"]] = r["start_tok"] + r["n_tokens"]


def test_pack_summary_matches_offsets(spark):
    df = _docs(spark, [100, 50, 2000, 0, 148, 300, 17])
    summ = {r["bucket"]: r for r in
            pack_summary(df, ctx_len=256, buckets=4).collect()}
    per = pack_offsets(df, ctx_len=256, buckets=4).collect()
    totals = {}
    for r in per:
        totals[r["bucket"]] = totals.get(r["bucket"], 0) + r["n_tokens"]
    for b, tot in totals.items():
        s = summ[b]
        assert s["total_tokens"] == tot
        assert s["n_chunks"] == -(-tot // 256) if tot else s["n_chunks"] == 0
        assert s["tail_waste_tokens"] == s["n_chunks"] * 256 - tot


# ----------------------------------------------------------- semantic dedup

def _emb(spark):
    # two tight semantic clusters + one outlier; ids chosen so keep-first
    # is observable
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.01, 0.999, 0.0]),   # near-dup of 2
        (4, [0.6, 0.6, 0.5]),      # outlier, alone in its region
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_duplicates_finds_in_cell_pairs(spark):
    df = _emb(spark)
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    pairs = semantic_duplicates(df, centroids=cents, threshold=0.99).collect()
    got = {(r["a_key"], r["b_key"]) for r in pairs}
    assert (0, 1) in got and (2, 3) in got
    assert all(a < b for a, b in got)
    # the outlier never pairs at this threshold
    assert not any(4 in p for p in got)


def test_semdedup_keep_drops_higher_key(spark):
    df = _emb(spark)
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    keep = {r["vec_id"]: r["keep"] for r in
            semdedup_keep(df, centroids=cents, threshold=0.99).collect()}
    assert keep == {0: True, 1: False, 2: True, 3: False, 4: True}


def test_semantic_duplicates_max_cell_guard(spark):
    # 50 identical vectors in one cell: uncapped -> 1225 pairs; the cap
    # drops the degenerate cell entirely (exact-dup territory)
    rows = [(i, [1.0, 0.0]) for i in range(50)] + [(100, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    assert semantic_duplicates(df, centroids=cents).count() == 1225
    assert semantic_duplicates(df, centroids=cents, max_cell=10).count() == 0


# ------------------------------------------------------ hashed classifier

def test_classifier_scores_exact_fold(spark):
    w = hashed_weights(64)
    df = spark.createDataFrame(
        [(1, "Good  clean sentence"), (2, ""), (3, None), (4, "x")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in classifier_scores(
        df, weights=w, bias=0.25).collect()}
    assert 3 not in out  # null text filtered like every text op
    # replicate the fold in Python: md5-60bit hash mod dim
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    toks = ["good", "clean", "sentence"]
    mean = sum(w[h60(t) % 64] for t in toks) / 3
    assert out[1]["n_tokens"] == 3
    assert out[1]["logit"] == pytest.approx(round(0.25 + mean, 6), abs=1e-9)
    assert out[1]["label"] == ((0.25 + mean) > 0)
    assert out[1]["score"] == pytest.approx(
        round(1 / (1 + math.exp(-(0.25 + mean))), 6), abs=1e-6)
    # zero-token doc scores the bias alone
    assert out[2]["n_tokens"] == 0 and out[2]["logit"] == 0.25


def test_hashed_weights_are_dyadic(spark):
    # exact binary fractions: scaling by 1024 must give integers
    for w in hashed_weights(128):
        assert w * 1024 == int(w * 1024)


def test_classifier_plan_is_native(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = classifier_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------- crawl-snapshot consolidation

def test_latest_revisions_picks_newest_per_canonical(spark):
    rows = [
        (1, "https://A.example.com/p?utm_source=x", "2024-01-01 00:00:00"),
        (2, "https://a.example.com/p", "2024-03-01 00:00:00"),   # newest
        (3, "https://a.example.com/p/", "2024-02-01 00:00:00"),
        (4, "https://other.example.com/q", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, fetched_at string") \
        .withColumn("fetched_at", F.to_timestamp("fetched_at"))
    out = {r["canonical_url"]: r for r in
           latest_revisions(df, key="doc_id").collect()}
    assert out["https://a.example.com/p"]["doc_id"] == 2
    assert out["https://a.example.com/p"]["n_revisions"] == 3
    assert out["https://other.example.com/q"]["n_revisions"] == 1


def test_latest_revisions_tie_breaks_on_key(spark):
    rows = [(9, "http://t.example.com/x", "2024-01-01 00:00:00"),
            (5, "http://t.example.com/x", "2024-01-01 00:00:00")]
    df = spark.createDataFrame(rows, "doc_id long, url string, fetched_at string") \
        .withColumn("fetched_at", F.to_timestamp("fetched_at"))
    got = latest_revisions(df, key="doc_id").collect()
    assert len(got) == 1 and got[0]["doc_id"] == 5


# ---------------------------------------------------------------- pagerank

def test_pagerank_hand_computed_chain(spark):
    from themis_spark.operators.web import pagerank

    # a -> b -> c: exact fixed-point arithmetic, hand-checked
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string")
    r1 = {r["node"]: r["rank"] for r in pagerank(edges, iters=1).collect()}
    base = (10**6 * 15) // 100
    contrib = (10**6 * 85) // 100  # outdeg 1
    assert r1 == {"a": base, "b": base + contrib, "c": base + contrib}
    r2 = {r["node"]: r["rank"] for r in pagerank(edges, iters=2).collect()}
    assert r2["a"] == base
    assert r2["b"] == base + (base * 85) // 100           # from a's new rank
    assert r2["c"] == base + ((base + contrib) * 85) // 100


def test_pagerank_split_outdegree(spark):
    from themis_spark.operators.web import pagerank

    # hub splits over two targets: floor(rank*85/(100*2)) each
    edges = spark.createDataFrame(
        [("h", "x"), ("h", "y")], "src string, dst string")
    r = {r["node"]: r["rank"] for r in pagerank(edges, iters=1).collect()}
    base = (10**6 * 15) // 100
    per = (10**6 * 85) // (100 * 2)
    assert r["x"] == base + per and r["y"] == base + per


def test_pagerank_is_integer_and_deterministic(spark):
    from themis_spark.operators.web import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 50) for i in range(50)]
        + [(i, (i * 7 + 1) % 50) for i in range(50)],
        "src long, dst long")
    a = sorted(pagerank(edges, iters=3).collect())
    b = sorted(pagerank(edges.repartition(7), iters=3).collect())
    assert a == b  # partitioning-insensitive by integer construction


# ---------------------------------------------------------------- blocklist

def test_blocklist_filter_host_and_path(spark):
    from themis_spark.operators.web import blocklist_filter

    rows = [
        (1, "https://ads.example.com/x"),          # exact host
        (2, "https://sub.ads.example.com/x"),      # subdomain of blocked
        (3, "https://bads.example.com/x"),         # NOT blocked (label boundary)
        (4, "https://ok.example.com/tracker/pixel"),  # path prefix
        (5, "https://ok.example.com/fine"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r["blocked"] for r in blocklist_filter(
        df, host_suffixes=["ads.example.com"],
        path_prefixes=["/tracker/"]).collect()}
    assert out == {1: True, 2: True, 3: False, 4: True, 5: False}
    kept = blocklist_filter(
        df, host_suffixes=["ads.example.com"], path_prefixes=["/tracker/"],
        mode="drop").count()
    assert kept == 2


def test_blocklist_null_url_is_not_blocked(spark):
    from themis_spark.operators.web import blocklist_filter

    df = spark.createDataFrame(
        [(1, None), (2, "https://ads.example.com/x")], "doc_id long, url string")
    out = {r["doc_id"]: r["blocked"] for r in blocklist_filter(
        df, host_suffixes=["ads.example.com"]).collect()}
    assert out == {1: False, 2: True}  # boolean, never NULL


def test_blocklist_is_host_case_insensitive(spark):
    # RFC 4343: hostnames are case-insensitive; mixed-case hosts and
    # uppercase schemes must not evade the blocklist
    from themis_spark.operators.web import blocklist_filter

    rows = [(1, "https://Ads.Example.com/x"),
            (2, "HTTPS://ADS.EXAMPLE.COM/x"),
            (3, "https://sub.ADS.example.COM/x"),
            (4, "https://ok.example.com/T/p"),   # path stays case-SENSITIVE
            (5, "https://ok.example.com/t/p")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r["blocked"] for r in blocklist_filter(
        df, host_suffixes=["ads.example.com"],
        path_prefixes=["/t/"]).collect()}
    assert out == {1: True, 2: True, 3: True, 4: False, 5: True}


def test_compression_ratio_signal(spark):
    import zlib

    from themis_spark.operators.text import with_compression_ratio

    rows = [(1, "abc " * 500),            # template spam: compresses hard
            (2, "the quick brown fox jumped over one lazy dog near a "
                "river while gulls wheeled overhead in the cold wind"),
            (3, None), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_compression_ratio(df).collect()}
    assert out[1]["ratio"] < 0.05
    assert out[2]["ratio"] > 0.5
    assert out[3]["ratio"] is None and out[4]["ratio"] is None
    # exact replay of the batch kernel
    t = rows[1][1].encode()
    assert out[2]["ratio"] == round(len(zlib.compress(t, 6)) / len(t), 6)
    assert out[2]["n_bytes"] == len(t)
    # input columns pass through
    assert out[1]["text"].startswith("abc")


# -------------------------------------------------------------------- BPE

def _py_bpe(word, merges):
    s = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b); i += 2
            else:
                out.append(s[i]); i += 1
        s = out
    return s


def test_bpe_train_learns_frequent_pairs(spark):
    from themis_spark.operators.text import train_bpe_merges

    df = spark.createDataFrame(
        [(i, "the then there " * 5) for i in range(4)],
        "doc_id long, text string")
    merges = train_bpe_merges(df, n_merges=3, sample_docs=10)
    assert len(merges) == 3
    # t-h and h-e tie at 3 occurrences/word-set; lexicographic tie-break
    # picks (h, e); the next round then merges t with he
    assert merges[0] == ("h", "e")
    assert merges[1] == ("t", "he")


def test_bpe_tokenize_matches_python_reference(spark):
    from themis_spark.operators.text import bpe_tokenize_col

    merges = [("t", "h"), ("th", "e"), ("e", "r"), ("i", "n")]
    texts = ["The weather in winter", "thin thread", "", "x", "er er er"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["toks"] for r in df.select(
        "doc_id", bpe_tokenize_col("text", merges).alias("toks")).collect()}
    for i, t in enumerate(texts):
        expect = [tok for w in t.lower().split() for tok in _py_bpe(w, merges)]
        assert got[i] == expect, (t, got[i], expect)


def test_bpe_adjacent_merges_chain(spark):
    from themis_spark.operators.text import bpe_tokenize_col

    # "aaaa" under merge (a,a): greedy left-to-right -> [aa, aa]
    df = spark.createDataFrame([(1, "aaaa aaa")], "doc_id long, text string")
    got = df.select(bpe_tokenize_col("text", [("a", "a")]).alias("t")).collect()[0]["t"]
    assert got == ["aa", "aa", "aa", "a"]

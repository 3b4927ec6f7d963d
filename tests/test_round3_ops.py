"""Round-3 fixes: default-on scale guards (SemDeDup cell cap, pagerank
lineage truncation), distributed rank_buckets behavior, NULL-token
packing, and dispatch-table edge cases (VERDICT r2 items 1–2 + ADVICE)."""

import pytest
from pyspark.sql import functions as F


def test_semdedup_cap_defaults_on(spark):
    from themis_spark.operators.similarity import (
        oversized_cells,
        semantic_duplicates,
    )

    # a degenerate quantizer: every vector lands in one cell. Default
    # max_cell=256 must bound the pair front to zero pairs (cell
    # dropped), NOT explode quadratically.
    df = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0).cast("float"), F.lit(0.0).cast("float"))
        .alias("embedding"))
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    assert semantic_duplicates(df, centroids=cents, threshold=0.0).count() == 0
    # the audit names the dropped cell with its size
    dropped = oversized_cells(df, centroids=cents).collect()
    assert len(dropped) == 1 and dropped[0]["n_vectors"] == 300
    # explicit opt-out restores the quadratic exact form
    n = semantic_duplicates(df, centroids=cents, threshold=0.0,
                            max_cell=None).count()
    assert n == 300 * 299 // 2


def test_semdedup_keep_cap_default(spark):
    from themis_spark.operators.similarity import semdedup_keep

    df = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0).cast("float"), F.lit(0.0).cast("float"))
        .alias("embedding"))
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    out = semdedup_keep(df, centroids=cents, threshold=0.0)
    # dropped oversized cell -> no pairs -> every row keeps
    assert out.where(~F.col("keep")).count() == 0
    assert out.count() == 300


def test_pagerank_deep_iters_checkpointed(spark):
    from themis_spark.operators.web import pagerank

    # iters=12 without lineage truncation explodes plan depth; with the
    # in-loop localCheckpoint it completes and stays bit-exact: ranks
    # converge to the analytic 2-cycle fixed point (a <-> b at scale).
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "a")], "src string, dst string")
    got = {r["node"]: r["rank"]
           for r in pagerank(edges, iters=12).collect()}
    # c has no in-links: base only
    assert got["c"] == 150_000
    # replay the integer recurrence in python for exactness
    rank = {"a": 10**6, "b": 10**6, "c": 10**6}
    deg = {"a": 1, "b": 1, "c": 1}
    for _ in range(12):
        contrib = {"b": rank["a"] * 85 // (100 * deg["a"]),
                   "a": rank["b"] * 85 // (100 * deg["b"])
                   + rank["c"] * 85 // (100 * deg["c"])}
        rank = {n: 150_000 + contrib.get(n, 0) for n in rank}
    assert got == rank


def test_rank_buckets_distributed_matches_ntile(spark):
    from themis_spark.operators.stats import rank_buckets

    # ties on the ranked column + a remainder that exercises both the
    # head (base+1-sized) and tail (base-sized) bucket arithmetic
    df = spark.range(103).select(
        F.col("id").alias("doc_id"), (F.col("id") % 11).alias("score"))
    out = {r["doc_id"]: r["bucket"]
           for r in rank_buckets(df, "score", n=7, partitions=8).collect()}
    order = sorted(range(103), key=lambda i: (i % 11, i))
    base, rem = 103 // 7, 103 % 7
    expect = {}
    for r0, doc in enumerate(order):
        if r0 < rem * (base + 1):
            expect[doc] = 1 + r0 // (base + 1)
        else:
            expect[doc] = 1 + rem + (r0 - rem * (base + 1)) // base
    assert out == expect


def test_rank_buckets_fewer_rows_than_buckets(spark):
    from themis_spark.operators.stats import rank_buckets

    df = spark.range(3).select(
        F.col("id").alias("doc_id"), F.col("id").alias("score"))
    got = sorted((r["score"], r["bucket"])
                 for r in rank_buckets(df, "score", n=10).collect())
    assert got == [(0, 1), (1, 2), (2, 3)]


def test_pack_offsets_null_tokens_pack_as_zero(spark):
    from themis_spark.operators.stats import pack_offsets, pack_summary

    df = spark.createDataFrame(
        [("a", 5), ("b", None), ("c", 7)],
        "doc_id string, n_tokens int")
    rows = {r["doc_id"]: r for r in
            pack_offsets(df, ctx_len=4, buckets=1).collect()}
    assert rows["b"]["n_tokens"] == 0 and rows["b"]["n_chunks"] == 0
    # the NULL row occupies no slot: total tokens = 12 regardless
    summ = pack_summary(df, ctx_len=4, buckets=1).collect()[0]
    assert summ["total_tokens"] == 12 and summ["n_docs"] == 3


def test_dispatch_no_registered_schemas(spark):
    from themis_spark.api import Validator

    # ADVICE r2: an empty registry used to IndexError on parts[0];
    # now every row surfaces as the synthetic $dispatch triple
    v = Validator({}, "none", {}, registry=None)
    df = spark.createDataFrame(
        [("u1", "nope"), ("u2", None)], "url string, schema_id string")
    out = v.validate_table_dispatch(df).collect()
    assert sorted(r["keyword"] for r in out) == ["$dispatch", "$dispatch"]


def test_dispatch_uncompilable_branch_degrades_per_row(spark):
    from themis_spark.api import Validator

    # a registered schema that cannot compile against this frame
    # (unresolvable $ref) must not fail the whole call: its rows get a
    # synthetic ($schema, $, $) triple; other branches validate normally
    bad = {"id": "bad", "type": "object",
           "properties": {"n": {"$ref": "#/definitions/missing"}}}
    v = Validator({}, "bad", {"bad": bad}, registry=None)
    df = spark.createDataFrame(
        [("u1", 1, "bad"), ("u2", 1, "mystery")],
        "url string, n long, schema_id string")
    got = {r["url"]: (r["keyword"], r["schema_id"])
           for r in v.validate_table_dispatch(df).collect()}
    assert got["u1"] == ("$schema", "bad")
    assert got["u2"] == ("$dispatch", "mystery")


def _bpe_ref_apply(word, merges):
    # brute-force sequential reference: every merge in order, one
    # left-to-right non-overlapping pass each (the chained-replace
    # semantics of bpe_tokenize_col, without any skipping cleverness)
    seq = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def _synthetic_merges(n=5000):
    # applying merges (doubling runs per letter + cross pairs)
    # interleaved with filler pairs over symbols that never occur —
    # a production list's shape: most merges don't apply to any given word
    applying = []
    for ch in "abcdefgh":
        tok = ch
        for _ in range(6):
            applying.append((tok, tok))
            tok = tok + tok
    for x, y in [("a", "b"), ("ab", "cd"), ("c", "d"), ("e", "f"),
                 ("ef", "g"), ("abcd", "efg"), ("h", "a"), ("ha", "ha")]:
        applying.append((x, y))
    merges, ai = [], 0
    for i in range(n):
        if i % 90 == 0 and ai < len(applying):
            merges.append(applying[ai])
            ai += 1
        else:
            merges.append((f"Z{i}", f"Q{i}"))  # never-present symbols
    return merges


def test_bpe_arrow_parity_5k_merges(spark):
    from themis_spark.operators.text import bpe_tokenize_arrow

    merges = _synthetic_merges(5000)
    words = ["a" * 13, "abab", "abcdefg", "hahaha", "b" * 9 + "a" * 4,
             "cdcdcd", "efefg", "aabbccdd", "h" * 7, "abcdefgabcdefg"]
    docs = [" ".join(words[i:] + words[:i]) for i in range(len(words))]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = {r["doc_id"]: list(r["tokens"])
           for r in bpe_tokenize_arrow(df, merges).collect()}
    for i, t in enumerate(docs):
        expect = [tok for w in t.lower().split()
                  for tok in _bpe_ref_apply(w, merges)]
        assert got[i] == expect, f"doc {i}"


def test_bpe_arrow_parity_with_native_path(spark):
    from themis_spark.operators.text import (
        bpe_tokenize_arrow,
        bpe_tokenize_col,
        train_bpe_merges,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = train_bpe_merges(df, n_merges=60, sample_docs=100)
    assert len(merges) == 60
    native = {r["doc_id"]: list(r["t"]) for r in df.select(
        "doc_id", bpe_tokenize_col("text", merges).alias("t")).collect()}
    arrow = {r["doc_id"]: list(r["tokens"])
             for r in bpe_tokenize_arrow(df, merges).collect()}
    assert native == arrow


def test_bpe_arrow_null_text_and_plan_shape(spark):
    from themis_spark.operators.text import bpe_tokenize_arrow

    df = spark.createDataFrame(
        [(1, "the thing"), (2, None)], "doc_id long, text string")
    out = bpe_tokenize_arrow(df, [("t", "h"), ("th", "e")])
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["n_bpe_tokens"] == 0 and list(rows[2]["tokens"]) == []
    assert rows[1]["tokens"][0] == "the"
    # pure map stage: no exchange; Python only as the declared Arrow kernel
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # no per-row python


def test_classifier_join_parity_and_64k_dims(spark):
    from themis_spark.operators.text import (
        classifier_scores,
        classifier_scores_join,
        hashed_weights,
        weights_table,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "   "), (3, None),
         (4, "jumps over the lazy dog " * 40)],
        "doc_id long, text string")
    # bit-exact parity with the literal path at the literal-regime dim
    lit = {r["doc_id"]: r.asDict() for r in classifier_scores(
        df, weights=hashed_weights(1024), bias=0.5).collect()}
    jn = {r["doc_id"]: r.asDict() for r in classifier_scores_join(
        df, weights_table(spark, 1024), dim=1024, bias=0.5).collect()}
    assert lit == jn

    # 64k dims: far past the array-literal codegen bound — must plan a
    # broadcast hash join and execute without codegen failure
    big = classifier_scores_join(df, weights_table(spark, 65536), dim=65536)
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    rows = {r["doc_id"]: r for r in big.collect()}
    assert rows[1]["n_tokens"] == 4 and rows[2]["n_tokens"] == 0
    # sparse model: absent hashes contribute 0 -> empty weights = bias only
    empty_w = spark.createDataFrame([], "feature_hash long, weight double")
    z = classifier_scores_join(df, empty_w, dim=65536, bias=0.25).collect()
    assert all(r["logit"] == 0.25 for r in z)


def test_language_id_join_model_path(spark):
    from themis_spark.operators.text import (
        language_id_col,
        language_id_join,
        language_model_table,
    )

    df = spark.createDataFrame(
        [(1, "the cat of the house is that it was for"),  # en-heavy
         (2, "der hund und die katze von dem haus"),      # de-heavy
         (3, "zzz qqq xxx"),                              # no model hits
         (4, None),                                       # NULL text
         (5, "le chien et la maison de les des")],        # fr-heavy
        "doc_id long, text string")
    model = language_model_table(spark)
    out = {r.doc_id: r for r in language_id_join(df, model).collect()}
    assert len(out) == 5  # frame-complete: every input row scored
    assert out[1].lang == "en" and out[1].score > 0
    assert out[2].lang == "de"
    assert out[5].lang == "fr"
    # unmatched and NULL docs get the default with zero score
    assert out[3].lang == "und" and out[3].score == 0.0
    assert out[4].lang == "und" and out[4].score == 0.0

    # the model never shuffles the corpus: broadcast join, no Python
    plan = language_id_join(df, model)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan

    # distinct=True + unit weights reproduces the stopword heuristic's
    # winner on tie-free docs (same argmax over distinct-token hits)
    unit = model.select("token", "lang", F.lit(1.0).alias("weight"))
    joined = {r.doc_id: r.lang for r in
              language_id_join(df, unit, distinct=True).collect()}
    heur = {r.doc_id: r.h for r in df.select(
        "doc_id", language_id_col("text").alias("h")).collect()}
    for k in (1, 2, 3, 4, 5):
        assert joined[k] == heur[k], (k, joined[k], heur[k])


def test_bigram_logprob_exact_counts(spark):
    import math

    from themis_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "solo"), (4, None)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_logprob(df).collect()}
    assert len(out) == 4
    # corpus bigram counts: (a,b)=3 (b,a)=1 (b,c)=1; prefix counts a=3 b=2
    assert out[1].n_bigrams == 3
    assert out[1].mean_logprob == round(math.log(0.5) / 3, 6)
    assert out[2].n_bigrams == 2
    assert out[2].mean_logprob == round(math.log(0.5) / 2, 6)
    # <2 tokens and NULL text both yield the (0, 0.0) default
    assert (out[3].n_bigrams, out[3].mean_logprob) == (0, 0.0)
    assert (out[4].n_bigrams, out[4].mean_logprob) == (0, 0.0)
    # zero Python in the plan
    plan = bigram_logprob(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_snapshot_diff_statuses_and_single_exchange(spark):
    from themis_spark.operators.web import snapshot_diff

    old = spark.createDataFrame(
        [(1, 11), (2, 22), (3, 33)], "url long, content_digest long")
    new = spark.createDataFrame(
        [(2, 22), (3, 99), (4, 44)], "url long, content_digest long")
    out = {r.url: r for r in snapshot_diff(old, new, key="url").collect()}
    assert out[1].status == "removed" and out[1].new_digest is None
    assert out[2].status == "unchanged"
    assert out[3].status == "changed" and (out[3].old_digest,
                                           out[3].new_digest) == (33, 99)
    assert out[4].status == "added" and out[4].old_digest is None

    # union-tag shape: exactly ONE shuffle exchange, no join operator
    plan = snapshot_diff(old, new, key="url")._jdf.queryExecution() \
        .executedPlan().toString()
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "Join" not in plan, plan


def test_monotonic_violations_directions(spark):
    from themis_spark.operators.constraints import monotonic_violations

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 12.0), (1, 3, 8.0),   # drop at seq 3
         (2, 1, 5.0), (2, 2, 5.0),                  # flat: ok for non_dec
         (3, 1, None), (3, 2, 4.0), (3, 3, None)],  # NULLs never violate
        "k long, seq long, v double")
    out = monotonic_violations(df, "k", "seq", "v").collect()
    assert [(r.k, r.seq, r.prev_value, r.value) for r in out] == [(1, 3, 12.0, 8.0)]

    strict = monotonic_violations(df, "k", "seq", "v",
                                  direction="strictly_increasing").collect()
    assert {(r.k, r.seq) for r in strict} == {(1, 3), (2, 2)}

    import pytest as _pt
    with _pt.raises(ValueError):
        monotonic_violations(df, "k", "seq", "v", direction="sideways")

    plan = monotonic_violations(df, "k", "seq", "v")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_extract_links_and_host_graph(spark):
    from themis_spark.operators.web import extract_links, host_graph

    pages = spark.createDataFrame(
        [("https://a.example.com/x",
          '<a href="https://b.example.com/1">x</a>'
          '<a href="https://b.example.com/2"></a>'
          '<a href="/relative">r</a>'
          '<a href="https://a.example.com/self"></a>'),
         ("https://c.example.com/y", "<p>no links</p>"),
         ("https://d.example.com/z",
          '<a href="https://b.example.com/3"></a>')],
        "url string, html string")
    links = extract_links(pages, key="url", html="html").collect()
    # ALL hrefs extracted, duplicates + relative preserved
    assert len(links) == 5
    assert sum(1 for r in links if r.link == "/relative") == 1

    # binary payloads decode identically
    bin_pages = pages.select("url", F.col("html").cast("binary").alias("html"))
    assert sorted((r.url, r.link) for r in
                  extract_links(bin_pages, key="url", html="html").collect()) \
        == sorted((r.url, r.link) for r in links)

    g = {(r.src_host, r.dst_host): r.n_links
         for r in host_graph(extract_links(pages, "url", "html")).collect()}
    # self-link and relative href dropped; two b-links collapse to n=2
    assert g == {("a.example.com", "b.example.com"): 2,
                 ("d.example.com", "b.example.com"): 1}

    plan = host_graph(extract_links(pages, "url", "html")) \
        ._jdf.queryExecution().executedPlan().toString()
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_revision_intervals_versions(spark):
    from themis_spark.operators.web import revision_intervals

    rows = [
        # url 1: A A B A -> versions A(2 revs), B(1), A(1)
        (1, 10, "A"), (1, 20, "A"), (1, 30, "B"), (1, 40, "A"),
        # url 2: NULL NULL C -> NULL collapses into one version
        (2, 10, None), (2, 20, None), (2, 30, "C"),
        # url 3: single revision, open-ended
        (3, 10, "Z"),
    ]
    df = spark.createDataFrame(
        [(k, float(t), d) for k, t, d in rows],
        "url long, fetched_at double, content_digest string")
    out = sorted(
        revision_intervals(df).collect(),
        key=lambda r: (r.url, r.version))
    got = [(r.url, r.version, r.digest, r.valid_from, r.valid_to,
            r.n_revisions) for r in out]
    assert got == [
        (1, 1, "A", 10.0, 30.0, 2),
        (1, 2, "B", 30.0, 40.0, 1),
        (1, 3, "A", 40.0, None, 1),
        (2, 1, None, 10.0, 30.0, 2),
        (2, 2, "C", 30.0, None, 1),
        (3, 1, "Z", 10.0, None, 1),
    ]
    plan = revision_intervals(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_incremental_validate_equals_full(spark):
    from themis_spark.pipeline import incremental_validate
    from themis_spark.plans.compiler import compile_plan

    schema = {
        "id": "p", "type": "object", "required": ["k", "txt"],
        "properties": {"txt": {"type": "string", "minLength": 5},
                       "k": {"type": "integer", "minimum": 0}},
    }
    old = spark.createDataFrame(
        [(1, "hello world"), (2, "ok"), (3, "carried along"), (5, None)],
        "k long, txt string")
    # new crawl: 1 unchanged, 2 changed (now valid), 3 unchanged,
    # 5 removed, 4 added (invalid: too short)
    new = spark.createDataFrame(
        [(1, "hello world"), (2, "ok now longer"), (3, "carried along"),
         (4, "abc")],
        "k long, txt string")

    def dig(df):
        return F.xxhash64(F.coalesce(F.col("txt"), F.lit("<null>")))

    plan_old = compile_plan(schema, old.schema)
    old_digests = old.select("k", dig(old).alias("content_digest"))
    old_verdicts = old.select(
        "k", F.size(plan_old.violations_col()).alias("n_violations"))
    plan_new = compile_plan(schema, new.schema)

    out = {r.k: r for r in incremental_validate(
        new, old_digests, old_verdicts, plan_new,
        key="k", digest=dig(new)).collect()}
    # exactly the new snapshot's keys
    assert set(out) == {1, 2, 3, 4}
    # carried rows keep cached verdicts without revalidation
    assert out[1].revalidated is False and out[1].n_violations == 0
    assert out[3].revalidated is False and out[3].n_violations == 0
    # changed + added rows are revalidated fresh
    assert out[2].revalidated is True and out[2].n_violations == 0
    assert out[4].revalidated is True and out[4].n_violations == 1

    # the invariant: identical to validating the whole new snapshot
    full = {r.k: r.n for r in new.select(
        "k", F.size(plan_new.violations_col()).alias("n")).collect()}
    assert {k: r.n_violations for k, r in out.items()} == full

    with pytest.raises(ValueError):
        incremental_validate(new, old_digests, old_verdicts, plan_new,
                             key="k", digest=None)


def test_parse_robots_grammar(spark):
    from themis_spark.operators.web import parse_robots

    body = (
        "# top comment\n"
        "User-Agent: *\n"            # case-insensitive field name
        "Disallow: /private/  # trailing comment\n"
        "Allow: /private/ok\n"
        "Disallow:\n"                # empty pattern: dropped
        "\n"
        "User-agent: GoodBot\n"      # consecutive UA lines share rules
        "user-agent: OtherBot\n"
        "Disallow: /tmp\n"
    )
    df = spark.createDataFrame([("h1", body), ("h2", "no rules here")],
                               "host string, robots_txt string")
    rules = {(r.host, r.agent, r.directive, r.path_prefix)
             for r in parse_robots(df).collect()}
    assert rules == {
        ("h1", "*", "disallow", "/private/"),
        ("h1", "*", "allow", "/private/ok"),
        ("h1", "goodbot", "disallow", "/tmp"),
        ("h1", "otherbot", "disallow", "/tmp"),
    }


def test_robots_verdicts_semantics(spark):
    from themis_spark.operators.web import parse_robots, robots_verdicts

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /x\nAllow: /x/pub\n"
                   "User-agent: mybot\nDisallow: /y\n"),
         ("b.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string")
    rules = parse_robots(robots)
    pages = spark.createDataFrame(
        [(1, "https://a.com/x/secret"),   # '*' rule, but mybot group exists
         (2, "https://a.com/y/z"),        # mybot disallow
         (3, "https://a.com/x/pub/ok"),   # would be allow-tie, but mybot group replaces '*'
         (4, "https://b.com/anything"),   # '*' disallow /
         (5, "https://c.com/free"),       # host without robots
         (6, None)],                      # unparseable url
        "k long, url string")
    got = {r.k: r for r in robots_verdicts(
        pages, rules, key="k", agent="MyBot").collect()}
    # a.com has a mybot group -> ONLY it applies: /x rules ignored
    assert got[1].robots_blocked is False and got[1].matched_prefix is None
    assert got[2].robots_blocked is True and got[2].matched_prefix == "/y"
    assert got[3].robots_blocked is False
    assert got[4].robots_blocked is True and got[4].matched_prefix == "/"
    assert got[5].robots_blocked is False
    assert got[6].robots_blocked is False

    # '*'-fallback + longest-prefix + allow-on-tie for an agent with no
    # specific group anywhere
    got2 = {r.k: r for r in robots_verdicts(
        pages, rules, key="k", agent="anon").collect()}
    assert got2[1].robots_blocked is True and got2[1].matched_prefix == "/x"
    assert got2[3].robots_blocked is False  # Allow /x/pub is longer
    assert got2[2].robots_blocked is False  # /y is mybot-only


def test_robots_wildcards_rfc9309(spark):
    """RFC 9309 §2.2.3 '*' / '$' wildcards + query-string matching +
    the empty-path-is-'/' rule (RFC 3986 §6.2.3)."""
    from themis_spark.operators.web import parse_robots, robots_verdicts

    robots = spark.createDataFrame(
        [("w.com",
          "User-agent: *\n"
          "Disallow: /*?sessionid=\n"     # mid-pattern * crossing into query
          "Disallow: /private*\n"
          "Allow: /private-ok\n"          # longer pattern beats /private*
          "Disallow: /*.pdf$\n"           # anchored suffix rule
          "Disallow: /exact$\n"           # anchored exact rule
          "Disallow: /a.b*\n"),           # '.' must be literal, not regex-any
         ("root.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string")
    rules = parse_robots(robots)
    pages = spark.createDataFrame(
        [(1, "https://w.com/page?sessionid=abc"),  # blocked: /*?sessionid=
         (2, "https://w.com/page?other=1"),        # allowed
         (3, "https://w.com/private/data"),        # blocked: /private*
         (4, "https://w.com/private-ok/page"),     # allow wins (longer)
         (5, "https://w.com/doc.pdf"),             # blocked: /*.pdf$
         (6, "https://w.com/doc.pdf?dl=1"),        # NOT blocked: $ anchors past query
         (7, "https://w.com/exact"),               # blocked: /exact$
         (8, "https://w.com/exact/sub"),           # allowed: anchor fails
         (9, "https://w.com/axbz"),                # '.' literal: /a.b* no match
         (10, "https://w.com/a.bz"),               # blocked: /a.b*
         (11, "https://root.com"),                 # empty path == '/': blocked
         (12, "https://root.com/")],               # explicit '/': blocked
        "k long, url string")
    got = {r.k: r.robots_blocked for r in
           robots_verdicts(pages, rules, key="k").collect()}
    assert got == {1: True, 2: False, 3: True, 4: False, 5: True,
                   6: False, 7: True, 8: False, 9: False, 10: True,
                   11: True, 12: True}


def test_host_mirrors_detection_and_cap(spark):
    from themis_spark.operators.web import host_mirrors

    rows = []
    # m1.com and m2.com mirror 4 docs; m3.com shares only 1 with m1
    for i in range(4):
        rows.append((f"https://m1.com/p{i}", 100 + i))
        rows.append((f"https://M2.com/q{i}", 100 + i))  # case-folded host
    rows.append(("https://m3.com/a", 100))
    # boilerplate digest 999 served by 20 hosts: capped out, no pairs
    for i in range(20):
        rows.append((f"https://bp{i}.com/x", 999))
    # NULL digests ignored
    rows.append(("https://m1.com/null", None))
    df = spark.createDataFrame(rows, "url string, content_digest long")

    got = {(r.host_a, r.host_b): r.shared_digests
           for r in host_mirrors(df, min_shared=2).collect()}
    assert got == {("m1.com", "m2.com"): 4}

    # lowering the threshold surfaces the weak pair too
    got1 = {(r.host_a, r.host_b): r.shared_digests
            for r in host_mirrors(df, min_shared=1).collect()}
    assert got1[("m1.com", "m3.com")] == 1 and got1[("m2.com", "m3.com")] == 1

    # disabling the cap lets the boilerplate pairs through (20*19/2)
    n = host_mirrors(df, min_shared=1,
                     max_hosts_per_digest=None).count()
    assert n == 3 + 20 * 19 // 2

    # duplicate (digest, host) rows count each digest once
    df2 = df.union(df)
    got2 = {(r.host_a, r.host_b): r.shared_digests
            for r in host_mirrors(df2, min_shared=2).collect()}
    assert got2 == {("m1.com", "m2.com"): 4}

"""Physical-plan assertions: the properties that make the engine hold at
100 TB must be visible in the plan, not just hoped for (SURVEY.md §4).

- column pruning: the fused pass must never read ``html`` (binary ballast
  dominates bytes) unless a check needs it;
- partition pruning: a resume run's scan must touch only the remaining
  partition directories;
- broadcast: dimension-sized parent keysets must broadcast in the
  referential anti-join;
- partial aggregation: stats/uniqueness run as partial+final hash agg.
"""

import pytest
from pyspark.sql import functions as F

from themis_spark.operators import constraints as C
from themis_spark.operators import validate as V
from themis_spark.operators.stats import column_stats
from themis_spark.plans.compiler import compile_plan
from themis_spark.sources.pages import PAGES_SCHEMA_JSON, write_pages_dataset
from themis_spark.sources.tableio import ParquetTable


@pytest.fixture(scope="module")
def pages_table(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plans"))
    write_pages_dataset(spark, d, 4000, n_partitions=8)
    return ParquetTable(spark, f"{d}/pages", "part_id")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_fused_pass_prunes_html(spark, pages_table):
    df = pages_table.read()
    plan = compile_plan(PAGES_SCHEMA_JSON, df.schema)
    ann = V.annotate(df, plan, keep=["url", "part_id"])
    viol = V.violations_df(ann)
    read_schema = [l for l in _plan(viol).splitlines() if "ReadSchema" in l]
    assert read_schema and "html" not in read_schema[0], read_schema
    # warc_ts is not checked by this schema either → pruned too
    assert "warc_ts" not in read_schema[0]


def test_partition_pruned_resume_scan(spark, pages_table):
    df = pages_table.read(partitions=[1, 3])
    plan_str = _plan(df.groupBy("part_id").count())
    # the partition filter must reach the scan as a partition filter,
    # not a post-scan Filter over all data
    assert "PartitionFilters" in plan_str
    seg = plan_str.split("PartitionFilters")[1].split("]")[0]
    assert "part_id" in seg
    assert df.select("part_id").distinct().count() == 2


def test_referential_broadcast_and_sortmerge(spark, pages_table):
    pages = pages_table.read()
    child = pages.select(F.col("url").alias("src_url"))
    bc = C.referential_orphans(child, "src_url", pages, "url", broadcast_parent=True)
    assert "BroadcastHashJoin" in _plan(bc) and "LeftAnti" in _plan(bc)
    sm = C.referential_orphans(child, "src_url", pages, "url", broadcast_parent=False)
    # non-broadcast path: shuffle-based anti join (AQE may still convert
    # at runtime; statically it must not REQUIRE a broadcast)
    assert "LeftAnti" in _plan(sm)


def test_stats_single_aggregate_no_extra_exchange(spark, pages_table):
    df = pages_table.read()
    m = column_stats(df, ["url", "lang"], hist_specs=[])
    plan_str = _plan(m)
    # partial+final hash agg → exactly one exchange in the stats job
    assert plan_str.count("Exchange") == 1, plan_str
    assert "HashAggregate" in plan_str or "ObjectHashAggregate" in plan_str


def test_uniqueness_partial_agg(spark, pages_table):
    df = pages_table.read()
    plan_str = _plan(C.duplicate_keys(df, "url"))
    # map-side partial aggregation before the exchange (two HashAggregate
    # levels) is what bounds skew for plain counting
    assert plan_str.count("HashAggregate") >= 2
    assert plan_str.count("Exchange") == 1


def test_native_checks_are_codegen(spark, pages_table):
    """Native keyword checks must live inside WholeStageCodegen — no
    Python in the hot path except the declared Arrow validators."""
    df = pages_table.read()
    plan = compile_plan(PAGES_SCHEMA_JSON, df.schema)
    ann = V.annotate(df, plan, keep=["url", "part_id"])
    plan_str = _plan(ann)
    # '*(n)' prefixes mark WholeStageCodegen stages in the compact plan
    import re

    assert re.search(r"\*\(\d+\)", plan_str), plan_str[:500]
    # exactly one ArrowEvalPython: the meta-column validator, nothing else
    assert plan_str.count("ArrowEvalPython") == 1
    # and no row-at-a-time Python UDF node anywhere
    assert "BatchEvalPython" not in plan_str


def test_media_hash_size_fast_path_is_pure_native(spark, pages_table):
    """extract_media_meta(fields=(n_bytes, sha256)) must compile to
    native length/sha2 columns — NO Arrow boundary, no Python workers
    (round-1 verdict item 6 'Done =' criterion)."""
    from themis_spark.operators.multimodal import extract_media_meta

    df = pages_table.read().select(
        F.xxhash64("url").alias("doc_id"), F.col("html").alias("payload"))
    fast = extract_media_meta(df, fields=("n_bytes", "sha256"))
    plan_str = _plan(fast)
    assert "ArrowEvalPython" not in plan_str
    assert "MapInPandas" not in plan_str
    assert "BatchEvalPython" not in plan_str
    # full decode path still goes through one mapInPandas
    full = extract_media_meta(df)
    assert "MapInPandas" in _plan(full)


def test_lsh_candidates_single_bucket_exchange(spark, pages_table):
    """lsh_candidate_pairs must be join-free: ONE groupBy-bucket exchange
    plus the distinct — no self-join (which re-evaluates signatures per
    side and shuffles three times; see dedup._bucket_pairs)."""
    from themis_spark.operators.dedup import lsh_candidate_pairs

    df = pages_table.read().select(
        F.xxhash64("url").alias("doc_id"), F.col("text"))
    plan_str = _plan(lsh_candidate_pairs(df, num_hashes=12, bands=4))
    assert "Join" not in plan_str, plan_str
    # bucket groupBy + distinct = exactly two exchanges
    assert plan_str.count("Exchange") == 2, plan_str


def test_minhash_one_md5_per_shingle(spark, pages_table):
    """The affine MinHash family derives every permutation from ONE
    md5-based base hash per shingle — the plan must contain exactly one
    md5 expression, not num_hashes of them."""
    from themis_spark.operators.dedup import minhash_signatures

    df = pages_table.read().select(
        F.xxhash64("url").alias("doc_id"), F.col("text"))
    plan_str = _optimized(minhash_signatures(df, num_hashes=8))
    assert plan_str.count("md5(") == 1, plan_str


def test_hashed_uniqueness_shuffles_hashes_not_keys(spark, pages_table):
    """duplicate_keys_hashed: the FIRST (big) exchange carries 8-byte
    xxhash64 rows; the exact re-count joins against a broadcast
    candidate set (round-2 shuffle-volume optimization)."""
    df = pages_table.read()
    plan_str = _plan(C.duplicate_keys_hashed(df, "url"))
    assert "xxhash64" in plan_str
    assert "BroadcastHashJoin" in plan_str and "LeftSemi" in plan_str
    # identical output to the plain plan
    a = {(r["url"], r["cnt"]) for r in C.duplicate_keys(df, "url").collect()}
    b = {(r["url"], r["cnt"]) for r in C.duplicate_keys_hashed(df, "url").collect()}
    assert a == b and a  # pages generator plants dup urls


def test_auto_uniqueness_picks_variant_by_dup_rate(spark):
    """duplicate_keys_auto routes by the HLL dup-rate probe: a mostly-
    unique key gets the hash-compressed two-stage plan, a dup-heavy key
    the plain grouped plan — the decision rule duplicate_keys_hashed's
    docstring states, executed (the r3 bench ran the hashed variant on
    a dup-heavy table, its own anti-recommendation)."""
    uniq = spark.range(2000).select(
        F.concat(F.lit("https://u"), F.col("id").cast("string")).alias("k"))
    heavy = spark.range(2000).select(
        (F.col("id") % 7).cast("string").alias("k"))

    p_uniq = _plan(C.duplicate_keys_auto(uniq, "k"))
    assert "xxhash64" in p_uniq and "LeftSemi" in p_uniq

    p_heavy = _plan(C.duplicate_keys_auto(heavy, "k"))
    assert "xxhash64" not in p_heavy and "LeftSemi" not in p_heavy

    # identical output contract either way
    got = {(r.k, r.cnt) for r in C.duplicate_keys_auto(heavy, "k").collect()}
    exp = {(str(i), 2000 // 7 + (1 if i < 2000 % 7 else 0)) for i in range(7)}
    assert got == exp
    assert C.duplicate_keys_auto(uniq, "k").count() == 0


def test_new_keyword_queries_compile_pure_native(spark):
    """The round-2 oracle queries for $ref/format/tuple-items, allOf/
    items-schema/dependencies, and map property-count keywords must stay
    fully JVM-side: zero Arrow specs, zero Python eval nodes — these are
    exactly the keyword families round 1 flagged as silently-dropped or
    Arrow-only on typed columns."""
    import __spark_entry__ as e

    for schema, build in [
        (e.REF_FMT_ITEMS_SCHEMA, e.q_kw_ref_format_items),
        (e.ALLOF_ITEMS_DEPS_SCHEMA, e.q_kw_allof_items_deps),
        (e.PROPS_COUNT_SCHEMA, e.q_kw_props_items_counts),
    ]:
        df = build(spark, "/root/testdata/sf0.001")
        plan_str = _plan(df)
        assert "ArrowEvalPython" not in plan_str, (schema["id"], plan_str)
        assert "BatchEvalPython" not in plan_str, (schema["id"], plan_str)


def test_pack_offsets_single_exchange(spark):
    from themis_spark.operators.stats import pack_offsets

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("n_tokens"))
    plan = _plan(pack_offsets(df, ctx_len=256, buckets=16))
    # ONE shuffle: the bucket repartition feeding the window prefix sum
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semdedup_pair_join_not_coalesced_to_one_task(spark):
    from themis_spark.operators.similarity import semantic_duplicates

    df = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("float"), F.lit(1.0).cast("float")
        ).alias("embedding"))
    cents = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [2.0, 1.0]]
    pairs = semantic_duplicates(df, centroids=cents, threshold=0.0)
    plan = _plan(pairs)
    # the user-specified repartition must survive in the plan (AQE may
    # not coalesce it down to one partition under the quadratic join)
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan \
        or "hashpartitioning(cell" in plan, plan
    pairs.count()  # and it must actually execute


def test_latest_revisions_single_window_exchange(spark):
    from themis_spark.operators.web import latest_revisions

    df = spark.createDataFrame(
        [(1, "https://a.example.com/p", 5), (2, "https://a.example.com/p", 9)],
        "doc_id long, url string, fetched_at long")
    plan = _plan(latest_revisions(df, key="doc_id"))
    # rank + revision count share ONE canonical-key exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_blocklist_is_scan_stage(spark):
    from themis_spark.operators.web import blocklist_filter

    df = spark.createDataFrame(
        [(1, "https://a.example.com/p")], "doc_id long, url string")
    plan = _plan(blocklist_filter(df, host_suffixes=["x.example.com"],
                                  path_prefixes=["/t/"]))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rank_buckets_no_single_partition_window(spark):
    from themis_spark.operators.stats import rank_buckets

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 613).alias("score"))
    out = rank_buckets(df, "score", n=10, partitions=8)
    plan = _plan(out)
    # the round-2 verdict's scale-killer: ntile over a partition-less
    # window serializes every row onto one task. The rewrite must show
    # NO window at all (offset arithmetic instead) and no SinglePartition
    # exchange anywhere.
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan
    # the offsets re-attach as a broadcast join, never a shuffle join
    assert "BroadcastHashJoin" in plan, plan
    # and the sorted frame genuinely spreads across partitions: more
    # than one distinct partition id contributed offsets
    pids = out.select(F.spark_partition_id().alias("p")).distinct().count()
    assert pids > 1


def test_host_mirrors_two_exchanges_no_python(spark):
    from themis_spark.operators.web import host_mirrors

    df = spark.createDataFrame(
        [(f"https://h{i % 4}.com/p{i}", i % 9) for i in range(40)],
        "url string, content_digest long")
    plan = _plan(host_mirrors(df, min_shared=1))
    # one (digest) agg exchange + one (host pair) agg exchange — the
    # corpus rows cross only the first, already collapsed map-side
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan, plan  # pair explode, not a self-join


def test_incremental_validate_no_python_no_cartesian(spark):
    from themis_spark.pipeline import incremental_validate
    from themis_spark.plans.compiler import compile_plan

    schema = {"id": "p", "type": "object", "required": ["k"],
              "properties": {"txt": {"type": "string", "minLength": 5}}}
    new = spark.createDataFrame([(1, "hello world")], "k long, txt string")
    old = new
    plan_c = compile_plan(schema, new.schema)
    dig = F.xxhash64(F.coalesce(F.col("txt"), F.lit("-")))
    out = incremental_validate(
        new, old.select("k", dig.alias("content_digest")),
        old.select("k", F.size(plan_c.violations_col()).alias("n_violations")),
        plan_c, key="k", digest=dig)
    plan = _plan(out)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_robots_verdicts_broadcast_rules(spark):
    from themis_spark.operators.web import parse_robots, robots_verdicts

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /x\n")],
        "host string, robots_txt string")
    pages = spark.createDataFrame(
        [(1, "https://a.com/x/1")], "k long, url string")
    plan = _plan(robots_verdicts(pages, parse_robots(robots), key="k"))
    # the rules side enters broadcast (hinted) — the page corpus is
    # never shuffled for the rules join itself
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_single_corpus_scan_filter_in_scan_stage(spark, tmp_path_factory):
    # the query-term broadcast filter must sit on the scan side BEFORE
    # the tf exchange, df must come from a window (no rejoin that would
    # re-execute the scan subtree), so the whole query reads the corpus
    # parquet exactly twice: the postings scan + the 1-row meta agg.
    from themis_spark.operators.retrieval import bm25_topk

    d = str(tmp_path_factory.mktemp("bm25")) + "/docs"
    spark.createDataFrame(
        [(i, f"alpha beta doc{i}") for i in range(50)],
        "doc_id long, text string").write.parquet(d)
    docs = spark.read.parquet(d)
    qs = spark.createDataFrame([(0, "alpha")], "query_id long, query string")
    plan = _plan(bm25_topk(docs, qs, k=3))
    assert plan.count("FileScan") == 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_membership_no_corpus_side_shuffle_join(spark):
    from themis_spark.operators import dedup as D

    bench = spark.createDataFrame(
        [(0, "a b c d e f g h")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(10)],
        "doc_id long, text string")
    words = D.bloom_filter_build(bench, m_bits=1 << 12)
    plan = _plan(D.bloom_contamination_hits(docs, words))
    # the bit array rides a broadcast; membership is pure codegen —
    # the only exchange is the per-doc count aggregation
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 2, plan

"""Deduplication operators for web-scale training-data pipelines.

Five regimes, all declarative DataFrame plans (no Python in the hot path):

* exact        — hash-groupBy on a text digest: the shuffle moves 8-byte
                 hashes + keys, never the documents.
* MinHash+LSH  — shingle → k min-hashes computed PER ROW with native
                 higher-order array functions (zero shuffle for
                 signatures), then banding → bucket join for candidates.
                 Hashes are md5-based and portable so DuckDB can replay
                 signatures exactly (functions/hashing.py).
* SimHash      — per-bit majority over token hashes, again per-row native;
                 near-dup = hamming distance via bit_count(xor).
* n-gram Jaccard — inverted-index join on shingles (co-occurrence) with
                 exact Jaccard on top; the scale path prefilters with LSH.
* embedding    — cosine near-dup over an embedding column (delegates to
                 operators/similarity.py).

At 10¹²-doc scale: signatures/fingerprints are computed in the scan
stage (map-side, codegen); only (key, small-fixed-width-signature) rows
ever shuffle, and the LSH band join is an equi-join AQE can re-plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from themis_spark.functions.hashing import (
    MERSENNE_P,
    affine_hash,
    hash60,
    hash60_seeded,
)


def _bucket_pairs(df: DataFrame, bucket_cols: list[str], member: Column,
                  cap: int | None) -> DataFrame:
    """All within-bucket member pairs (a < b), ONE exchange, output-bounded.

    groupBy bucket → sorted DISTINCT ``collect_list`` → drop buckets of
    1 (no pairs) or more than ``cap`` members (degenerate boilerplate —
    the skew guard of round-1 verdict item 5: AQE's skew-join splitting
    divides join WORK but not the quadratic OUTPUT, so the cap must
    happen before pair generation; oversized buckets hash identically
    on a whole band and are exact-duplicate territory) → per-bucket
    pair explode from the array. Compared to the window-cap +
    self-equi-join formulation this shuffles the bucket rows ONCE
    instead of three times (window + both join sides — self-joins get
    no ReusedExchange here because the join condition re-aliases the
    plan), never re-evaluates the signature expressions, and bounds
    per-task pair output to cap²/2 by construction. array_distinct
    keeps the strict a < b contract of the self-join it replaced even
    when the same member lands in one bucket twice (duplicate input
    keys) — the SQL oracle keeps the `a < b` self-join form and never
    emits (k, k).

    ``member`` may be a struct column; callers project fields after
    (and filter same-key struct pairs themselves — distinctness here is
    on the whole struct).
    """
    capped = (
        df.groupBy(*bucket_cols)
        .agg(F.array_distinct(F.sort_array(F.collect_list(member))).alias("__ms"))
        .where(F.size("__ms") >= 2)
    )
    if cap is not None:
        capped = capped.where(F.size("__ms") <= cap)
    pairs = F.flatten(F.transform(
        "__ms",
        lambda x, i: F.transform(
            F.slice("__ms", i + F.lit(2), F.size("__ms")),
            lambda y: F.struct(x.alias("a"), y.alias("b")),
        ),
    ))
    return capped.select(F.explode(pairs).alias("__p")).select("__p.a", "__p.b")


# ------------------------------------------------------------------ shingles

def tokens_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(c)), r"\s+")


def shingles_col(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (native,
    computed in the scan stage, no Python) — shifted-zip formulation
    (text.grams_zip): the transform(sequence, slice)-in-a-lambda form
    re-evaluates the tokenizer per gram position (no subexpression
    elimination inside HOF lambdas → O(tokens²) chars per doc).

    Short docs (< n tokens) yield the empty array; the when-guard also
    keeps the zip slice length positive (CaseWhen is lazy per row).
    """
    from themis_spark.operators.text import grams_zip

    toks = tokens_col(text)
    short = F.size(toks) < F.lit(n)
    return F.when(short, F.array().cast("array<string>")) \
            .otherwise(F.array_distinct(grams_zip(toks, n)))


# --------------------------------------------------------------- exact dedup

def exact_duplicates(df: DataFrame, key: str = "doc_id", text: str = "text",
                     normalize: bool = True) -> DataFrame:
    """Exact-duplicate groups: (digest, group_size, keep_key, members).

    Shuffles (digest, key) pairs only — at 100 TB the text stays in place;
    the digest is computed map-side during the scan.
    """
    c: Column = F.col(text)
    if normalize:
        c = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    digest = F.md5(c)
    return (
        df.select(digest.alias("digest"), F.col(key).alias("member"))
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min("member").alias("keep_key"),
            F.sort_array(F.collect_list("member")).alias("members"),
        )
        .where(F.col("group_size") > 1)
    )


# ------------------------------------------------------------------- MinHash

def base_hash_col(text: Column | str, shingle_n: int = 3) -> Column:
    """Array of base hashes (one portable md5-hash60 % P per distinct
    shingle) — the ONLY md5 work in a signature; every permutation is
    derived from it arithmetically."""
    sh = shingles_col(text, shingle_n)
    return F.transform(sh, lambda s: hash60(s) % F.lit(MERSENNE_P))


def minhash_cols_from_base(base: Column, num_hashes: int) -> list[Column]:
    """k min-hash columns ``minhash_0..k-1`` from a materialized base-hash
    array — per-row, shuffle-free, pure codegen arithmetic. Empty docs
    (no shingles) get NULL."""
    return [
        F.array_min(F.transform(base, lambda h: affine_hash(h, i)))
        .alias(f"minhash_{i}")
        for i in range(num_hashes)
    ]


def minhash_signatures(df: DataFrame, key: str = "doc_id", text: str = "text",
                       num_hashes: int = 8, shingle_n: int = 3) -> DataFrame:
    """Per-doc MinHash signatures (universal affine family over 2^31-1).

    Two-step select so the base-hash array MATERIALIZES once per row:
    CollapseProject keeps the boundary because the inner array is
    referenced k times by non-cheap expressions — without it every
    permutation would recompute the md5s (measured ~k× the hashing work).
    """
    based = df.select(
        F.col(key), base_hash_col(F.col(text), shingle_n).alias("__bh"))
    return based.select(
        F.col(key), *minhash_cols_from_base(F.col("__bh"), num_hashes))


def lsh_candidate_pairs(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """MinHash-LSH candidate pairs (a_key < b_key).

    Plan shape: signatures map-side → explode to (band, band_hash, key)
    — ``bands`` rows per doc, tiny — → single groupBy-bucket exchange →
    in-bucket pair explode with the degenerate-bucket cap folded into
    the aggregate (see _bucket_pairs; boilerplate buckets would emit
    O(b²) pairs) → distinct across bands. One shuffle of (key, band,
    bh) rows plus the distinct — the signatures never shuffle and are
    evaluated exactly once.

    Band hashes are portable (md5-based hash60 over the concatenated
    row hashes) so the DuckDB oracle replays candidate sets exactly
    with the equivalent window-cap + self-join SQL.
    """
    sigs = minhash_signatures(df, key, text, num_hashes, shingle_n)
    rows_per_band = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            hash60(F.concat_ws(
                "|", *[F.col(f"minhash_{b * rows_per_band + r}")
                       for r in range(rows_per_band)])).alias("bh"),
        )
        for b in range(bands)
    ]
    has_sig = F.col("minhash_0").isNotNull()
    exploded = sigs.where(has_sig).select(
        F.col(key), F.explode(F.array(*band_structs)).alias("bb")
    ).select(key, "bb.band", "bb.bh")
    return (
        _bucket_pairs(exploded, ["band", "bh"], F.col(key), max_bucket_size)
        .select(F.col("a").alias("a_key"), F.col("b").alias("b_key"))
        .distinct()
    )


def lsh_verified_pairs(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """MinHash-LSH end-to-end: candidate pairs VERIFIED by estimated
    Jaccard — ``(a_key, b_key, est_jaccard)`` for pairs whose signature
    agreement is ≥ ``threshold``.

    The estimator is the standard one: the fraction of the ``num_hashes``
    minhash components on which the two docs agree is an unbiased
    estimate of their shingle-set Jaccard. Verification happens WITHOUT
    re-joining the corpus: the full signature rides through the band
    bucket as the pair member (fixed width — num_hashes longs per row),
    so the whole operator is the same single exchange as
    ``lsh_candidate_pairs`` plus a codegen zip/aggregate per emitted
    pair. At 10¹² docs the alternative (join candidates back to a
    signature table, twice) adds two corpus-scale shuffles; carrying
    ~100 bytes per banded row is strictly cheaper.

    Same degenerate-bucket cap as lsh_candidate_pairs (skew guard);
    pairs surviving in several bands dedup via DISTINCT before the
    estimate is computed once per pair.
    """
    sigs = minhash_signatures(df, key, text, num_hashes, shingle_n)
    sig_arr = F.array(*[F.col(f"minhash_{i}") for i in range(num_hashes)])
    rows_per_band = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            hash60(F.concat_ws(
                "|", *[F.col(f"minhash_{b * rows_per_band + r}")
                       for r in range(rows_per_band)])).alias("bh"),
        )
        for b in range(bands)
    ]
    member = F.struct(F.col(key).alias("k"), sig_arr.alias("sig"))
    exploded = sigs.where(F.col("minhash_0").isNotNull()).select(
        member.alias("m"), F.explode(F.array(*band_structs)).alias("bb")
    ).select("m", "bb.band", "bb.bh")
    pairs = (
        _bucket_pairs(exploded, ["band", "bh"], F.col("m"), max_bucket_size)
        .select(
            F.col("a.k").alias("a_key"), F.col("b.k").alias("b_key"),
            F.col("a.sig").alias("__sa"), F.col("b.sig").alias("__sb"),
        )
        .distinct()
    )
    matches = F.aggregate(
        F.zip_with("__sa", "__sb", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v,
    )
    return (
        pairs.select(
            "a_key", "b_key",
            F.round(matches / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
    )


def cross_corpus_duplicates(
    left: DataFrame,
    right: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """Left docs near-duplicating any RIGHT doc — the two-corpus form of
    MinHash-LSH (dedupe a fresh crawl against the existing training
    set; document-level train-vs-eval decontamination). Returns
    ``(a_key, b_key, est_jaccard)`` with ``a_key`` from the left.

    Plan shape: both sides compute signatures map-side, band-explode
    with a side tag, and UNION — so one groupBy(band, bucket) exchange
    serves both corpora. Each bucket aggregates a left list and a right
    list; pairs are the in-bucket left×right product (never left×left),
    output-bounded by the per-side cap exactly like _bucket_pairs. No
    corpus-scale join anywhere: only (key, signature, band) rows — a
    few hundred bytes per doc — ever shuffle, once.

    Keys may collide across corpora (both sides numbering docs from 0
    is fine) — sides never mix because the left/right lists are
    collected separately.
    """
    rows_per_band = num_hashes // bands

    def banded(df: DataFrame, side: int) -> DataFrame:
        sigs = minhash_signatures(df, key, text, num_hashes, shingle_n)
        sig_arr = F.array(*[F.col(f"minhash_{i}") for i in range(num_hashes)])
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                hash60(F.concat_ws(
                    "|", *[F.col(f"minhash_{b * rows_per_band + r}")
                           for r in range(rows_per_band)])).alias("bh"),
            )
            for b in range(bands)
        ]
        member = F.struct(F.col(key).alias("k"), sig_arr.alias("sig"))
        return (
            sigs.where(F.col("minhash_0").isNotNull())
            .select(member.alias("m"), F.lit(side).alias("side"),
                    F.explode(F.array(*band_structs)).alias("bb"))
            .select("m", "side", "bb.band", "bb.bh")
        )

    u = banded(left, 0).unionByName(banded(right, 1))
    bucketed = (
        u.groupBy("band", "bh")
        .agg(
            F.array_distinct(F.sort_array(F.collect_list(
                F.when(F.col("side") == 0, F.col("m"))))).alias("__la"),
            F.array_distinct(F.sort_array(F.collect_list(
                F.when(F.col("side") == 1, F.col("m"))))).alias("__ra"),
        )
        .where((F.size("__la") >= 1) & (F.size("__ra") >= 1))
    )
    if max_bucket_size is not None:
        bucketed = bucketed.where(
            (F.size("__la") <= max_bucket_size)
            & (F.size("__ra") <= max_bucket_size))
    cross = F.flatten(F.transform(
        "__la",
        lambda x: F.transform(
            "__ra", lambda y: F.struct(x.alias("a"), y.alias("b"))),
    ))
    pairs = (
        bucketed.select(F.explode(cross).alias("__p"))
        .select(
            F.col("__p.a.k").alias("a_key"), F.col("__p.b.k").alias("b_key"),
            F.col("__p.a.sig").alias("__sa"), F.col("__p.b.sig").alias("__sb"),
        )
        .distinct()
    )
    matches = F.aggregate(
        F.zip_with("__sa", "__sb", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v,
    )
    return (
        pairs.select(
            "a_key", "b_key",
            F.round(matches / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
    )


def dedup_against(
    left: DataFrame,
    right: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    **kwargs,
) -> DataFrame:
    """Left rows that do NOT near-duplicate any right doc: the incoming-
    crawl filter. Matched keys (tiny relative to the corpus) anti-join
    back — left itself shuffles only for that anti-join's build side
    lookup (broadcast when the matched set is small, which it is by
    construction: it's the duplicates)."""
    hit = (cross_corpus_duplicates(left, right, key, text, **kwargs)
           .select(F.col("a_key").alias(key)).distinct())
    return left.join(F.broadcast(hit), key, "left_anti")


# ----------------------------------------------------------- decontamination

def contamination_hits(
    df: DataFrame,
    benchmark: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    bench_text: str = "text",
    shingle_n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: per-document count of distinct token
    ``shingle_n``-grams shared with a benchmark/eval corpus — the
    standard training-data hygiene pass (flag or drop any training doc
    that overlaps an eval set at the n-gram level).

    Plan shape for 10¹² docs: the benchmark n-gram hash set is tiny
    (eval sets are thousands of docs) → built once and BROADCAST; the
    corpus side explodes shingles map-side in the scan stage and the
    broadcast inner join discards non-hits immediately, so the only
    exchange is the groupBy(key) over actual hits (rare by
    construction). Returns only contaminated docs: ``(key,
    n_contaminated)`` where ``n_contaminated`` counts distinct shared
    n-grams (shingles_col is distinct per doc). Hashes are the portable
    md5-hash60 so the DuckDB oracle replays the join exactly.
    """
    bench_hashes = (
        benchmark.select(
            F.explode(shingles_col(F.col(bench_text), shingle_n)).alias("s"))
        .select(hash60(F.col("s")).alias("h"))
        .distinct()
    )
    doc_grams = df.select(
        F.col(key), F.explode(shingles_col(F.col(text), shingle_n)).alias("s")
    ).select(key, hash60(F.col("s")).alias("h"))
    return (
        doc_grams.join(F.broadcast(bench_hashes), "h")
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )


# Bloom-filter decontamination — the scale path past the exact set.
#
# contamination_hits broadcasts the benchmark's EXACT 8-byte hash set:
# right for eval sets (10⁶ grams ≈ 8 MB). When the "do not train on
# this" side is itself corpus-sized (a licensed-content corpus, an
# earlier crawl: 10⁹–10¹⁰ grams), the exact set is 10–100 GB and stops
# broadcasting — a Bloom filter at ~10 bits/element (k=4 → ≈1–2% false
# positives) compresses it 50× into something that still rides one
# broadcast, at the cost of a deterministic, auditable FP rate.
# Spark's own bloom_filter_agg/might_contain would also work JVM-side,
# but its internal hashing can't be replayed by the DuckDB oracle; the
# portable md5-hash60 family keeps the whole membership test — false
# positives included — bit-reproducible in both engines.

_BLOOM_SEED0 = 7130311  # fixed seed base; hash s uses seed _BLOOM_SEED0+s


def _bloom_positions(gram: Column, m_bits: int, n_hashes: int) -> list[Column]:
    """The n_hashes bit positions of one gram: independent seeded
    portable hashes mod m (hash60 is non-negative, so % is pmod)."""
    return [
        (hash60_seeded(gram, _BLOOM_SEED0 + i) % F.lit(m_bits))
        for i in range(n_hashes)
    ]


def bloom_filter_build(benchmark: DataFrame, text: str = "text",
                       shingle_n: int = 8, m_bits: int = 1 << 16,
                       n_hashes: int = 4) -> list[int]:
    """Build the Bloom bit array from a benchmark/blocked corpus's
    distinct token n-grams. Returns the dense word list (``m_bits/64``
    signed 64-bit words) — a driver-side value, but O(m/64), never
    O(grams): 2³⁰ bits collect as 128 MB no matter how many grams set
    them (grams aggregate into words map-side via bit_or partial
    aggregation; the exchange carries at most m/64 rows).

    ``m_bits`` must be a multiple of 64; size it at ~10 bits per
    distinct gram for ≈1% FP at ``n_hashes=4``.
    """
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    grams = benchmark.select(
        F.explode(shingles_col(F.col(text), shingle_n)).alias("s"))
    pos = grams.select(F.explode(F.array(
        *_bloom_positions(F.col("s"), m_bits, n_hashes))).alias("p"))
    words = (
        pos.selectExpr("CAST(p DIV 64 AS INT) AS w",
                       "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)) AS m")
        .groupBy("w").agg(F.bit_or("m").alias("word"))
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[r["w"]] = r["word"]
    return arr


def bloom_contamination_hits(df: DataFrame, bloom_words: list[int],
                             key: str = "doc_id", text: str = "text",
                             shingle_n: int = 8,
                             n_hashes: int = 4) -> DataFrame:
    """Per-document count of n-grams that MIGHT be in the Bloom set:
    ``(key, n_grams, n_flagged)`` for documents with ≥1 flagged gram.
    No false negatives (every truly-shared gram is flagged); false
    positives are the filter's documented ~(1-e^{-kn/m})^k rate and are
    deterministic — the same gram flags in every engine.

    Plan shape: the bit array crosses ONCE as a broadcast one-row
    frame; the membership test is pure codegen integer arithmetic
    (element_at + shift + bitwise AND per hash) inside the scan-side
    gram explode, and the only exchange is the per-doc count
    aggregation. Nothing shuffles at O(grams × filter).
    """
    m_bits = 64 * len(bloom_words)
    spark = df.sparkSession
    bloom_df = spark.createDataFrame([(bloom_words,)], "bloom array<bigint>")
    grams = df.select(
        F.col(key), F.explode(shingles_col(F.col(text), shingle_n)).alias("s"))
    g = grams.join(F.broadcast(bloom_df))
    for i, p in enumerate(_bloom_positions(F.col("s"), m_bits, n_hashes)):
        g = g.withColumn(f"__p{i}", p)
    tests = [
        F.expr(f"(element_at(bloom, CAST(__p{i} DIV 64 AS INT) + 1)"
               f" & shiftleft(CAST(1 AS BIGINT), CAST(__p{i} % 64 AS INT)))"
               " != 0")
        for i in range(n_hashes)
    ]
    might = tests[0]
    for t in tests[1:]:
        might = might & t
    return (
        g.select(F.col(key), might.cast("int").alias("__hit"))
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.sum("__hit").alias("n_flagged"))
        .where(F.col("n_flagged") > 0)
    )


def bloom_decontaminate(df: DataFrame, benchmark: DataFrame,
                        key: str = "doc_id", text: str = "text",
                        bench_text: str = "text", shingle_n: int = 8,
                        m_bits: int = 1 << 16,
                        n_hashes: int = 4) -> DataFrame:
    """Documents with NO gram possibly shared with the benchmark — the
    conservative (over-dropping, never under-dropping) decontamination
    filter: Bloom false positives drop a clean doc occasionally; false
    negatives (training on eval data) cannot happen."""
    words = bloom_filter_build(benchmark, bench_text, shingle_n,
                               m_bits, n_hashes)
    hits = bloom_contamination_hits(df, words, key, text, shingle_n,
                                    n_hashes).select(key)
    return df.join(F.broadcast(hits), key, "left_anti")


# ------------------------------------------------------------------- SimHash

def simhash_col(text: Column | str, bits: int = 16) -> Column:
    """SimHash fingerprint: bit b is the sign of the ±1 majority of bit b
    across all token hashes. Pure conditional sums over the token array —
    per-row, codegen-friendly, portable to the SQL oracle."""
    toks = tokens_col(text)
    th = F.transform(toks, lambda t: hash60(t))

    def _bit_summer(b: int):
        # keep the merge lambda strictly two-parameter (acc, element)
        return lambda a, h: a + F.shiftright(h, b).bitwiseAND(F.lit(1))

    acc = F.lit(0).cast("long")
    for b in range(bits):
        ones = F.aggregate(th, F.lit(0).cast("long"), _bit_summer(b))
        bit_set = (ones * 2 > F.size(th)).cast("long")
        acc = acc + F.shiftleft(bit_set, b)
    return acc


def simhash_near_duplicates(df: DataFrame, key: str = "doc_id", text: str = "text",
                            bits: int = 16, max_hamming: int = 2,
                            block_bits: int = 8,
                            max_bucket_size: int | None = 256) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Scale path: block on the top ``block_bits`` bits (two docs within
    hamming d of each other collide on at least one of the rotated blocks
    with high probability for small d); candidates pair up inside each
    block via a single groupBy exchange (see _bucket_pairs; degenerate
    boilerplate blocks are capped in the same aggregate — their members
    are exact-dup territory), verified with bit_count(xor). Avoids the
    quadratic all-pairs compare; the fingerprints shuffle once as
    (key, 8-byte sh) rows and are computed exactly once.
    """
    sigs = df.select(F.col(key), simhash_col(F.col(text), bits).alias("sh"))
    blocks = [
        F.struct(F.lit(r).alias("rot"),
                 F.shiftright(F.shiftleft("sh", r).bitwiseAND(F.lit((1 << bits) - 1)), bits - block_bits).alias("blk"))
        for r in range(0, bits, block_bits)
    ]
    ex = sigs.select(key, "sh", F.explode(F.array(*blocks)).alias("b")).select(key, "sh", "b.rot", "b.blk")
    member = F.struct(F.col(key).alias("k"), F.col("sh").alias("sh"))
    cand = _bucket_pairs(ex, ["rot", "blk"], member, max_bucket_size)
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        cand.select(F.col("a.k").alias("a_key"), F.col("b.k").alias("b_key"),
                    ham.alias("hamming"))
        # duplicate input keys with differing fingerprints are distinct
        # structs, so _bucket_pairs alone can still pair a key with
        # itself — keep the strict a_key < b_key self-join contract
        .where((F.col("a_key") != F.col("b_key")) & (F.col("hamming") <= max_hamming))
        .distinct()
    )


# ------------------------------------------------------- duplicate clusters

def duplicate_clusters(pairs: DataFrame, a: str = "a_key", b: str = "b_key",
                       max_iter: int = 20) -> DataFrame:
    """Connected components over candidate/verified duplicate pairs:
    (member, cluster) where ``cluster`` is the component's minimum key —
    the canonical document a keep-one dedup policy retains.

    The missing last step of the dedup pipeline: LSH/SimHash/Jaccard emit
    PAIRS; groups need the transitive closure (a~b, b~c ⇒ {a,b,c}).

    Spark-first min-label propagation (Pregel-style): every node starts
    labeled with itself; each round labels flow across edges and each
    node keeps the minimum seen. Each round is one distributed
    join + groupBy over the EDGE list (pairs ≪ docs — this runs after
    candidate filtering); the driver only reads a 1-row convergence
    count, and ``localCheckpoint`` truncates the growing lineage each
    round (iterative plans otherwise recompile an ever-deeper tree).
    Converges in ≤ component-diameter rounds; ``max_iter`` bounds
    pathological chains (a 20-hop duplicate chain is exact-dup
    territory long before hop 20). Deterministic — min() is
    order-insensitive — so the DuckDB oracle replays it with a
    recursive transitive-closure CTE.
    """
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = (
            edges.join(labels, edges["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "label")
        )
        new_labels = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") < F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("member"),
                         F.col("label").alias("cluster"))


# ----------------------------------------------------------- n-gram Jaccard

def _overlap_counts(df: DataFrame, key: str, text: str,
                    shingle_n: int, max_shingle_df: int | None) -> DataFrame:
    """Shared inverted-index overlap core for Jaccard AND containment:
    ``(a_key, b_key, inter, a_n, b_n)`` per candidate pair. See
    ngram_jaccard_pairs for the plan-shape discussion (one shingle
    exchange, capped posting lists, ReusedExchange set sizes)."""
    rows = df.select(
        F.col(key), F.explode(shingles_col(F.col(text), shingle_n)).alias("shingle")
    )
    index = rows.groupBy("shingle").agg(
        F.array_distinct(F.sort_array(F.collect_list(key))).alias("ks"))
    if max_shingle_df is not None:
        index = index.where(F.size("ks") <= max_shingle_df)
    nsh = (
        index.select(F.explode("ks").alias(key))
        .groupBy(key).agg(F.count(F.lit(1)).alias("nsh"))
    )
    pairs = F.flatten(F.transform(
        "ks",
        lambda x, i: F.transform(
            F.slice("ks", i + F.lit(2), F.size("ks")),
            lambda y: F.struct(x.alias("a"), y.alias("b")),
        ),
    ))
    inter = (
        index.where(F.size("ks") >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a_key"), F.col("p.b").alias("b_key"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter
        .join(nsh.select(F.col(key).alias("a_key"), F.col("nsh").alias("a_n")), "a_key")
        .join(nsh.select(F.col(key).alias("b_key"), F.col("nsh").alias("b_n")), "b_key")
    )


def ngram_jaccard_pairs(df: DataFrame, key: str = "doc_id", text: str = "text",
                        shingle_n: int = 3, threshold: float = 0.5,
                        max_shingle_df: int | None = 1000) -> DataFrame:
    """N-gram Jaccard similarity via inverted-index join.

    Explode distinct shingles -> ONE groupBy-shingle exchange building the
    inverted index as capped posting lists (a shingle in
    ``max_shingle_df``+ docs -- boilerplate n-grams like "all rights
    reserved" -- would alone generate O(df^2) index pairs; standard prefix
    filtering drops it from the INDEX and from both set sizes, so the
    Jaccard is exact over the surviving discriminative shingles).
    Surviving set sizes |A| re-aggregate from the SAME index exchange
    (ReusedExchange -- singleton postings still count toward |A|);
    intersection counts come from the in-list pair explode (bounded by
    the cap, never O(df^2)); |A u B| = |A|+|B|-|A n B|. Compared to the
    window-cap + self-equi-join formulation this evaluates the shingle
    explode once instead of twice and shuffles it once instead of three
    times. At 10^12 docs this runs AFTER an LSH prefilter; standalone
    it's still the right corpus-scale plan. Core shared with
    ngram_containment_pairs via _overlap_counts.
    """
    joined = _overlap_counts(df, key, text, shingle_n, max_shingle_df)
    jac = F.col("inter") / (F.col("a_n") + F.col("b_n") - F.col("inter"))
    return (
        joined.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("a_key", "b_key", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_containment_pairs(df: DataFrame, key: str = "doc_id",
                            text: str = "text", shingle_n: int = 3,
                            threshold: float = 0.5,
                            max_shingle_df: int | None = 1000) -> DataFrame:
    """Asymmetric near-containment: ``|A n B| / min(|A|, |B|)`` over
    shingle sets -- catches quotes, excerpt pages, and page-in-page
    duplication that symmetric Jaccard misses (a 50-word quote inside a
    5000-word page has tiny Jaccard but containment ~1 for the quote
    side). Same single-exchange inverted-index plan as Jaccard
    (_overlap_counts); returns ``(a_key, b_key, a_n, b_n,
    containment)``, a < b, sizes included so the caller can tell which
    side is the contained one (the smaller set).
    """
    joined = _overlap_counts(df, key, text, shingle_n, max_shingle_df)
    cont = F.col("inter") / F.least(F.col("a_n"), F.col("b_n"))
    return (
        joined.withColumn("containment", F.round(cont, 6))
        .where(F.col("containment") >= threshold)
        .select("a_key", "b_key", "a_n", "b_n", "containment")
    )


# -------------------------------------------------- corpus-level line dedup

def lines_col(text: Column | str, splitter: str = "\n") -> Column:
    """Trimmed non-empty lines of a document as an array column
    (scan-stage native). ``splitter`` is a literal separator, regex-escaped
    internally."""
    import re as _re

    c = F.col(text) if isinstance(text, str) else text
    parts = F.split(c, _re.escape(splitter))
    # explicit one-arg lambda: F.trim's optional second parameter would
    # otherwise make the HOF pass the element INDEX as trim characters
    return F.filter(F.transform(parts, lambda l: F.trim(l)), lambda l: F.length(l) > 0)


def common_line_hashes(
    df: DataFrame,
    text: str = "text",
    splitter: str = "\n",
    min_docs: int = 2,
    min_doc_frac: float | None = None,
) -> DataFrame:
    """Boilerplate discovery (the CCNet-style corpus line-dedup, phase 1):
    lines whose DOCUMENT frequency is >= the threshold, as
    ``(line_hash, n_docs)``.

    Plan: per-document DISTINCT lines (document frequency, not occurrence
    count) are hashed map-side with the portable 60-bit hash; the only
    exchange carries (8-byte hash, partial count) rows — O(distinct lines),
    never the text. With ``min_doc_frac`` the threshold is
    ``max(min_docs, ceil(frac * total_docs))``; the total-docs count is one
    metadata-cheap aggregate job on the driver (a scalar, not a collected
    dataset).
    """
    if min_doc_frac is not None:
        import math

        total = df.count()
        min_docs = max(min_docs, math.ceil(min_doc_frac * total))
    per_doc = df.select(
        F.explode(F.array_distinct(lines_col(F.col(text), splitter))).alias("line")
    )
    return (
        per_doc.select(hash60(F.col("line")).alias("line_hash"))
        .groupBy("line_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_common_lines(
    df: DataFrame,
    common: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    splitter: str = "\n",
    strategy: str = "auto",
    map_side_max: int = 2048,
) -> DataFrame:
    """Boilerplate removal (phase 2): drop every line of ``df`` whose hash
    appears in ``common`` (output of :func:`common_line_hashes`) and
    reassemble the document — ``(key, clean_text, n_lines, n_removed)``.

    Two physical strategies with identical semantics:

    * ``map`` — the common-line set is aggregated to a single array row,
      broadcast, and each document is cleaned map-side with a
      higher-order filter: ZERO shuffle of the corpus. The membership
      test is ``array_contains`` — a LINEAR scan per line, so total work
      is O(lines × set): unbeatable for the typical small curated
      boilerplate list, quadratic-feeling when the set grows (measured
      15× slower than the join at a ~40k-line set over sf0.1).
    * ``join`` — posexplode lines, broadcast HASH join against
      ``common`` (O(1) probe per line), re-group by document ordered by
      line position. One exchange of the text bytes, constant-time
      membership — the scale path when the common set is large.
    * ``auto`` (default) — counts ``common`` (one cheap job over the
      already-aggregated frame) and picks ``map`` iff it fits
      ``map_side_max``.
    """
    if strategy == "auto":
        strategy = "map" if common.count() <= map_side_max else "join"
    lines = lines_col(F.col(text), splitter)

    if strategy == "map":
        common_set = common.agg(
            F.sort_array(F.collect_set("line_hash")).alias("__common")
        )
        # staged selects so the line array and the filtered array each
        # MATERIALIZE once per row (the minhash_signatures trick —
        # CollapseProject keeps the boundary for multiply-referenced
        # non-cheap arrays); inlined, `lines` re-evaluates the whole
        # split/trim/filter chain 3x and `kept` re-runs the md5-per-line
        # membership filter twice
        staged = (
            df.join(F.broadcast(common_set))
            .select(F.col(key), lines.alias("__lines"), F.col("__common"))
        )
        kept = F.filter(
            F.col("__lines"),
            lambda l: ~F.array_contains(F.col("__common"), hash60(l)))
        staged2 = staged.select(
            F.col(key), F.col("__lines"), kept.alias("__kept"))
        return staged2.select(
            F.col(key),
            F.array_join(F.col("__kept"), splitter).alias("clean_text"),
            F.size(F.col("__lines")).alias("n_lines"),
            (F.size(F.col("__lines")) - F.size(F.col("__kept")))
            .alias("n_removed"),
        )

    if strategy != "join":
        raise ValueError(f"unknown strategy {strategy!r} (map|join|auto)")
    ex = df.select(F.col(key), F.posexplode_outer(lines).alias("pos", "line"))
    j = ex.join(
        F.broadcast(common.select(F.col("line_hash").alias("__ch"))),
        hash60(F.col("line")) == F.col("__ch"),
        "left",
    )
    line_ok = F.col("line").isNotNull()
    kept_struct = F.when(line_ok & F.col("__ch").isNull(), F.struct("pos", "line"))
    return (
        j.groupBy(key)
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(kept_struct)),
                            lambda s: s["line"]),
                splitter,
            ).alias("clean_text"),
            F.sum(line_ok.cast("int")).cast("int").alias("n_lines"),
            F.sum((line_ok & F.col("__ch").isNotNull()).cast("int"))
            .cast("int").alias("n_removed"),
        )
        .select(key, "clean_text", "n_lines", "n_removed")
    )


# -------------------------------------------- exact substring dedup (spans)
#
# The Lee et al. 2021 "Deduplicating Training Data Makes Language Models
# Better" (arXiv:2107.06499) exact-substring pass, re-expressed as a
# distributed DataFrame plan. The reference method builds a corpus-wide
# suffix array — inherently single-machine; the standard distributed
# shape (used by every Spark/BigQuery reimplementation) is fixed-length
# token-window hashing: a span is "duplicated" iff one of its
# `window`-token windows occurs >= 2 times anywhere in the corpus.


def window_hash_positions(df: DataFrame, key: str = "doc_id",
                          text: str = "text", window: int = 8) -> DataFrame:
    """``(key, pos, whash)`` — the portable 60-bit hash of every
    ``window``-token sliding window, ``pos`` = 0-based starting token
    index. Docs with fewer than ``window`` tokens (or NULL text) emit
    nothing.

    Plan shape: the window strings are built map-side with the shifted-
    zip gram formulation (text.grams_zip — O(tokens) tokenizer evals,
    not O(tokens²)), hashed in the same projection, and posexploded.
    Output rows = total token count minus (window-1) per doc — the
    irreducible inverted-index expansion — but each row is a fixed-width
    (key, int, 8-byte hash) triple: the text itself never leaves the
    scan stage.
    """
    from themis_spark.operators.text import grams_zip

    c = F.col(text)
    toks = tokens_col(c)
    grams = F.when(F.size(toks) < F.lit(window),
                   F.array().cast("array<string>")) \
             .otherwise(grams_zip(toks, window))
    return (
        df.where(c.isNotNull())
        .select(F.col(key), F.posexplode(grams).alias("pos", "__gram"))
        .select(key, "pos", hash60(F.col("__gram")).alias("whash"))
    )


def _merge_window_spans(hits: DataFrame, key: str, window: int) -> DataFrame:
    """Gaps-and-islands merge of overlapping/adjacent window hits into
    maximal spans: ``(key, span_start, span_end, n_windows)`` with
    0-based inclusive TOKEN indices. All windows have equal length, so
    two sorted hits chain iff ``pos - prev_pos <= window`` (overlap or
    direct adjacency) — a lag + running-sum pair of windows partitioned
    by document: per-doc state only, no global window, no skew beyond
    a single document's own hit count.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy("pos")
    brk = F.when(
        F.lag("pos").over(w).isNull()
        | ((F.col("pos") - F.lag("pos").over(w)) > window),
        1).otherwise(0)
    grp = hits.select(F.col(key), F.col("pos"), brk.alias("__brk")) \
              .select(key, "pos",
                      F.sum("__brk").over(
                          w.rowsBetween(Window.unboundedPreceding, 0))
                      .alias("__grp"))
    return grp.groupBy(key, "__grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(window - 1)).alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
    ).select(key, "span_start", "span_end", "n_windows")


def duplicate_substring_spans(df: DataFrame, key: str = "doc_id",
                              text: str = "text",
                              window: int = 8) -> DataFrame:
    """Corpus-wide duplicated substring spans per document:
    ``(key, span_start, span_end, n_windows)`` — maximal merged runs of
    ``window``-token windows whose hash occurs >= 2 times across the
    corpus (self-repetition within one document counts, as in the
    suffix-array original).

    Plan shape (the whole op is three fixed-width exchanges over
    O(corpus tokens) rows):

    1. window explode (map-side, scan stage) →
    2. groupBy(whash) occurrence count, map-side combined — boilerplate
       mega-hashes (every page sharing a footer) partial-aggregate
       before the shuffle, so hot hashes don't skew the exchange →
    3. hash join back on whash (both sides partition on whash, so the
       aggregation's exchange is reused) keeping only duplicated
       windows — the post-join stream is hits-only, typically a small
       fraction of the corpus →
    4. per-document lag/sum windows (partitioned — no single-task
       global window) merge hits into maximal spans.
    """
    wh = window_hash_positions(df, key, text, window)
    dup = wh.groupBy("whash").agg(F.count(F.lit(1)).alias("n_occ")) \
            .where(F.col("n_occ") >= 2)
    hits = wh.join(dup, "whash").select(key, "pos")
    return _merge_window_spans(hits, key, window)


def remove_duplicate_substrings(df: DataFrame, key: str = "doc_id",
                                text: str = "text",
                                window: int = 8) -> DataFrame:
    """Exact-substring removal, keeping ONE canonical occurrence per
    duplicated window (the Lee et al. policy): for each duplicated
    window hash the occurrence with the smallest ``(key, pos)`` is the
    owner and survives; every other occurrence's token range is cut.
    Returns ``(key, clean_text, n_tokens, n_removed)`` for every input
    row. ``clean_text`` is rebuilt from a CASE-PRESERVING whitespace
    split — the surviving tokens keep their original casing; only
    whitespace is normalized (runs collapse to single spaces, since the
    kept tokens are re-joined with " "). Window hashing/ownership still
    uses the lowercased tokenization (``tokens_col``): lowercasing never
    changes whitespace, so token POSITIONS are identical between the
    two splits and span indices transfer exactly.

    Cut semantics: removal ranges are the merged spans of NON-OWNER
    duplicated windows; a token inside both an owned and a non-owned
    window is removed (the same boundary ambiguity the suffix-array
    original resolves arbitrarily at cut edges).

    Plan shape: window explode → occurrence count (map-side combined) →
    hash join back (hits only) → per-whash min-struct owner agg (one
    more fixed-width exchange) → per-doc island merge (partitioned
    windows) → collect_list of spans per doc (bounded by the doc's own
    span count) → equi-join spans onto the corpus by key → native
    higher-order filter drops covered token indices map-side. The
    document text crosses exactly one exchange (the final key join);
    everything else moves (key, int, hash) triples.
    """
    wh = window_hash_positions(df, key, text, window)
    dup = wh.groupBy("whash").agg(F.count(F.lit(1)).alias("n_occ")) \
            .where(F.col("n_occ") >= 2)
    hits = wh.join(dup, "whash").select("whash", key, "pos")
    owner = hits.groupBy("whash").agg(
        F.min(F.struct(key, "pos")).alias("__own"))
    nonown = (
        hits.join(owner, "whash")
        .where(~((F.col(key) == F.col(f"__own.{key}"))
                 & (F.col("pos") == F.col("__own.pos"))))
        .select(key, "pos")
    )
    spans = _merge_window_spans(nonown, key, window).groupBy(key).agg(
        F.collect_list(F.struct(
            F.col("span_start").alias("s"),
            F.col("span_end").alias("e"))).alias("__spans"))

    c = F.col(text)
    # case-preserving split for RECONSTRUCTION: same delimiters as the
    # lowercased hashing tokenization, so positions line up 1:1 while
    # the output keeps the corpus's original casing
    toks = F.when(c.isNull() | (F.length(F.trim(c)) == 0),
                  F.array().cast("array<string>")) \
            .otherwise(F.split(F.trim(c), r"\s+"))
    # staged selects so the token array materializes once per row
    # (CollapseProject keeps the boundary for multiply-referenced
    # non-cheap arrays — the remove_common_lines trick)
    staged = df.join(spans, key, "left").select(
        F.col(key), toks.alias("__toks"),
        F.coalesce(F.col("__spans"),
                   F.array().cast("array<struct<s:long,e:long>>"))
        .alias("__spans"))
    kept = F.filter(
        F.transform(F.col("__toks"),
                    lambda t, i: F.struct(i.alias("i"), t.alias("t"))),
        lambda s: ~F.exists(
            F.col("__spans"),
            lambda sp: (s["i"] >= sp["s"]) & (s["i"] <= sp["e"])))
    staged2 = staged.select(
        F.col(key), F.col("__toks"), kept.alias("__kept"))
    return staged2.select(
        F.col(key),
        F.array_join(F.transform(F.col("__kept"), lambda s: s["t"]), " ")
        .alias("clean_text"),
        F.size(F.col("__toks")).cast("long").alias("n_tokens"),
        (F.size(F.col("__toks")) - F.size(F.col("__kept")))
        .cast("long").alias("n_removed"),
    )


def duplicate_substring_stats(df: DataFrame, key: str = "doc_id",
                              text: str = "text", window: int = 8,
                              round_to: int = 6) -> DataFrame:
    """Per-document duplicated-token budget from the exact-substring
    pass: ``(key, n_tokens, dup_tokens, dup_fraction)`` for EVERY input
    row — the number the Gopher/FineWeb-style "duplicate text fraction"
    filters threshold on (docs above ~0.3–0.6 dup_fraction get dropped
    or routed to the removal pass).

    ``dup_tokens`` = total tokens covered by the merged duplicated
    spans of :func:`duplicate_substring_spans` (spans never overlap
    after the island merge, so a plain sum is exact);
    ``dup_fraction`` = dup_tokens / n_tokens (0.0 for empty docs).

    Plan shape: the spans subplan's fixed-width exchanges + one
    per-document span-length aggregation + one key equi-join back onto
    the corpus (the only exchange that carries the corpus rows).
    """
    spans = duplicate_substring_spans(df, key, text, window)
    per_doc = spans.groupBy(key).agg(
        F.sum(F.col("span_end") - F.col("span_start") + 1)
        .alias("__dup_tokens"))
    c = F.col(text)
    toks = F.when(c.isNull() | (F.length(F.trim(c)) == 0),
                  F.array().cast("array<string>")) \
            .otherwise(tokens_col(c))
    base = df.select(F.col(key), F.size(toks).cast("long").alias("n_tokens"))
    j = base.join(per_doc, key, "left")
    dup = F.coalesce(F.col("__dup_tokens"), F.lit(0)).cast("long")
    return j.select(
        key, "n_tokens",
        dup.alias("dup_tokens"),
        F.round(F.when(F.col("n_tokens") > 0,
                       dup.cast("double") / F.col("n_tokens"))
                 .otherwise(F.lit(0.0)), round_to).alias("dup_fraction"),
    )


def hamming_near_duplicates(sigs: DataFrame, key: str = "doc_id",
                            sig: str = "sig", bits: int = 64,
                            max_hamming: int = 3, block_bits: int = 16,
                            max_bucket_size: int | None = 256) -> DataFrame:
    """Near-dup pairs over PRECOMPUTED 64-bit-or-less fingerprints by
    banded Hamming blocking — the signature-agnostic core behind
    simhash_near_duplicates, reused for perceptual image hashes
    (multimodal.image_near_duplicates) or any other bitwise sketch.

    Bands are the ``bits/block_bits`` disjoint ``block_bits``-bit slices
    of the signature; by pigeonhole, two signatures within Hamming
    distance ``d < bits/block_bits`` agree on at least one band, so
    recall is EXACT (not probabilistic) for ``max_hamming <=
    bits/block_bits - 1`` — the default 64/16 covers d <= 3. Candidates
    pair inside each (band, value) bucket via the capped single-exchange
    plan (_bucket_pairs, degenerate buckets capped like LSH), then
    verify with bit_count(xor). Signatures shuffle once as 8-byte rows;
    arithmetic shiftright sign-extension on negative longs is masked off
    by the band mask.
    """
    if bits % block_bits != 0:
        raise ValueError("block_bits must divide bits")
    if max_hamming > bits // block_bits - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole guarantee of "
            f"{bits // block_bits - 1} for {bits}/{block_bits} banding")
    mask = F.lit((1 << block_bits) - 1).cast("long")
    bands = [
        F.struct(F.lit(r).alias("rot"),
                 F.shiftright(F.col(sig), r).bitwiseAND(mask).alias("blk"))
        for r in range(0, bits, block_bits)
    ]
    ex = (sigs.select(F.col(key).alias("__k"), F.col(sig).alias("__sig"),
                      F.explode(F.array(*bands)).alias("b"))
          .select("__k", "__sig", "b.rot", "b.blk"))
    member = F.struct(F.col("__k").alias("k"), F.col("__sig").alias("sh"))
    cand = _bucket_pairs(ex, ["rot", "blk"], member, max_bucket_size)
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        cand.select(F.col("a.k").alias("a_key"), F.col("b.k").alias("b_key"),
                    ham.alias("hamming"))
        .where((F.col("a_key") != F.col("b_key"))
               & (F.col("hamming") <= max_hamming))
        .distinct()
    )

"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure native Column expressions (scan-stage, codegen, zero shuffle,
zero Python) and deliberately SQL-portable so the DuckDB oracle can
replay them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from themis_spark.functions.hashing import hash60

# Tiny high-frequency stopword lists per language — a deterministic
# n-gram/stopword heuristic, not a model (the container has no langid
# libraries; the Spark plumbing is the point, the word lists are
# swappable).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "une", "que"],
    "pt": ["o", "a", "de", "que", "e", "do", "da", "em", "um", "para"],
}


def token_count_col(text: Column | str) -> Column:
    """Whitespace token count (0 for empty/NULL-safe at caller)."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count_col(text: Column | str) -> Column:
    """BPE-ish subword proxy: count of word/number/punctuation chunks via
    regex segmentation (the standard pre-tokenizer shape: letter runs,
    digit runs, single punctuation)."""
    c = F.col(text) if isinstance(text, str) else text
    chunks = F.regexp_extract_all(F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    return F.size(chunks)


def stopword_score_col(text: Column | str, lang: str) -> Column:
    """How many of ``lang``'s stopwords occur in the text's token set."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.array_distinct(F.split(F.trim(F.lower(c)), r"\s+"))
    words = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(toks, words))


def language_id_col(text: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits,
    'und' (undetermined) when nothing matches. Chained comparisons keep
    it portable to the SQL oracle (greatest + CASE)."""
    scores = {lang: stopword_score_col(text, lang) for lang in LANG_STOPWORDS}
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # reversed so that ties resolve to the FIRST language in dict order
    for lang in reversed(list(scores)):
        result = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(result)
    return result


def quality_score_col(text: Column | str) -> Column:
    """Composite quality in [0,1]: length band, mean word length band,
    alpha ratio, stopword presence. Mirrors the usual web-text quality
    filters (length/punct/stopword ratios) with portable arithmetic."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    n_toks = token_count_col(c)
    mean_word = n_chars / F.greatest(n_toks, F.lit(1))
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z ]", "")) / F.greatest(n_chars, F.lit(1))
    stop = stopword_score_col(c, "en")
    len_ok = (n_chars >= 200) & (n_chars <= 20000)
    word_ok = (mean_word >= 3.0) & (mean_word <= 12.0)
    score = (
        len_ok.cast("double") * 0.25
        + word_ok.cast("double") * 0.25
        + F.least(alpha, F.lit(1.0)) * 0.25
        + F.least(stop.cast("double") / 5.0, F.lit(1.0)) * 0.25
    )
    return F.round(score, 6)


def extracted_text_col(html: Column | str, encoding: str = "UTF-8") -> Column:
    """Reference text extraction from an ``html: binary`` column — the
    operator behind the north rule's per-row invariant ("byte-identical
    extracted text per url"): decode the page bytes, take the <body>,
    strip tags, collapse whitespace. Pure native columns (decode +
    regexes, scan-stage, zero Python), deliberately simple and
    deterministic so two runs at different parallelism produce identical
    bytes by construction; a real boilerplate-removal model would slot in
    behind the same column signature. SQL-portable: the DuckDB oracle
    replays it with decode()/regexp_extract/regexp_replace(...,'g').
    """
    c = F.col(html) if isinstance(html, str) else html
    s = F.decode(c, encoding)
    body = F.regexp_extract(s, r"(?s)<body[^>]*>(.*)</body>", 1)
    no_tags = F.regexp_replace(body, r"<[^>]+>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


# ----------------------------------------------------- charset handling

_BOM_UTF8 = bytes([0xEF, 0xBB, 0xBF])
_BOM_UTF16_LE = bytes([0xFF, 0xFE])
_BOM_UTF16_BE = bytes([0xFE, 0xFF])

_META_CHARSET_RE = (
    r'(?i)<meta[^>]*charset\s*=\s*["\']?\s*([A-Za-z0-9_.:-]+)')


def detect_charset_col(html: Column | str) -> Column:
    """Charset label for a raw crawl payload (``binary``): BOM sniff
    (UTF-8 / UTF-16LE / UTF-16BE) takes precedence, then an HTML
    ``<meta charset=…>`` / ``http-equiv content=…charset=…`` declaration
    (matched on the UTF-8-cast header — meta tags are ASCII, which every
    ASCII-compatible charset encodes identically), else ``'utf-8'``
    (the WHATWG default for the modern web). Labels come back
    lowercased. UTF-16 without a BOM is not detected (would need
    NUL-pattern statistics; real crawls virtually always carry the BOM).

    Pure scan-stage native expressions — binary substring compares +
    one regex; no Python, nothing leaves the scan projection.
    """
    c = F.col(html) if isinstance(html, str) else html
    meta = F.lower(F.regexp_extract(c.cast("string"),
                                    _META_CHARSET_RE, 1))
    return (
        F.when(F.substring(c, 1, 3) == F.lit(_BOM_UTF8), F.lit("utf-8"))
        .when(F.substring(c, 1, 2) == F.lit(_BOM_UTF16_LE),
              F.lit("utf-16le"))
        .when(F.substring(c, 1, 2) == F.lit(_BOM_UTF16_BE),
              F.lit("utf-16be"))
        .when(meta != "", meta)
        .otherwise(F.lit("utf-8"))
    )


def decode_html_col(html: Column | str, charset: Column) -> Column:
    """Decode page bytes to a UTF-8 string column under a per-row
    charset label (as produced by :func:`detect_charset_col`).
    Supported: utf-8 (+aliases ascii/us-ascii — a strict subset),
    iso-8859-1/latin-1/windows-1252 (decoded as ISO-8859-1 — the
    96.8%-identical superset distinction is out of scope), utf-16le /
    utf-16be (via Java's BOM-aware UTF-16 codec). Unknown labels fall
    back to UTF-8 (never fails the row — charset lies are routine in
    crawls). Any leading BOM / ZWNBSP is stripped from the result.

    ``F.decode`` takes only literal charsets, so the per-row dispatch
    is a when-chain over the supported set — still one scan-stage
    codegen expression, no Python.
    """
    c = F.col(html) if isinstance(html, str) else html
    latin = ("iso-8859-1", "latin-1", "latin1", "windows-1252", "cp1252")
    decoded = (
        F.when(charset.isin(*latin), F.decode(c, "ISO-8859-1"))
        .when(charset.isin("utf-16le", "utf-16be", "utf-16"),
              F.decode(c, "UTF-16"))
        .otherwise(F.decode(c, "UTF-8"))
    )
    return F.regexp_replace(decoded, "^﻿", "")


def with_decoded_text(df, html: str = "html",
                      charset_out: str = "charset",
                      text_out: str = "decoded_text"):
    """Charset-detect + decode in one scan-stage projection:
    adds ``(charset, decoded_text)`` to the frame."""
    cs = detect_charset_col(html)
    d = df.withColumn(charset_out, cs)
    return d.withColumn(text_out,
                        decode_html_col(html, F.col(charset_out)))


def grams_zip(toks: Column, n: int) -> Column:
    """Word n-grams from a token array via the shifted-zip formulation:
    n slices + (n−1) ``zip_with`` concats. The textbook form —
    ``transform(sequence(1, m), i -> concat_ws(' ', slice(toks, i, n)))``
    — re-evaluates the ``toks`` EXPRESSION once per gram position,
    because Catalyst does no subexpression elimination inside
    higher-order-function lambda bodies; with ``toks`` = split(trim(
    lower(text))) that is O(tokens²) characters per document (measured
    8.2 s → ~1 s for the 3 repetition fractions on the 5k-doc sf0.1
    corpus). ``zip_with``'s ARRAY arguments, by contrast, are evaluated
    once per row — the lambda touches only the paired elements — so
    here the tokenizer runs a bounded number of times regardless of
    document length (and ordinary-projection CSE usually collapses
    those copies to one).

    Caller must guard short inputs (< n tokens): the slice length would
    be ≤ 0.
    """
    m = F.size(toks) - (n - 1)
    parts = [F.slice(toks, i + 1, m) for i in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p,
                           lambda a, b: F.concat(a, F.lit(" "), b))
    return grams


def ngrams_col(text: Column | str, n: int, distinct: bool = False) -> Column:
    """Word n-grams as an array column (native, scan stage, no Python).
    ``distinct=False`` keeps every occurrence — the repetition stats
    need multiplicity; dedup shingling wants the set.

    Short docs (< n tokens) explicitly yield the empty array instead of
    bogus partial windows (the when-guard also keeps the slice length
    in :func:`grams_zip` positive — CaseWhen branches evaluate lazily).
    """
    toks = F.split(F.trim(F.lower(F.col(text) if isinstance(text, str) else text)), r"\s+")
    grams = grams_zip(toks, n)
    out = F.array_distinct(grams) if distinct else grams
    short = F.size(toks) < F.lit(n)
    return F.when(short, F.array().cast("array<string>")).otherwise(out)


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring — length delta after removal,
    portable to the SQL oracle (replace() is greedy left-to-right in
    both engines)."""
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / F.lit(len(needle))


def gopher_quality_cols(text: Column | str) -> list[Column]:
    """Gopher-style quality-rule bundle (Rae et al. 2021, public): word
    count band, mean word length band, symbol-to-word ratio (# and …),
    fraction of words with an alphabetic character, stopword presence.
    Emitted as individual aliased columns plus the conjunction flag
    ``gopher_pass`` so a pipeline can filter on the flag or inspect the
    failing rule. Pure native expressions — scan-stage, zero shuffle,
    zero Python — and arithmetic-portable to the DuckDB oracle.

    Thresholds are the published Gopher bounds; at 100 TB this runs
    fused into the same projection as the other text stats (one scan).
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(F.lower(c)), r"\s+")
    n_words = token_count_col(c)
    n_den = F.greatest(n_words, F.lit(1))
    mean_word_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    ) / n_den
    symbol_ratio = (
        _count_occurrences(c, "#") + _count_occurrences(c, "...")
    ) / n_den
    alpha_word_ratio = F.size(
        F.filter(toks, lambda t: t.rlike("[a-z]"))
    ) / n_den
    stop_hits = stopword_score_col(c, "en")
    gopher_pass = (
        (n_words >= 50) & (n_words <= 100000)
        & (mean_word_len >= 3.0) & (mean_word_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (alpha_word_ratio >= 0.8)
        & (stop_hits >= 2)
    )
    return [
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_word_ratio, 6).alias("alpha_word_ratio"),
        stop_hits.alias("stopword_hits"),
        gopher_pass.cast("int").alias("gopher_pass"),
    ]


def _dup_frac(grams: Column) -> Column:
    n = F.size(grams)
    return F.round(
        F.when(n <= 0, F.lit(0.0))
        .otherwise(F.lit(1.0) - F.size(F.array_distinct(grams)) / n), 6)


def repetition_cols(text: Column | str) -> list[Column]:
    """Repetition signals (the Gopher repetition filters adapted to
    single-line web text): duplicate-token fraction and duplicate
    2-/3-gram fractions — ``1 − distinct/total`` over each gram stream.
    Boilerplate and degenerate machine-generated pages score high.
    Per-row native array arithmetic; portable to the SQL oracle.

    Inline-expression form: each gram array is re-evaluated per
    reference (~3× the tokenizing work). Table scans should use
    ``repetition_df``, which materializes each array once (measured
    ~3× on the sf0.1 corpus).
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(F.trim(F.lower(c)), r"\s+"))
    return [
        _dup_frac(toks).alias("dup_word_frac"),
        _dup_frac(ngrams_col(c, 2)).alias("dup_2gram_frac"),
        _dup_frac(ngrams_col(c, 3)).alias("dup_3gram_frac"),
    ]


def repetition_df(df, text: str = "text",
                  keep: tuple[str, ...] = ("doc_id",)):
    """Scan form of ``repetition_cols``: two-step select so each gram
    array MATERIALIZES exactly once per row (CollapseProject keeps the
    projection boundary because the arrays are non-cheap and multiply
    referenced — the minhash_signatures trick). Same output columns,
    same values; one tokenize + one n-gram build per size instead of
    three."""
    c = F.col(text)
    toks = F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(F.trim(F.lower(c)), r"\s+"))
    s1 = df.select(*keep, toks.alias("__t"))
    t = F.col("__t")

    def grams(n: int):
        # built FROM the materialized token column, so every slice /
        # size / guard references a cheap attribute, never the
        # tokenizer expression (empty text -> [] -> short guard fires,
        # same result as ngrams_col's own guard)
        return F.when(F.size(t) < n, F.array().cast("array<string>")) \
                .otherwise(grams_zip(t, n))

    s2 = s1.select(*keep, t, grams(2).alias("__g2"), grams(3).alias("__g3"))
    return s2.select(
        *keep,
        _dup_frac(F.col("__t")).alias("dup_word_frac"),
        _dup_frac(F.col("__g2")).alias("dup_2gram_frac"),
        _dup_frac(F.col("__g3")).alias("dup_3gram_frac"),
    )


def gopher_quality_df(df, text: str = "text",
                      keep: tuple[str, ...] = ("doc_id",)):
    """Scan form of ``gopher_quality_cols``: tokenizes once per row
    (the cols form re-splits for the mean-word-length, alpha-ratio and
    stopword terms). Same output columns and values."""
    c = F.col(text)
    g = df.select(*keep, c.alias("__text"),
                  F.split(F.trim(F.lower(c)), r"\s+").alias("__t"))
    t, toks = F.col("__text"), F.col("__t")
    n_words = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(toks))
    n_den = F.greatest(n_words, F.lit(1))
    mean_word_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)) / n_den
    symbol_ratio = (
        _count_occurrences(t, "#") + _count_occurrences(t, "...")) / n_den
    alpha_word_ratio = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))) / n_den
    words = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), words))
    gopher_pass = (
        (n_words >= 50) & (n_words <= 100000)
        & (mean_word_len >= 3.0) & (mean_word_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (alpha_word_ratio >= 0.8)
        & (stop_hits >= 2)
    )
    return g.select(
        *keep,
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_word_ratio, 6).alias("alpha_word_ratio"),
        stop_hits.alias("stopword_hits"),
        gopher_pass.cast("int").alias("gopher_pass"),
    )


def fingerprint_col(text: Column | str) -> Column:
    """Whole-document fingerprint: md5 of whitespace-normalized lowercase
    text (exact-dup key; portable)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))


def winnow_fingerprint_col(text: Column | str, gram: int = 8, keep: int = 4) -> Column:
    """Rolling-hash document sketch: hash every ``gram``-char window of
    the normalized text, keep the ``keep`` smallest hashes (a winnowing /
    MinHash-style sketch robust to local edits). Built from native
    substring/transform/array_sort — per-row, shuffle-free."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    # shifted-zip windows (see grams_zip): substr(norm, i, gram) inside a
    # transform lambda would re-run the normalizing regexp once per
    # CHARACTER position — O(len²) regex work per document
    chars = F.split(norm, "")
    m = F.length(norm) - (gram - 1)
    parts = [F.slice(chars, i + 1, m) for i in range(gram)]
    wins = parts[0]
    for p in parts[1:]:
        wins = F.zip_with(wins, p, lambda a, b: F.concat(a, b))
    hashes = F.transform(wins, lambda w: hash60(w))
    # guard texts shorter than one window (also keeps the slice length
    # positive — CaseWhen branches evaluate lazily per row)
    short = F.length(norm) < F.lit(gram)
    return F.when(short, F.array().cast("array<long>")) \
            .otherwise(F.slice(F.array_sort(F.array_distinct(hashes)), 1, keep))


def vocabulary(df, key: str = "doc_id", text: str = "text", k: int = 1000):
    """Corpus vocabulary with term and document frequencies: the top-k
    tokens by total occurrences — ``(token, tf, df)`` — the build step
    for IDF weighting, stopword discovery, and tokenizer audits.

    Plan shape: explode tokens (the inverted-index expansion — output
    rows = total token count, the irreducible cost of the op), then one
    partial+final aggregation per token (count combines map-side;
    countDistinct adds the standard two-phase distinct expansion on
    (token, doc)), then distributed top-k via orderBy+limit which Spark
    executes as TakeOrderedAndProject — per-task k-row heaps, no global
    sort, even over a 10¹²-row corpus' vocabulary. Ordering ties break
    on token ascending (total order — token is the group key), so the
    result is deterministic and oracle-replayable.
    """
    counts = _doc_tokens(df, key, text).groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct(key).alias("df"),
    )
    return counts.orderBy(F.desc("tf"), F.asc("token")).limit(k)


def _doc_tokens(df, key: str, text: str):
    """(key, token) exploded whitespace tokens — the shared inverted-
    index expansion behind vocabulary() and unigram_logprob()."""
    c = F.col(text)
    return (
        df.where(c.isNotNull())
        .select(F.col(key),
                F.explode(F.split(F.trim(F.lower(c)), r"\s+")).alias("token"))
        .where(F.length("token") > 0)
    )


def tfidf_top_terms(df, key: str = "doc_id", text: str = "text",
                    k: int = 3, round_to: int = 6):
    """Top-k characteristic terms per document by tf·idf — keyword
    extraction / topic tagging over the corpus's own statistics.

    ``score = tf_in_doc * ln(N / df)`` (raw idf: rare-across-corpus,
    frequent-in-doc terms win). Returns ``(key, token, score, rank)``
    with rank 1..k, ties broken on token ascending (total order —
    deterministic, oracle-replayable).

    Plan shape: token explode → per-(doc, token) tf agg → token⋈df
    equi-join (document frequencies aggregate from the tf frame, so
    tokenization runs ONCE; AQE broadcasts the df side when small) →
    per-doc rank window. The rank's doc-key exchange is the only
    corpus-scale shuffle not already required by the tf aggregation;
    WindowGroupLimit prunes to per-task top-k before it.
    """
    from pyspark.sql.window import Window

    toks = _doc_tokens(df, key, text)
    tf = toks.groupBy(key, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # corpus size rides in as a broadcast single-row frame — no
    # driver-side count() during plan construction
    n_docs = tf.agg(F.countDistinct(key).alias("__n"))
    scored = tf.join(dfreq, "token").join(F.broadcast(n_docs)).select(
        F.col(key), F.col("token"),
        F.round(F.col("tf") * F.log(F.col("__n").cast("double")
                                    / F.col("df")),
                round_to).alias("score"),
    )
    w = Window.partitionBy(key).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def unigram_logprob(df, key: str = "doc_id", text: str = "text",
                    round_to: int = 6):
    """Per-document mean unigram log-probability under the corpus's OWN
    unigram model — the CCNet-style fluency/quality signal (a KenLM
    perplexity proxy that needs no external model: train and score in
    one plan). Low scores = rare-token-heavy docs (gibberish, boiler-
    plate IDs, OCR noise); filters typically drop the bottom tail.

    Returns ``(key, n_tokens, mean_logprob)`` with the mean rounded so
    the DuckDB oracle replays it despite float summation order.

    Plan shape (exact scoring): token explode → vocab aggregation
    (shuffle on token, map-side combined) → token⋈vocab equi-join on
    token (AQE broadcasts the vocab side when it fits; web-scale vocabs
    shuffle — both sides already hash on token so the join reuses the
    vocab exchange) → per-doc aggregation (shuffle on key). The corpus
    total enters as a broadcast single-row cross join, not a collect.
    Self-scoring means no OOV: every token has corpus count >= 1.
    """
    toks = _doc_tokens(df, key, text)
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    lp = F.log(F.col("cnt")) - F.log(F.col("total"))
    return (
        toks.join(vocab, "token")
        .join(F.broadcast(total))
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.round(F.avg(lp), round_to).alias("mean_logprob"))
    )


def vocab_drift(base, cur, key: str = "doc_id", text: str = "text",
                k: int = 100, eps: float = 1e-9, round_to: int = 6):
    """Token-distribution drift between two corpus slices (last crawl vs
    this one): for each of the base slice's top-k tokens, its share in
    both slices and its PSI contribution ``(p - q) * ln(p / q)`` — the
    textual counterpart of the numeric KS/PSI drift checks. A vocabulary
    whose hot tokens shift (template change, language mix shift, spam
    influx) shows up here before quality scores move.

    Shares are computed against each slice's total token count (entering
    as broadcast single-row frames, no driver-side count); tokens absent
    from the current slice get share eps so the contribution is finite
    and the DuckDB oracle replays it exactly. Plan: two vocabulary
    aggregations + a broadcast-size top-k join — the corpora shuffle
    only for their own token aggs.
    """
    vb = vocabulary(base, key, text, k)
    tc = _doc_tokens(cur, key, text).groupBy("token").agg(
        F.count(F.lit(1)).alias("tf_cur"))
    nb = vb.agg(F.sum("tf").alias("__nb"))  # base top-k mass as reference
    nc = tc.agg(F.sum("tf_cur").alias("__nc"))
    j = (
        vb.join(tc, "token", "left")
        .join(F.broadcast(nb)).join(F.broadcast(nc))
    )
    p = F.col("tf") / F.col("__nb")
    q = F.greatest(F.coalesce(F.col("tf_cur"), F.lit(0)) / F.col("__nc"),
                   F.lit(float(eps)))
    contrib = (p - q) * F.log(p / q)
    return j.select(
        "token",
        F.round(p, round_to).alias("p_base"),
        F.round(q, round_to).alias("p_cur"),
        F.round(contrib, round_to).alias("psi_contrib"),
    )


def filter_funnel(df, rules: list[tuple[str, Column]]):
    """Ordered filter attribution in ONE scan: every row is charged to the
    FIRST rule it fails (funnel semantics — the per-rule drop report a
    CCNet/Gopher/FineWeb-style curation pipeline publishes). Returns one
    row per rule: ``(stage, rule, n_in, n_dropped, n_out)`` where ``n_in``
    is the rows surviving all earlier rules.

    NULL rule results count as failures (a quality filter that cannot
    evaluate a row must not pass it). Plan: a single when-chain column +
    one partial+final count aggregation over first-fail stages — the
    exchange carries at most ``len(rules)+1`` counter rows; the small
    per-rule report frame is assembled from that one aggregate (rows =
    #rules, the same deliberate driver-side scale as the runner's
    per-partition verdict collect).
    """
    first_fail = None
    for i, (_name, cond) in enumerate(rules):
        failed = ~F.coalesce(cond, F.lit(False))
        first_fail = (F.when(failed, F.lit(i)) if first_fail is None
                      else first_fail.when(failed, F.lit(i)))
    first_fail = first_fail.otherwise(F.lit(-1))

    counts = {r["ff"]: r["n"]
              for r in df.select(first_fail.alias("ff"))
                         .groupBy("ff").agg(F.count(F.lit(1)).alias("n"))
                         .collect()}
    total = sum(counts.values())
    rows, n_in = [], total
    for i, (name, _cond) in enumerate(rules):
        dropped = counts.get(i, 0)
        rows.append((i, name, n_in, dropped, n_in - dropped))
        n_in -= dropped
    spark = df.sparkSession
    return spark.createDataFrame(
        rows, "stage int, rule string, n_in long, n_dropped long, n_out long")


def apply_filters(df, rules: list[tuple[str, Column]]):
    """Rows surviving every rule — the keep-side counterpart of
    ``filter_funnel``, one conjunctive scan-stage predicate (NULL fails,
    matching the funnel's attribution)."""
    keep = F.lit(True)
    for _name, cond in rules:
        keep = keep & F.coalesce(cond, F.lit(False))
    return df.filter(keep)


# ------------------------------------------------- hashed linear classifier

def hashed_weights(dim: int = 1024) -> list[float]:
    """Deterministic dyadic-rational weight vector for the classifier
    demo/tests: ``w[i] = (((i*2654435761) % (dim+1)) - dim//2) / 1024``.
    Every weight is an exact binary fraction, so per-document weight
    sums are EXACT in float64 regardless of summation order — the DuckDB
    oracle replays them bit-identically. Production models pass their
    trained vector instead (any list[float]); exactness then only
    matters for oracle replay, not correctness."""
    half = dim // 2
    return [(((i * 2654435761) % (dim + 1)) - half) / 1024.0 for i in range(dim)]


def classifier_scores(df, key: str = "doc_id", text: str = "text",
                      weights: list[float] | None = None, bias: float = 0.0,
                      round_to: int = 6):
    """fastText-style hashed bag-of-words linear classifier INFERENCE —
    the model-based quality-filter step of CCNet / FineWeb-Edu-style
    curation, with the model baked into the plan: ``(key, n_tokens,
    logit, label, score)`` where ``logit = bias + mean(w[h(token) mod
    D])``, ``label = logit > 0`` and ``score = sigmoid(logit)``.

    The weight vector ships as ONE array literal (compile-time model
    broadcast — D ≤ a few 10⁵ fits comfortably in the plan; bigger
    vocabularies become a broadcast join on the hash id). Scoring is a
    pure scan-stage projection: tokenize → portable 60-bit hash →
    element_at into the weight literal → exact fold — zero shuffle,
    zero Python, so it composes with filter_funnel/apply_filters at
    full scan speed. Token arrays materialize ONCE via a staged select
    (HOF lambdas get no subexpression elimination).

    Zero-token documents score the bias alone. ``logit`` rounds to
    ``round_to``; ``label`` is derived from the UNROUNDED logit
    (boundary rows must not flip with the rounding). ``score`` is for
    ranking/thresholding by users; cross-engine comparisons should use
    logit/label (libm exp() is not bit-specified)."""
    if weights is None:
        weights = hashed_weights()
    dim = len(weights)
    w_lit = F.lit(weights)  # flat float list -> one ArrayType literal
    c = F.col(text)
    toks = F.filter(F.split(F.trim(F.lower(c)), r"\s+"),
                    lambda t: F.length(t) > 0)
    staged = df.where(c.isNotNull()).select(F.col(key), toks.alias("__toks"))
    picked = staged.select(
        key,
        F.size("__toks").alias("n_tokens"),
        F.aggregate(
            F.transform(
                "__toks",
                lambda t: F.element_at(
                    w_lit, (F.pmod(hash60(t), F.lit(dim)) + 1).cast("int")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("__wsum"),
    )
    logit = F.lit(float(bias)) + F.when(
        F.col("n_tokens") > 0, F.col("__wsum") / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    return picked.select(
        key,
        "n_tokens",
        F.round(logit, round_to).alias("logit"),
        (logit > 0).alias("label"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), round_to).alias("score"),
    )


def weights_table(spark, dim: int = 1024):
    """:func:`hashed_weights` as a ``(feature_hash, weight)`` DataFrame
    — the shape :func:`classifier_scores_join` consumes, and the shape
    a REAL trained model arrives in (parquet of hash→weight rows)."""
    return spark.createDataFrame(
        list(enumerate(hashed_weights(dim))), "feature_hash long, weight double")


def classifier_scores_join(df, weights_df, dim: int,
                           key: str = "doc_id", text: str = "text",
                           bias: float = 0.0, round_to: int = 6):
    """Production-scale model application: the same hashed linear
    classifier as :func:`classifier_scores`, with the weight vector as
    a BROADCAST-JOINED DataFrame instead of one array literal — the
    path for real fastText-scale models (10⁵–10⁷ hashed features),
    where folding weights into the plan would blow Catalyst's codegen
    method-size limit.

    ``weights_df`` is ``(feature_hash, weight)`` with hashes in
    ``[0, dim)``; absent hashes score 0 (sparse models ship only
    non-zero rows). Plan: tokenize → explode map-side → broadcast hash
    equi-join → one partial+final agg on the key, so the only exchange
    carries one (key, sum, count) row per document per task — O(docs),
    never O(tokens). Output schema and values match
    ``classifier_scores`` exactly for the same dense weights (the demo
    weights are dyadic rationals, so the different summation order is
    still bit-exact; real float weights agree to ``round_to``)."""
    c = F.col(text)
    toks = F.filter(F.split(F.trim(F.lower(c)), r"\s+"),
                    lambda t: F.length(t) > 0)
    exploded = (
        df.where(c.isNotNull())
        .select(F.col(key), F.explode_outer(toks).alias("__tok"))
        .select(
            key, "__tok",
            F.pmod(hash60(F.col("__tok")), F.lit(dim)).alias("__h"),
        )
    )
    w = weights_df.select(F.col("feature_hash").alias("__h"),
                          F.col("weight").alias("__w"))
    agg = (
        exploded.join(F.broadcast(w), "__h", "left")
        .groupBy(key).agg(
            F.count("__tok").alias("n_tokens"),
            F.sum(F.coalesce(F.col("__w"), F.lit(0.0))).alias("__wsum"),
        )
    )
    logit = F.lit(float(bias)) + F.when(
        F.col("n_tokens") > 0, F.col("__wsum") / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    return agg.select(
        key,
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.round(logit, round_to).alias("logit"),
        (logit > 0).alias("label"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), round_to).alias("score"),
    )


def with_classifier_scores(df, text: str = "text",
                           weights: list[float] | None = None,
                           bias: float = 0.0, round_to: int = 6):
    """Frame-preserving classifier inference: the input columns pass
    through and ``clf_n_tokens`` / ``clf_logit`` / ``clf_label`` are
    appended — the form a curation pipeline filters on WITHOUT a second
    scan or a key semi-join (classifier_scores projects a fresh keyed
    frame; this one stays inside the same scan so
    ``.where(F.col("clf_label"))`` composes with the other filter
    rules). Same staged-select materialization: the token array and the
    weight fold each evaluate once per row. NULL text scores NULL (the
    caller's rules decide what NULL means — filter_funnel counts it as
    a failure)."""
    if weights is None:
        weights = hashed_weights()
    dim = len(weights)
    w_lit = F.lit(weights)
    c = F.col(text)
    toks = F.when(c.isNotNull(),
                  F.filter(F.split(F.trim(F.lower(c)), r"\s+"),
                           lambda t: F.length(t) > 0))
    staged = df.select("*", toks.alias("__clf_toks"))
    folded = staged.select(
        "*",
        F.size("__clf_toks").alias("__clf_n"),
        F.aggregate(
            F.transform(
                "__clf_toks",
                lambda t: F.element_at(
                    w_lit, (F.pmod(hash60(t), F.lit(dim)) + 1).cast("int")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("__clf_wsum"),
    )
    logit = F.lit(float(bias)) + F.when(
        F.col("__clf_n") > 0, F.col("__clf_wsum") / F.col("__clf_n")
    ).otherwise(F.lit(0.0))
    return (
        folded.withColumn("clf_n_tokens",
                          F.when(F.col("__clf_toks").isNotNull(),
                                 F.col("__clf_n")))
        .withColumn("clf_logit",
                    F.when(F.col("__clf_toks").isNotNull(),
                           F.round(logit, round_to)))
        .withColumn("clf_label",
                    F.when(F.col("__clf_toks").isNotNull(), logit > 0))
        .drop("__clf_toks", "__clf_n", "__clf_wsum")
    )


def compression_ratio_cols(text_col: str = "text"):
    """zlib compression ratio per document — the classic cheap
    gibberish/boilerplate signal (highly repetitive text compresses far
    below natural prose; random noise barely compresses). Returns a
    builder for ``mapInPandas`` because no SQL engine exposes zlib —
    this is a DECLARED Arrow-batch Python op (like the multimodal
    codecs), not a hot-path scan column; schedule it after the native
    filters have already dropped the bulk of the corpus.

    Use::

        fn, schema = compression_ratio_cols("text")
        scored = df.mapInPandas(fn, df.schema.simpleString()[7:-1]
                                + ", n_bytes bigint, ratio double")

    or the convenience wrapper :func:`with_compression_ratio`.
    """
    import zlib

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            texts = pdf[text_col]
            n_bytes, ratio = [], []
            for t in texts:
                if t is None:
                    n_bytes.append(None)
                    ratio.append(None)
                    continue
                b = t.encode("utf-8", "replace")
                n_bytes.append(len(b))
                ratio.append(round(len(zlib.compress(b, 6)) / len(b), 6)
                             if b else None)
            out = pdf.copy()
            out["n_bytes"] = pd.array(n_bytes, dtype="Int64")
            out["ratio"] = ratio
            yield out

    return fn


def with_compression_ratio(df, text: str = "text"):
    """``df`` + ``(n_bytes, ratio)`` columns via one Arrow-batched pass
    (see :func:`compression_ratio_cols` for when to use this signal).
    Typical filter: drop ``ratio < 0.2`` (template spam) and
    ``ratio > 1.0`` (binary junk in a text column)."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    return df.mapInPandas(compression_ratio_cols(text),
                          fields + ", n_bytes bigint, ratio double")


# --------------------------------------------------------------- real BPE

BPE_SEP = "\x1f"  # unit separator: never appears in crawl text


def train_bpe_merges(df, text: str = "text", n_merges: int = 50,
                     sample_docs: int = 1000):
    """Train a byte-pair-encoding merge list on a deterministic corpus
    sample — driver-side, which is the STANDARD deployment shape for
    BPE (GPT-2's merges were trained once on a sample and applied
    everywhere; training needs a global argmax per merge, so training
    on 10¹² rows buys nothing a 10⁵-doc sample doesn't). The sample is
    the ``sample_docs`` lowest portable-hash documents — stable across
    runs, partitionings, and engines.

    Returns ``[(a, b), ...]`` merge pairs in application order —
    feed to :func:`bpe_tokenize_col` / :func:`bpe_token_count_col`
    (distributed, native application). Character-level, whitespace
    pre-tokenization, no end-of-word marker (documented
    simplification; the application mechanics are the real thing).
    Ties in pair frequency break lexicographically — deterministic."""
    from collections import Counter

    from themis_spark.functions.hashing import hash60

    rows = (df.select(F.col(text).alias("t"))
            .where(F.col(text).isNotNull())
            .orderBy(hash60(F.col(text)), F.col(text))
            .limit(sample_docs).collect())
    word_counts: Counter = Counter()
    for r in rows:
        word_counts.update(r["t"].lower().split())
    seqs = {w: list(w) for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, cnt in word_counts.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        if not pairs:
            break
        # deterministic tie-break: highest count, then lexicographic pair
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        a, b = best
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def bpe_tokenize_col(text: Column | str,
                     merges: list[tuple[str, str]]) -> Column:
    """Distributed BPE APPLICATION as a pure native expression: tokens
    array per document. Each word becomes a separator-joined character
    sequence; each merge is ONE literal ``replace`` (no regex — no
    dialect risk, identical left-to-right non-overlapping semantics in
    Spark and DuckDB). Symbols are joined by DOUBLE separators and the
    merge pattern consumes only the INNER halves
    (``␟a␟␟b␟ -> ␟ab␟``): each match leaves the outer separator
    halves in place, so an adjacent occurrence still has its boundary
    and a run like ``aaaa`` chains into ``aa aa`` exactly like greedy
    BPE (a single-separator encoding eats the shared boundary and
    strands the tail — unit-tested). ~n_merges chained replaces run
    inside the scan projection; keep demo merge lists ≤ a few hundred
    (codegen method-size limits — production tokenizers with 50k
    merges belong in an Arrow batch kernel, the declared Python
    path)."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(F.trim(F.lower(c)), r"\s+"),
                     lambda w: F.length(w) > 0)
    s2 = BPE_SEP + BPE_SEP

    def apply(word: Column) -> Column:
        s = F.concat(F.lit(s2), F.regexp_replace(word, "(.)", "$1" + s2))
        for a, b in merges:
            s = F.replace(s, F.lit(BPE_SEP + a + s2 + b + BPE_SEP),
                          F.lit(BPE_SEP + a + b + BPE_SEP))
        return F.array_remove(F.split(s, BPE_SEP), "")

    return F.flatten(F.transform(words, apply))


def bpe_token_count_col(text: Column | str,
                        merges: list[tuple[str, str]]) -> Column:
    """Token count under a trained merge list — the REAL token budget
    number (mixture planning, packing, pricing) where
    ``bpe_ish_token_count_col`` is the model-free approximation."""
    return F.size(bpe_tokenize_col(text, merges))


def _bpe_apply_word(word: str, merges: list[tuple[str, str]],
                    ranks: dict[tuple[str, str], int]) -> list[str]:
    """Sequential BPE application to one word: each merge, in rank
    order, replaces its pair left-to-right non-overlapping — EXACTLY
    the chained-replace semantics of :func:`bpe_tokenize_col`, computed
    without touching merges whose pair is absent. A min-heap walks the
    ranks of pairs actually present; pairs created by merge r with rank
    < r are skipped (sequential application already passed them), which
    is precisely what the chained replaces do."""
    import heapq

    seq = list(word)
    if len(seq) < 2:
        return seq
    heap = sorted({r for r in (ranks.get(p) for p in zip(seq, seq[1:]))
                   if r is not None})
    queued = set(heap)
    last = -1
    while heap:
        r = heapq.heappop(heap)
        if r < last:
            continue  # pair appeared after its merge's turn had passed
        last = r
        a, b = merges[r]
        out, i, changed = [], 0, False
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
                changed = True
            else:
                out.append(seq[i])
                i += 1
        if changed:
            seq = out
            if len(seq) < 2:
                break
            for p in zip(seq, seq[1:]):
                rr = ranks.get(p)
                if rr is not None and rr > r and rr not in queued:
                    queued.add(rr)
                    heapq.heappush(heap, rr)
    return seq


def bpe_tokenize_arrow(df, merges: list[tuple[str, str]],
                       text: str = "text", key: str = "doc_id"):
    """PRODUCTION-scale BPE application as a declared Arrow batch
    kernel — ``(key, tokens array<string>, n_bpe_tokens)`` — for merge
    lists past the ~few-hundred bound where the native chained-replace
    path (:func:`bpe_tokenize_col`) hits Catalyst's codegen method-size
    limit. Same contract as the media codecs (functions/imagecodec.py):
    Python appears ONLY inside ``mapInPandas`` over Arrow batches,
    never per-row.

    Semantics are bit-identical to the native path (parity-tested):
    lowercase, whitespace pre-tokenization, each merge applied in rank
    order, left-to-right non-overlapping. The kernel skips absent pairs
    via a rank heap (O(applied merges · word length) per unique word,
    independent of total merge-list size) and memoizes per unique word
    WITHIN each Arrow batch — Zipf word repetition makes the cache hit
    rate ~95%+ on web text, so a 50k-merge tokenizer runs at
    cache-miss-bounded cost. The merge list ships once per task in the
    serialized closure (a 50k list is ~1 MB — broadcast-sized, the
    standard model-shipping shape).

    Scale shape: zero shuffle — a pure map stage; NULL text yields an
    empty token array (count 0), matching ``token_count_col``'s
    NULL-in/0-out packing contract downstream.
    """
    from typing import Iterator

    import pandas as pd

    merges = [tuple(m) for m in merges]
    ranks: dict[tuple[str, str], int] = {}
    for i, p in enumerate(merges):
        if p not in ranks:  # duplicate pair: later replace is a no-op
            ranks[p] = i

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_out = []
            for t in pdf[text]:
                if t is None or t != t:
                    toks_out.append([])
                    continue
                toks: list[str] = []
                for w in str(t).lower().split():
                    got = cache.get(w)
                    if got is None:
                        got = _bpe_apply_word(w, merges, ranks)
                        cache[w] = got
                    toks.extend(got)
                toks_out.append(toks)
            yield pd.DataFrame({
                key: pdf[key],
                "tokens": toks_out,
                "n_bpe_tokens": [len(x) for x in toks_out],
            })

    key_dt = df.schema[key].dataType.simpleString()
    return df.select(key, text).mapInPandas(
        kernel, f"{key} {key_dt}, tokens array<string>, n_bpe_tokens long")


# ----------------------------------------------- model-based language ID

def demo_language_model() -> list[tuple[str, str, float]]:
    """Deterministic demo weights for :func:`language_id_join` —
    ``(token, lang, weight)`` over the stopword tables with small
    INTEGER-valued weights (``1 + rank mod 3``), so per-document sums
    are exact in float64 regardless of summation order and the DuckDB
    oracle replays scores bit-identically. A real model (pruned
    fastText unigram table) arrives in the same shape as parquet."""
    rows = []
    for lang, words in LANG_STOPWORDS.items():
        for i, tok in enumerate(sorted(words)):
            rows.append((tok, lang, float(1 + (i % 3))))
    return rows


def language_model_table(spark):
    """:func:`demo_language_model` as the ``(token, lang, weight)``
    DataFrame :func:`language_id_join` consumes."""
    return spark.createDataFrame(
        demo_language_model(), "token string, lang string, weight double")


def language_id_join(df, model, key: str = "doc_id", text: str = "text",
                     default: str = "und", distinct: bool = False,
                     round_to: int = 6):
    """Model-based language identification: score every document against
    a ``(token, lang, weight)`` model table and return
    ``(key, lang, score)`` for EVERY input row — the loadable-model
    upgrade of the :func:`language_id_col` heuristic (which hard-codes
    5 stopword lists into the plan). A pruned fastText-style unigram
    table with 10⁴–10⁶ rows ships as a parquet of exactly this shape.

    ``lang`` is the argmax language by summed weight of matching token
    occurrences (``distinct=True`` scores each distinct token once —
    the stopword-heuristic convention); ties break on lang ascending;
    documents matching nothing (or with NULL text) get
    ``(default, 0.0)``.

    Plan shape: tokenize + explode map-side → BROADCAST equi-join on
    token (hits only — the model is the small side, the corpus never
    shuffles for the join) → per-(key, lang) partial+final agg →
    per-key min-struct argmax agg (both map-side combined; the
    exchanges carry one row per document per candidate language, never
    the tokens) → one left equi-join re-attaches unmatched documents.
    Zero Python anywhere.
    """
    c = F.col(text)
    toks = F.filter(F.split(F.trim(F.lower(c)), r"\s+"),
                    lambda t: F.length(t) > 0)
    if distinct:
        toks = F.array_distinct(toks)
    exploded = (
        df.where(c.isNotNull())
        .select(F.col(key), F.explode(toks).alias("token"))
    )
    w = model.select("token", F.col("lang").alias("__lang"),
                     F.col("weight").alias("__w"))
    scores = (
        exploded.join(F.broadcast(w), "token")
        .groupBy(key, "__lang")
        .agg(F.sum("__w").alias("__score"))
    )
    best = scores.groupBy(key).agg(
        F.min(F.struct((F.lit(0.0) - F.col("__score")).alias("ns"),
                       F.col("__lang").alias("l"))).alias("__b"))
    return (
        df.select(key).join(best, key, "left")
        .select(
            key,
            F.coalesce(F.col("__b.l"), F.lit(default)).alias("lang"),
            F.round(F.coalesce(F.lit(0.0) - F.col("__b.ns"), F.lit(0.0)),
                    round_to).alias("score"),
        )
    )


def bigram_logprob(df, key: str = "doc_id", text: str = "text",
                   round_to: int = 6):
    """Per-document mean CONDITIONAL bigram log-probability under the
    corpus's own bigram model — one order up from
    :func:`unigram_logprob` toward the CCNet 5-gram-KenLM fluency
    signal: ``mean over i of ln c(t_{i-1}, t_i) - ln c(t_{i-1}, ·)``
    (MLE, no smoothing needed — the model is trained on the corpus
    being scored, so every observed bigram has count >= 1). Word-soup
    and shuffled-token docs score sharply lower than docs whose token
    ORDER repeats across the corpus, which is exactly what the unigram
    signal cannot see.

    Returns ``(key, n_bigrams, mean_logprob)`` for every input row;
    docs with fewer than 2 tokens get ``(0, 0.0)``. The mean rounds so
    the DuckDB oracle replays it despite float summation order.

    Plan shape: bigram pairs are built map-side with one shifted
    ``zip_with`` over the token array (no O(tokens²) lambda
    re-evaluation) and exploded — rows = total tokens - docs, each a
    (key, prev, cur) triple. Two aggregations over that frame — counts
    by (prev, cur) and by prev — are both map-side combined; the two
    equi-joins back hash on the same keys (AQE broadcasts vocab-sized
    sides). Final per-key agg is one exchange of one row per document.
    """
    c = F.col(text)
    toks = F.filter(F.split(F.trim(F.lower(c)), r"\s+"),
                    lambda t: F.length(t) > 0)
    pairs = F.when(F.size(toks) < 2,
                   F.array().cast("array<struct<prev:string,cur:string>>")) \
             .otherwise(F.zip_with(
                 F.slice(toks, 1, F.size(toks) - 1),
                 F.slice(toks, 2, F.size(toks) - 1),
                 lambda a, b: F.struct(a.alias("prev"), b.alias("cur"))))
    ex = (
        df.where(c.isNotNull())
        .select(F.col(key), F.explode(pairs).alias("__p"))
        .select(key, F.col("__p.prev").alias("prev"),
                F.col("__p.cur").alias("cur"))
    )
    bc = ex.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("__bc"))
    uc = ex.groupBy("prev").agg(F.count(F.lit(1)).alias("__uc"))
    lp = F.log(F.col("__bc")) - F.log(F.col("__uc"))
    scored = (
        ex.join(bc, ["prev", "cur"]).join(uc, "prev")
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             F.round(F.avg(lp), round_to).alias("mean_logprob"))
    )
    return (
        df.select(key).join(scored, key, "left")
        .select(
            key,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(F.col("mean_logprob"), F.lit(0.0))
            .alias("mean_logprob"),
        )
    )


# ---------------------------------------------------- script profiling

# Unicode script ranges as regex character classes, portable between
# Java regex (Spark) and RE2 (DuckDB/pyarrow): plain literal-character
# ranges only, no \p{Script=...} (Java supports it, RE2's table differs
# by Unicode version — literal ranges pin the exact same code points on
# both engines). Order matters: dominant-script ties resolve to the
# FIRST entry here, like language_id_col.
SCRIPT_RANGES: list[tuple[str, str]] = [
    ("latin", "A-Za-zÀ-ɏ"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("arabic", "؀-ۿ"),
    ("hebrew", "֐-׿"),
    ("devanagari", "ऀ-ॿ"),
    ("cjk", "一-鿿"),
    ("hangul", "가-힯"),
    ("kana", "぀-ヿ"),
]


def script_count_col(text: Column | str, char_class: str) -> Column:
    """Count of characters in ``char_class`` — length minus length after
    deleting the class (exact integer, code-point counting on both
    engines; regexp_count would need a per-char match loop instead)."""
    c = F.col(text) if isinstance(text, str) else text
    return (F.length(c)
            - F.length(F.regexp_replace(c, f"[{char_class}]", ""))).cast("long")


def script_profile_cols(text: Column | str) -> list[Column]:
    """Per-script character counts + dominant script for a text column.

    The writing-system complement of language_id_col: langid's stopword
    lists only separate languages that share an alphabet; a Cyrillic or
    CJK page scores 0 on every list and lands in 'und'. Script counts
    are pure scan-stage integer arithmetic (zero shuffle, zero Python)
    and feed corpus mixture dashboards (what fraction of the crawl is
    CJK?) and routing (send Arabic-script pages to the Arabic pipeline).

    Columns: n_<script> per SCRIPT_RANGES entry, n_script_chars (their
    sum), dominant_script ('und' when no script char occurs; ties break
    to the earlier SCRIPT_RANGES entry). All exact integers/strings —
    the DuckDB oracle replays them verbatim.
    """
    counts = {name: script_count_col(text, cls) for name, cls in SCRIPT_RANGES}
    total = None
    for col in counts.values():
        total = col if total is None else total + col
    best = F.greatest(*counts.values())
    dominant = F.lit("und")
    for name in reversed([n for n, _ in SCRIPT_RANGES]):
        dominant = F.when((best > 0) & (counts[name] == best), F.lit(name)) \
                    .otherwise(dominant)
    return (
        [counts[name].alias(f"n_{name}") for name, _ in SCRIPT_RANGES]
        + [total.alias("n_script_chars"), dominant.alias("dominant_script")]
    )


def script_profile(df, key: str = "doc_id", text: str = "text"):
    """(key, n_<script>..., n_script_chars, dominant_script) per doc."""
    return df.select(F.col(key), *script_profile_cols(F.col(text)))


# ------------------------------------------------------- document chunking

def chunk_spans(df, key: str = "doc_id", text: str = "text",
                size: int = 128, stride: int | None = None):
    """Fixed-size token chunks with optional overlap — the layout step
    for context-window training samples and RAG passage indexes.

    Chunk starts are ``0, stride, 2·stride, …`` while ``start <
    n_tokens`` (``stride`` defaults to ``size`` — disjoint chunks;
    ``stride < size`` overlaps adjacent chunks by ``size - stride``
    tokens). The final chunk may be shorter than ``size``; empty
    documents yield no chunks (explode drops them).

    Scale shape: one scan-stage projection (split → sequence of starts →
    posexplode → slice) — ZERO shuffle, zero Python; output rows ≈
    corpus tokens / stride. ``chunk_id = start / stride`` is derived
    arithmetic, not an ordinal over an exchange, so the operator is
    deterministic under any partitioning and resume-safe. DuckDB
    replays it with range()/list_slice().
    """
    if stride is None:
        stride = size
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    c = F.col(text)
    toks = F.split(F.trim(c), r"\s+")
    n = F.when(c.isNull() | (F.length(F.trim(c)) == 0), F.lit(0)) \
         .otherwise(F.size(toks))
    starts = F.when(n == 0, F.array().cast("array<int>")) \
              .otherwise(F.sequence(F.lit(0), n - 1, F.lit(stride)))
    ex = df.select(
        F.col(key), toks.alias("__toks"), n.alias("__n"),
        F.explode(starts).alias("__start"),
    )
    chunk_toks = F.slice(F.col("__toks"), F.col("__start") + 1, size)
    return ex.select(
        key,
        (F.col("__start") / stride).cast("long").alias("chunk_id"),
        F.col("__start").cast("long").alias("token_start"),
        F.least(F.col("__start") + size, F.col("__n"))
         .cast("long").alias("token_end"),
        F.size(chunk_toks).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk_toks, " ").alias("chunk_text"),
    )


# ------------------------------------------- boilerplate / main content

_BLOCK_TAG_SPLIT = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|br|table|tr|td|th|section|article"
    r"|aside|main|header|footer|nav|blockquote|form)[^>]*>"
)


def main_content_cols(html: Column | str, encoding: str = "UTF-8",
                      min_words: int = 3,
                      max_link_density_pct: int = 34) -> list[Column]:
    """jusText-lite boilerplate removal from an ``html: binary`` column.

    The standard web-curation step between raw markup and every text
    filter: navigation bars, link farms, footers and cookie banners are
    mostly anchor text in short blocks, article bodies are long
    low-link-density blocks. Pipeline: decode → take <body> → drop
    <script>/<style> subtrees → split on block-level tags → per block
    strip inline tags and score (word count, anchor-word count) → keep
    blocks with ``words >= min_words`` and integer link density
    ``anchor_words * 100 <= max_link_density_pct * words`` (exact
    arithmetic — no float threshold, so the DuckDB oracle replays the
    classification bit-for-bit).

    Pure scan-stage native columns (regex + higher-order functions over
    the block array — each block's text materializes once inside the
    transform, zero shuffle, zero Python). Columns: ``main_text`` (kept
    blocks joined by single spaces), ``n_blocks`` (non-empty blocks),
    ``n_kept`` and ``n_boiler_words`` (dropped-word audit). A model-based
    extractor slots in behind the same signature.

    RE2-portable by construction: no backreferences (script/style strip
    is two separate non-greedy replaces), (?i)/(?s) flags only.
    """
    c = F.col(html) if isinstance(html, str) else html
    s = F.decode(c, encoding)
    body = F.regexp_extract(s, r"(?s)<body[^>]*>(.*)</body>", 1)
    nos = F.regexp_replace(body, r"(?is)<script[^>]*>.*?</script>", " ")
    nos = F.regexp_replace(nos, r"(?is)<style[^>]*>.*?</style>", " ")
    blocks = F.split(nos, _BLOCK_TAG_SPLIT)

    def words_of(t: Column) -> Column:
        return F.when(F.length(t) == 0, F.lit(0)) \
                .otherwise(F.size(F.split(t, r"\s+")))

    def block_text(b: Column) -> Column:
        return F.trim(F.regexp_replace(
            F.regexp_replace(b, r"<[^>]+>", " "), r"\s+", " "))

    def anchor_words(b: Column) -> Column:
        anchors = F.regexp_extract_all(b, F.lit(r"(?is)<a[^>]*>(.*?)</a>"), 1)
        joined = block_text(F.array_join(anchors, " "))
        return words_of(joined)

    # strip each block ONCE (Catalyst does no CSE inside HOF lambdas —
    # the round-2 grams_zip lesson), then zip the stripped text back
    # with the raw block for the anchor scan
    texts = F.transform(blocks, block_text)
    scored = F.zip_with(texts, blocks, lambda t, b: F.struct(
        t.alias("t"),
        words_of(t).alias("w"),
        anchor_words(b).alias("aw"),
    ))
    nonempty = F.filter(scored, lambda x: x["w"] > 0)
    kept = F.filter(
        nonempty,
        lambda x: (x["w"] >= min_words)
        & (x["aw"] * 100 <= F.lit(max_link_density_pct) * x["w"]))
    boiler_words = (
        F.aggregate(nonempty, F.lit(0).cast("long"),
                    lambda acc, x: acc + x["w"])
        - F.aggregate(kept, F.lit(0).cast("long"),
                      lambda acc, x: acc + x["w"]))
    return [
        F.array_join(F.transform(kept, lambda x: x["t"]), " ")
         .alias("main_text"),
        F.size(nonempty).cast("long").alias("n_blocks"),
        F.size(kept).cast("long").alias("n_kept"),
        boiler_words.alias("n_boiler_words"),
    ]


def main_content(df, key: str = "doc_id", html: str = "html",
                 encoding: str = "UTF-8", min_words: int = 3,
                 max_link_density_pct: int = 34):
    """(key, main_text, n_blocks, n_kept, n_boiler_words) per page."""
    return df.select(
        F.col(key),
        *main_content_cols(F.col(html), encoding=encoding,
                           min_words=min_words,
                           max_link_density_pct=max_link_density_pct))


# ------------------------------------------- DSIR importance resampling
#
# Data Selection with Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169 — public paper): score every raw-corpus document by
# how much more likely its hashed n-gram features are under a TARGET
# corpus (the distribution you want more of — e.g. curated/high-quality
# pages) than under the raw corpus itself, then keep top-weight docs or
# Gumbel-sample proportionally to exp(weight). The standard pretraining
# data-selection method between "hand rules" (gopher_quality) and
# "trained classifier" (classifier_scores): no model, just two bucket
# histograms.
#
# Features are unigram+bigram occurrences hashed into ``n_buckets``
# (hash60 % B — portable to the SQL oracle); each corpus reduces to a
# B-row smoothed distribution, and a document's log importance weight
# is the sum of per-bucket log-likelihood ratios over its gram
# occurrences.
#
# Scale shape (the 10¹²-row story): the two distribution passes are
# map-side-combined counts whose exchanges carry O(B) rows; the B-row
# log-ratio frame BROADCASTS back onto the raw gram stream (explode is
# scan-stage — grams never shuffle); the per-doc sum partial-aggregates
# to one row per doc before its exchange. Nothing corpus-sized moves
# except O(docs) (key, weight) rows. Determinism: the ratio is computed
# from exact integer counts in one fixed expression, ln'd once, and
# round-scaled to BIGINT micro-units — the per-doc sum is integer
# arithmetic, order-independent (same contract as the PQ ADC kernel).


def _dsir_gram_stream(df, key: str, text: str):
    """(key, gram) — one row per unigram/bigram occurrence."""
    grams = F.concat(ngrams_col(text, 1), ngrams_col(text, 2))
    return (
        df.where(F.col(text).isNotNull())
        .select(F.col(key), F.explode(grams).alias("gram"))
        .where(F.length("gram") > 0)
    )


def dsir_bucket_ratios(raw, target, key: str = "doc_id",
                       text: str = "text", n_buckets: int = 1024,
                       scale: int = 1_000_000):
    """``(bucket, lr)`` — per-bucket log-likelihood ratio
    ln(p_target/p_raw) under add-one smoothing, round-scaled to integer
    micro-units. One row per bucket the raw corpus can actually hit
    (buckets outside the raw vocabulary can never be looked up).

    The smoothed ratio ((ct+1)/(Tt+B)) / ((cr+1)/(Tr+B)) is evaluated
    as one cross-multiplied expression with each factor cast to double
    first, so both engines run the identical IEEE op sequence."""
    from themis_spark.functions.hashing import hash60

    # a target with ZERO grams (empty frame, or all-null text) would
    # NULL the totals and silently zero every weight — fail loudly
    # instead (the limit(1) probe is a tiny driver-side job at plan
    # build; the _embedding_dim precedent documents the trade)
    if not _dsir_gram_stream(target, key, text).limit(1).count():
        raise ValueError("DSIR target corpus has no grams "
                         "(empty frame or all-null text)")
    bucket = (hash60(F.col("gram")) % n_buckets).alias("bucket")
    rb = (_dsir_gram_stream(raw, key, text).select(bucket)
          .groupBy("bucket").agg(F.count(F.lit(1)).alias("cr")))
    tb = (_dsir_gram_stream(target, key, text).select(bucket)
          .groupBy("bucket").agg(F.count(F.lit(1)).alias("ct")))
    tot_r = rb.agg(F.sum("cr").alias("__tr"))
    tot_t = tb.agg(F.sum("ct").alias("__tt"))
    ct = F.coalesce(F.col("ct"), F.lit(0).cast("long"))
    ratio = (
        ((ct + 1).cast("double") * (F.col("__tr") + n_buckets).cast("double"))
        / ((F.col("__tt") + n_buckets).cast("double")
           * (F.col("cr") + 1).cast("double"))
    )
    return (
        rb.join(tb, "bucket", "left")
        .crossJoin(F.broadcast(tot_r)).crossJoin(F.broadcast(tot_t))
        .select("bucket",
                F.round(F.log(ratio) * scale, 0).cast("long").alias("lr"))
    )


def dsir_weights(raw, target, key: str = "doc_id", text: str = "text",
                 n_buckets: int = 1024, round_to: int = 6,
                 scale: int = 1_000_000):
    """Per-document DSIR log importance weight: ``(key, n_grams,
    dsir_weight)`` for EVERY raw row (gramless docs — null/whitespace
    text — score a neutral 0). Positive = looks more like the target
    corpus than the raw average; the resampling signal."""
    lr = dsir_bucket_ratios(raw, target, key, text, n_buckets, scale)
    from themis_spark.functions.hashing import hash60

    bucket = (hash60(F.col("gram")) % n_buckets).alias("bucket")
    agg = (
        _dsir_gram_stream(raw, key, text).select(F.col(key), bucket)
        .join(F.broadcast(lr), "bucket")
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_grams"), F.sum("lr").alias("__w"))
    )
    return (
        raw.select(key).join(agg, key, "left")
        .select(
            key,
            F.coalesce(F.col("n_grams"), F.lit(0).cast("long")).alias("n_grams"),
            F.round(F.coalesce(F.col("__w"), F.lit(0).cast("long"))
                    / F.lit(float(scale)), round_to).alias("dsir_weight"),
        )
    )


def dsir_take(raw, target, k: int = 100, key: str = "doc_id",
              text: str = "text", n_buckets: int = 1024):
    """Top-k raw docs by DSIR weight (ties → key ascending) — the
    deterministic 'keep the most target-like k' selection.
    TakeOrderedAndProject: per-partition top-k, no full sort."""
    w = dsir_weights(raw, target, key, text, n_buckets)
    return w.orderBy(F.col("dsir_weight").desc(), F.col(key).asc()).limit(k)


def dsir_sample(raw, target, k: int = 100, key: str = "doc_id",
                text: str = "text", n_buckets: int = 1024,
                tau: float = 1.0, seed: int = 42, round_to: int = 6):
    """Gumbel-top-k importance sample: keeps k docs with probability
    proportional to exp(dsir_weight / tau) WITHOUT replacement — the
    paper's resampling step, derandomized. The Gumbel noise is
    hash-derived (seeded md5 → uniform in (0,1) → -ln(-ln u)), so the
    'random' sample is deterministic, resume-safe, and replayable by
    the SQL oracle. tau tempers: large tau → uniform, small tau →
    argmax-like."""
    from themis_spark.functions.hashing import hash60_seeded

    w = dsir_weights(raw, target, key, text, n_buckets)
    u = (hash60_seeded(F.col(key), seed) + F.lit(0.5)) / F.lit(float(1 << 60))
    gumbel = -F.log(-F.log(u))
    skey = F.round(F.col("dsir_weight") / tau + gumbel, round_to)
    return (
        w.select("*", skey.alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), F.col(key).asc()).limit(k)
    )


# ------------------------------------------- unigram LM tokenizer
#
# The SentencePiece-family complement of BPE (Kudo 2018,
# arXiv:1804.10959 — public): a vocabulary of PIECES with unigram
# log-probabilities; tokenization is the Viterbi segmentation
# maximizing the summed piece logprob. Deployment shape mirrors BPE
# exactly (train_bpe_merges): TRAINING is driver-side on a
# deterministic hash sample — it needs global corpus statistics a
# sample estimates fine — while APPLICATION is the distributed Arrow
# kernel. Logprobs are integer micro-units end to end, so Viterbi
# scores are exact integer sums: deterministic across engines and
# replayable by a relational DP oracle.


def train_unigram_vocab(df, text: str = "text", vocab_size: int = 120,
                        sample_docs: int = 1000, max_piece_len: int = 6,
                        seed_size: int = 1200, em_iters: int = 2,
                        prune_keep: float = 0.75):
    """EM-trained unigram piece vocabulary → ``[(piece, lp_micro)]``
    (lp_micro = round(ln p × 10⁶), ints). Seed = frequent substrings up
    to ``max_piece_len`` + every single char; rounds of lattice EM
    (forward-backward expected counts, log-domain) alternate with
    pruning the lowest-expected-count pieces (chars are never pruned)
    until ``vocab_size``. All ties break lexicographically —
    deterministic for a given sample."""
    import math
    from collections import Counter

    from themis_spark.functions.hashing import hash60

    rows = (df.select(F.col(text).alias("t"))
            .where(F.col(text).isNotNull())
            .orderBy(hash60(F.col(text)), F.col(text))
            .limit(sample_docs).collect())
    word_counts: Counter = Counter()
    for r in rows:
        word_counts.update(r["t"].lower().split())
    if not word_counts:
        raise ValueError("empty training sample")

    sub_counts: Counter = Counter()
    chars: set[str] = set()
    for w, cnt in word_counts.items():
        chars.update(w)
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_piece_len, len(w)) + 1):
                sub_counts[w[i:j]] += cnt
    multi = [p for p in sub_counts if len(p) > 1 and sub_counts[p] >= 2]
    multi.sort(key=lambda p: (-sub_counts[p], p))
    pieces = sorted(chars) + multi[:max(seed_size - len(chars), 0)]
    probs = {p: sub_counts[p] for p in pieces}
    total = sum(probs.values())
    probs = {p: c / total for p, c in probs.items()}

    def em_round() -> dict[str, float]:
        # lattice forward-backward per distinct word, log-domain
        expected: dict[str, float] = {p: 0.0 for p in probs}
        lp = {p: math.log(v) for p, v in probs.items()}
        for w, cnt in sorted(word_counts.items()):
            n = len(w)
            alpha = [float("-inf")] * (n + 1)
            alpha[0] = 0.0
            for i in range(1, n + 1):
                acc = []
                for j in range(max(0, i - max_piece_len), i):
                    piece = w[j:i]
                    if piece in lp and alpha[j] > float("-inf"):
                        acc.append(alpha[j] + lp[piece])
                if acc:
                    m = max(acc)
                    alpha[i] = m + math.log(sum(math.exp(a - m) for a in acc))
            if alpha[n] == float("-inf"):
                continue
            beta = [float("-inf")] * (n + 1)
            beta[n] = 0.0
            for i in range(n - 1, -1, -1):
                acc = []
                for j in range(i + 1, min(i + max_piece_len, n) + 1):
                    piece = w[i:j]
                    if piece in lp and beta[j] > float("-inf"):
                        acc.append(lp[piece] + beta[j])
                if acc:
                    m = max(acc)
                    beta[i] = m + math.log(sum(math.exp(a - m) for a in acc))
            for i in range(n):
                for j in range(i + 1, min(i + max_piece_len, n) + 1):
                    piece = w[i:j]
                    if piece in lp and alpha[i] > float("-inf") \
                            and beta[j] > float("-inf"):
                        post = math.exp(alpha[i] + lp[piece] + beta[j]
                                        - alpha[n])
                        expected[piece] += cnt * post
        # Laplace smoothing over the current vocab: single chars must
        # never collapse to ~zero (they are the fallback path for every
        # out-of-sample word), and additive alpha bounds every piece
        # away from underflow across EM x prune rounds
        alpha = 0.1
        tot = sum(expected.values()) + alpha * len(expected)
        return {p: (e + alpha) / tot for p, e in expected.items()}

    while True:
        for _ in range(em_iters):
            probs = em_round()
        n_multi = sum(1 for p in probs if len(p) > 1)
        target_multi = vocab_size - len([p for p in probs if len(p) == 1])
        if n_multi <= max(target_multi, 0):
            break
        keep = max(int(n_multi * prune_keep), max(target_multi, 0))
        ranked = sorted((p for p in probs if len(p) > 1),
                        key=lambda p: (-probs[p], p))
        kept = set(ranked[:keep]) | {p for p in probs if len(p) == 1}
        probs = {p: v for p, v in probs.items() if p in kept}
        s = sum(probs.values())
        probs = {p: v / s for p, v in probs.items()}
    return sorted(
        ((p, int(round(math.log(v) * 1_000_000))) for p, v in probs.items()),
        key=lambda t: t[0])


#: Viterbi score for an unknown single char — below any trained piece
UNIGRAM_UNK_LP = -20_000_000


def unigram_viterbi(word: str, vocab: dict[str, int],
                    max_piece_len: int = 6,
                    unk_lp: int = UNIGRAM_UNK_LP):
    """Optimal segmentation of one word → (pieces, score_micro).
    Integer DP; cell ties break by (higher score, fewer pieces,
    longest piece last) — the exact order the SQL oracle replays."""
    n = len(word)
    NEG = float("-inf")
    best: list[tuple] = [(0, 0, -1)] + [(NEG, 0, -1)] * n  # (score, npieces, backptr)
    for i in range(1, n + 1):
        cand = []
        for j in range(max(0, i - max_piece_len), i):
            if best[j][0] == NEG:
                continue
            piece = word[j:i]
            lp = vocab.get(piece)
            if lp is None:
                if i - j != 1:
                    continue
                lp = unk_lp
            cand.append((best[j][0] + lp, best[j][1] + 1, j))
        if cand:
            # score DESC, npieces ASC, j ASC (smallest j = longest piece
            # ending here) — exactly the oracle's ORDER BY
            best[i] = min(cand, key=lambda c: (-c[0], c[1], c[2]))
    if best[n][0] == NEG:
        return [], 0
    pieces = []
    i = n
    while i > 0:
        j = best[i][2]
        pieces.append(word[j:i])
        i = j
    return pieces[::-1], int(best[n][0])


def unigram_tokenize_arrow(df, vocab: list, key: str = "doc_id",
                           text: str = "text", max_piece_len: int = 6,
                           unk_lp: int = UNIGRAM_UNK_LP):
    """Distributed Viterbi application: ``(key, tokens, n_pieces,
    score_micro)`` per doc. Arrow batches via mapInPandas (the DP is
    per-word Python — same production regime as bpe_tokenize_arrow);
    the vocab ships in the closure (O(vocab) bytes, like a broadcast).
    Null/empty docs yield empty tokens and score 0.

    Word boundary = ASCII whitespace only (``[ \\t\\n\\r\\f\\x0b]+``),
    matching the Java-regex ``\\s+`` the Spark-side eligibility filter
    and the SQL oracle both use — NOT Python ``str.split()``, which
    also splits on Unicode spaces (U+00A0 etc., common in crawl text)
    and would tokenize such docs differently from the oracle DP."""
    import re
    from collections.abc import Iterator as _It

    vd = dict(vocab)
    ws = re.compile(r"[ \t\n\r\f\x0b]+")
    out_schema = (f"{key} long, tokens array<string>, "
                  "n_pieces int, score_micro long")

    import pandas as pd  # executor-side closure import

    def kernel(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        memo: dict[str, tuple] = {}
        for pdf in batches:
            toks_col, np_col, sc_col = [], [], []
            for t in pdf[text]:
                toks: list[str] = []
                score = 0
                if t is not None:
                    for w in ws.split(str(t).lower()):
                        if not w:
                            continue
                        got = memo.get(w)
                        if got is None:
                            got = memo[w] = unigram_viterbi(
                                w, vd, max_piece_len, unk_lp)
                        toks.extend(got[0])
                        score += got[1]
                toks_col.append(toks)
                np_col.append(len(toks))
                sc_col.append(score)
            yield pd.DataFrame({key: pdf[key], "tokens": toks_col,
                                "n_pieces": np_col, "score_micro": sc_col})

    return df.select(key, text).mapInPandas(kernel, out_schema)


# ------------------------------------------------- sentence segmentation
#
# Sentence-level spans feed finer-granularity dedup and packing than
# whole docs (and RAG passage indexes). The boundary rule is the
# portable subset of sentence splitting: terminator [.!?]+ followed by
# whitespace ends a sentence. Implemented WITHOUT lookbehind (RE2 — the
# oracle engine — has none): one regexp_replace plants a sentinel after
# the terminator, one split. Scan-stage native, zero shuffle.


def sentence_spans(df, key: str = "doc_id", text: str = "text"):
    """(key, sent_idx, sentence, n_words) — one row per sentence,
    sent_idx 0-based in document order. Empty/whitespace fragments are
    dropped; sentences keep their terminator. posexplode is map-side;
    the plan has no exchange (asserted in tests)."""
    c = F.col(text)
    marked = F.regexp_replace(c, r"([.!?])\s+", "$1\u001f")
    sents = F.split(marked, "\u001f")
    return (
        df.where(c.isNotNull())
        .select(F.col(key), F.posexplode(sents).alias("sent_idx", "sentence"))
        .where(F.length(F.trim(F.col("sentence"))) > 0)
        .select(
            key, "sent_idx", "sentence",
            F.size(F.split(F.trim(F.col("sentence")), r"\s+"))
            .cast("int").alias("n_words"),
        )
    )


# --------------------------------------------------- PMI collocations
#
# Pointwise mutual information over adjacent word pairs (Church &
# Hanks 1990 — public): the corpus-statistics collocation extractor
# ("new york", "machine learning" rank far above chance). Counts come
# from two explode->agg streams (bigram and unigram); the PMI itself is
# one fixed-order double expression over exact integer counts, rounded
# to 6 dp — cross-engine deterministic like the unigram/bigram LMs.


def collocations(df, text: str = "text", min_count: int = 5,
                 k: int = 50, round_to: int = 6):
    """Top-k adjacent-pair collocations by PMI: ``(a, b, c_ab, pmi)``,
    ties broken on (a, b) ascending. PMI = ln(p(ab) / (p(a)p(b))) with
    p(ab) over the bigram total and p(a) over the token total —
    evaluated as one cross-multiplied expression with every factor cast
    to double first (identical IEEE op order on both engines).

    Plan: the tokenizer runs once per stream (bigram + unigram — two
    scan-stage explodes); the aggregations partial-combine map-side, so
    exchanges carry distinct grams, and the two total counts ride in as
    broadcast one-row aggregates. Top-k is TakeOrderedAndProject."""
    toks = F.split(F.trim(F.lower(F.col(text))), r"\s+")
    base = df.where(F.col(text).isNotNull())
    uni = (base.select(F.explode(toks).alias("w"))
           .where(F.length("w") > 0)
           .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    bi_all = (base.where(F.size(toks) >= 2)  # grams_zip guard: len > 0
              .select(F.explode(grams_zip(toks, 2)).alias("g"))
              .select(F.split("g", " ").alias("p"))
              .where((F.length(F.element_at("p", 1)) > 0)
                     & (F.length(F.element_at("p", 2)) > 0))
              .select(F.element_at("p", 1).alias("a"),
                      F.element_at("p", 2).alias("b"))
              .groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab")))
    bi = bi_all.where(F.col("c_ab") >= min_count)
    nt = uni.agg(F.sum("c").alias("__nt"))
    # p(ab) normalizer = the TRUE bigram total (pre-min_count filter);
    # normalizing by the filtered total would uniformly inflate every
    # PMI by ln(total/filtered_total) — ranking-safe but wrong as PMI
    nb = bi_all.agg(F.sum("c_ab").alias("__nb"))
    ua = uni.select(F.col("w").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("b"), F.col("c").alias("c_b"))
    pmi = F.round(F.log(
        (F.col("c_ab").cast("double") * F.col("__nt").cast("double")
         * F.col("__nt").cast("double"))
        / (F.col("__nb").cast("double") * F.col("c_a").cast("double")
           * F.col("c_b").cast("double"))), round_to)
    return (
        bi.join(ua, "a").join(ub, "b")
        .crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(nb))
        .select("a", "b", "c_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(k)
    )

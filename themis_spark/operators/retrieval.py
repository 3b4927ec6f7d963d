"""Full-text retrieval over the corpus: BM25 ranking + term lookup.

The missing piece between the dedup/quality families and a usable
curation loop: "show me the documents matching this probe query" is how
operators audit what a filter kept or a dedup pass dropped, and ranked
retrieval over the corpus's own statistics (BM25: Robertson &
Spärck Jones probabilistic relevance framework, the BM25 variant with
the +1-smoothed idf from Lucene) needs no trained model — exactly the
regime of this engine's other corpus-statistics operators
(SURVEY.md §2 LLM-pipeline rows; tf·idf precedent: text.py
tfidf_top_terms).

Scale posture (100 TB corpus, handful-to-thousands of queries):

* The query side is tiny by construction and BROADCASTS into the scan
  stage as a semi-filter on the token explode, so the tf aggregation —
  the only corpus-scale exchange — carries matching postings only,
  never the full (doc, term) inverted index. Document length is a
  scan-stage expression; corpus size/avgdl is a 1-row agg.
* Top-k per query is a rank window AFTER the score aggregation, where
  the frame is already only matched (query, doc) pairs;
  WindowGroupLimit prunes per-task before the per-query exchange.

Everything is native column expressions — no Python in the plan — and
every arithmetic step (ln, double mul/add, round) replays bit-for-bit
in the DuckDB oracle at round_to=6 (same convention as text_unigram's
summed logprobs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(df: DataFrame, key: str, text: str) -> DataFrame:
    """(key, token) exploded lowercase whitespace tokens — identical
    tokenization to text._doc_tokens (shared convention so retrieval
    scores line up with the vocabulary/LM operators)."""
    c = F.col(text)
    return (
        df.where(c.isNotNull())
        .select(F.col(key),
                F.explode(F.split(F.trim(F.lower(c)), r"\s+")).alias("token"))
        .where(F.length("token") > 0)
    )


def corpus_term_stats(df: DataFrame, key: str = "doc_id",
                      text: str = "text") -> tuple[DataFrame, DataFrame]:
    """One-pass corpus statistics for ranked retrieval.

    Returns ``(tf, meta)``:

    * ``tf`` — ``(key, token, tf, dl)``: term frequency per (doc, term)
      with the document's token count ``dl`` carried on every row (a
      window-free self-join on ``key`` against the per-doc sums; the
      join is on the same key the tf aggregation just hashed, so AQE
      plans it without a further corpus exchange worth the name).
    * ``meta`` — a ONE-ROW frame ``(n_docs, avgdl)`` to broadcast into
      the scoring expression (no driver-side count()).
    """
    toks = _tokens(df, key, text)
    tf = toks.groupBy(key, "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(key).agg(F.sum("tf").alias("dl"))
    tf = tf.join(dl, key)
    meta = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                  F.avg(F.col("dl").cast("double")).alias("avgdl"))
    return tf, meta


def bm25_topk(docs: DataFrame, queries: DataFrame,
              key: str = "doc_id", text: str = "text",
              qkey: str = "query_id", qtext: str = "query",
              k: int = 5, k1: float = 1.2, b: float = 0.75,
              round_to: int = 6) -> DataFrame:
    """Top-k documents per query under BM25.

    ``score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
    with the Lucene-style non-negative idf
    ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))``.

    Query terms are DISTINCT per query (BM25 over unique terms — a
    repeated probe word does not double-count). Returns
    ``(qkey, key, score, rank)`` with rank 1..k per query; ties break
    on the rounded score then ascending doc key (total order —
    deterministic under any partitioning, oracle-replayable).

    Plan shape: the query-term set broadcast-filters the token explode
    IN THE SCAN STAGE (tf restricted to query terms is still exact —
    every occurrence of a matching term survives), so the only
    corpus-scale exchange carries MATCHING postings, not the full
    inverted index; document length is a scan-stage expression
    (size(split)), not a join; df is a count window over the filtered
    postings (a groupBy-and-rejoin would re-execute the scan subtree —
    a second corpus scan); corpus size/avgdl is a 1-row agg over a
    text-column-pruned scan. Then the per-(query, doc) sum and a
    per-query rank window that WindowGroupLimit prunes per task.
    Nothing in the plan is O(corpus × queries) or O(vocabulary).
    """
    from pyspark.sql.window import Window

    c = F.col(text)
    toks_arr = F.split(F.trim(F.lower(c)), r"\s+")
    base = (
        docs.where(c.isNotNull())
        .select(F.col(key),
                F.size(toks_arr).alias("dl"),
                F.explode(toks_arr).alias("token"))
        .where(F.length("token") > 0)
    )
    # corpus size + average length: a 1-row partial agg over a scan
    # that prunes to the text column — no exchange beyond the
    # single-row combine (dl here is the scan-stage token count, so it
    # exists before any aggregation)
    meta = (
        docs.where(c.isNotNull())
        .select(F.size(toks_arr).alias("__dl"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.avg(F.col("__dl").cast("double")).alias("avgdl"))
    )

    qterms = _tokens(queries, qkey, qtext).distinct()
    # the broadcast semi-filter runs IN THE SCAN STAGE, before any
    # exchange: tf over query terms only is still the exact tf (every
    # occurrence of a matching term survives the filter), so the only
    # corpus-scale shuffle carries matching postings, not the full
    # inverted index
    hit = base.join(F.broadcast(qterms.select("token").distinct()), "token")
    tf = hit.groupBy(key, "token").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    # df(t) = docs containing t — a count window over the filtered
    # postings (one row per matching (doc, term)). A window, not a
    # groupBy-and-rejoin: the rejoin would re-execute the whole
    # scan+filter subtree (a second corpus scan); the window reuses
    # the postings already in hand (they are query-sized post-filter)
    tf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("token")))

    n = F.col("n_docs").cast("double")
    idf = F.log(F.lit(1.0) + (n - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    tf_d = F.col("tf").cast("double")
    norm = tf_d * F.lit(k1 + 1.0) / (
        tf_d + F.lit(k1) * (F.lit(1.0 - b)
                            + F.lit(b) * F.col("dl").cast("double")
                            / F.col("avgdl")))

    matched = (
        tf.join(F.broadcast(qterms), "token")
        .join(F.broadcast(meta))
        .select(F.col(qkey), F.col(key), (idf * norm).alias("__part"))
    )
    scored = matched.groupBy(qkey, key).agg(
        F.round(F.sum("__part"), round_to).alias("score"))
    w = Window.partitionBy(qkey).orderBy(F.desc("score"), F.asc(key))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def term_postings(docs: DataFrame, terms: list[str],
                  key: str = "doc_id", text: str = "text") -> DataFrame:
    """Posting lists for a literal term set: ``(token, key, tf)`` for
    every corpus document containing any of ``terms`` — the exact-match
    audit probe ("which documents still contain this boilerplate
    marker after cleaning?").

    The term set is a broadcast literal array; the filter sits in the
    same stage as the token explode, so only matching postings survive
    the scan stage. One aggregation exchange keyed (token, doc).
    """
    toks = _tokens(docs, key, text)
    lit_terms = F.array(*[F.lit(t.lower()) for t in terms])
    return (
        toks.where(F.array_contains(lit_terms, F.col("token")))
        .groupBy("token", key).agg(F.count(F.lit(1)).alias("tf"))
    )

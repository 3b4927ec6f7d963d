"""End-to-end corpus curation recipe: the composition story for the
web-pipeline operators (the CCNet / Gopher / FineWeb shape):

    blocklist -> text quality rules -> classifier -> exact dedup
    -> near-dup (MinHash-LSH) -> sequence packing

Everything before dedup is ONE conjunctive scan-stage predicate (the
operators all compile to native Columns), so the filter front costs a
single pass with zero shuffle; the dedup stages shuffle only digests and
banded signatures; packing adds its one bucket exchange. `curate()`
returns the survivors plus the funnel report that attributes every
SCAN-RULE drop to the first rule that rejected it; classifier and
dedup drops are not in the funnel (counting them would force an extra
full recomputation per stage) — reconcile those as
`count(rule survivors) - count(final survivors)` if a run needs the
complete ledger.

This module adds no new operator semantics — it is the documented,
tested composition of existing ones (each oracle-backed individually).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class CurationConfig:
    url: str = "url"
    key: str = "doc_id"
    text: str = "text"
    blocked_hosts: list[str] = field(default_factory=list)
    blocked_path_prefixes: list[str] = field(default_factory=list)
    min_tokens: int = 10
    max_tokens: int = 100_000
    classifier_weights: list[float] | None = None  # None = skip the stage
    classifier_bias: float = 0.0
    near_dup: bool = True
    num_hashes: int = 12
    bands: int = 6
    jaccard_threshold: float = 0.5
    ctx_len: int = 2048
    pack_buckets: int = 64


def _filter_rules(cfg: CurationConfig) -> list[tuple[str, Column]]:
    """The scan-stage rule list, in published funnel order. Each rule is
    a native Column predicate; NULL evaluates as a failure (the
    filter_funnel contract)."""
    from themis_spark.operators.text import gopher_quality_cols, token_count_col

    from themis_spark.operators.web import blocked_col

    rules: list[tuple[str, Column]] = []
    if cfg.blocked_hosts or cfg.blocked_path_prefixes:
        rules.append(("blocklist", ~blocked_col(
            F.col(cfg.url), cfg.blocked_hosts, cfg.blocked_path_prefixes)))
    toks = token_count_col(F.col(cfg.text))
    rules.append(("length", toks.between(cfg.min_tokens, cfg.max_tokens)))
    # gopher_quality_cols emits VALUE columns in a fixed order
    # (n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
    # stopword_hits, gopher_pass); the funnel applies the published
    # bounds to two of them — the length band above covers word count
    g = gopher_quality_cols(F.col(cfg.text))
    rules.append(("gopher_symbols", g[2] <= 0.1))
    rules.append(("gopher_alpha", g[3] >= 0.8))
    return rules


def curate(df: DataFrame, cfg: CurationConfig | None = None) -> dict:
    """Run the full curation funnel. Returns a dict:

    * ``survivors`` — the curated DataFrame (original columns +
      ``n_tokens``), exact- and near-dup-free, classifier-passing;
    * ``funnel`` — the scan-stage drop report (one row per rule,
      first-fail attribution);
    * ``packing`` — per-bucket packing summary for the survivors at
      ``cfg.ctx_len`` (chunks + tail waste).

    Plan shape: rules fold into one scan; the classifier stage is a
    further scan-stage projection (weights are a plan literal); exact
    dedup shuffles (digest) once; LSH near-dup shuffles banded
    signatures once (capped buckets); packing adds its single bucket
    exchange. Nothing in the funnel collects to the driver except the
    funnel's own ≤(rules+1)-row count aggregate."""
    from themis_spark.operators.dedup import exact_duplicates, lsh_verified_pairs
    from themis_spark.operators.stats import pack_summary
    from themis_spark.operators.text import (
        apply_filters,
        filter_funnel,
        token_count_col,
        with_classifier_scores,
    )

    cfg = cfg or CurationConfig()
    rules = _filter_rules(cfg)
    funnel = filter_funnel(df, rules)
    kept = apply_filters(df, rules)

    if cfg.classifier_weights is not None:
        # frame-preserving form: scores ride the SAME scan as the rules
        # (no key semi-join, no second pass over the corpus)
        kept = (
            with_classifier_scores(
                kept, text=cfg.text,
                weights=cfg.classifier_weights, bias=cfg.classifier_bias)
            .where(F.coalesce(F.col("clf_label"), F.lit(False)))
            .drop("clf_n_tokens", "clf_logit", "clf_label")
        )

    # exact dedup: drop every row of a digest group except its min key
    dups = exact_duplicates(kept, key=cfg.key, text=cfg.text)
    losers = (dups.select(F.explode("members").alias(cfg.key), "keep_key")
              .where(F.col(cfg.key) != F.col("keep_key")).select(cfg.key))
    kept = kept.join(losers, cfg.key, "left_anti")

    if cfg.near_dup:
        pairs = lsh_verified_pairs(
            kept, key=cfg.key, text=cfg.text, num_hashes=cfg.num_hashes,
            bands=cfg.bands, threshold=cfg.jaccard_threshold)
        near_losers = pairs.select(F.col("b_key").alias(cfg.key)).distinct()
        kept = kept.join(near_losers, cfg.key, "left_anti")

    survivors = kept.withColumn(
        "n_tokens", token_count_col(F.col(cfg.text)).cast("long"))
    packing = pack_summary(survivors, key=cfg.key, tokens="n_tokens",
                           ctx_len=cfg.ctx_len, buckets=cfg.pack_buckets)
    return {"survivors": survivors, "funnel": funnel, "packing": packing}


def incremental_validate(
    new_df: DataFrame,
    old_digests: DataFrame,
    old_verdicts: DataFrame,
    plan,
    key: str = "url",
    digest: Column | None = None,
) -> DataFrame:
    """Incremental revalidation of a new crawl snapshot: validate ONLY
    the rows :func:`~themis_spark.operators.web.snapshot_diff` marks
    ``added``/``changed``, carry the cached verdict for ``unchanged``
    rows, drop ``removed`` keys — output
    ``(key, n_violations, revalidated)`` for exactly the new snapshot's
    keys, provably equal to validating the whole new crawl (validation
    is a pure per-row function, so an unchanged digest implies an
    unchanged verdict — PROVIDED ``digest`` covers every column the
    plan validates; that contract is the caller's).

    Inputs: ``old_digests`` = ``(key, content_digest)`` of the prior
    crawl; ``old_verdicts`` = ``(key, n_violations)`` cached from the
    prior run; ``plan`` = a CompiledPlan built against ``new_df``'s
    schema; ``digest`` = the content-digest Column evaluated on
    ``new_df`` (e.g. ``hashing.hash60(concat of validated cols)``) —
    required, no default, because guessing the covered column set is
    exactly the bug this operator must not have.

    Input contracts (inherited from snapshot_diff + the cache): every
    side is key-unique (consolidate multi-revision crawls with
    ``latest_revisions`` first), and ``old_verdicts`` covers every key
    of ``old_digests`` — a key cached as unchanged but absent from the
    verdict cache would silently drop from the output (the prior run's
    own output satisfies this by construction).

    Plan shape (the 10¹²-row payoff): the diff is snapshot_diff's ONE
    fixed-width exchange; the expensive validation pass runs over the
    added+changed slice only (typically ~1% of a crawl), reached by an
    equi-join that AQE broadcasts when the slice is small; carried
    verdicts join on the same key. Total heavy-column movement is
    O(changed rows), not O(crawl).
    """
    from themis_spark.operators.web import snapshot_diff

    if digest is None:
        raise ValueError(
            "digest is required: pass the content-digest Column covering "
            "every column the plan validates")
    new_digests = new_df.select(F.col(key), digest.alias("content_digest"))
    diff = snapshot_diff(old_digests, new_digests, key=key,
                         digest="content_digest")
    unchanged = diff.where(F.col("status") == "unchanged").select(key)
    carried = (
        old_verdicts.join(unchanged, key)
        .select(F.col(key),
                F.col("n_violations").cast("long").alias("n_violations"),
                F.lit(False).alias("revalidated"))
    )
    todo = diff.where(F.col("status").isin("added", "changed")).select(key)
    fresh = (
        new_df.join(todo, key)
        .select(F.col(key),
                F.size(plan.violations_col()).cast("long")
                .alias("n_violations"),
                F.lit(True).alias("revalidated"))
    )
    return carried.unionByName(fresh)

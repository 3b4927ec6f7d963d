"""PII detection and redaction for web-text training pipelines.

A training-data pipeline over Common-Crawl-style pages must find and
scrub personally identifiable information before the text reaches a
model. This module provides the standard regex family (email, IPv4,
US-phone, SSN-shaped, credit-card-shaped) as pure native Column
expressions — ``regexp_extract_all`` / ``regexp_replace`` run JVM-side
inside whole-stage codegen at the scan stage, zero shuffle and zero
Python, so at 100 TB the cost is one pass over the ``text`` column and
nothing else.

Every pattern is written in the RE2-compatible subset (no backrefs, no
lookaround) so the DuckDB oracle replays detection and redaction
byte-identically, and so a swap to pyarrow.compute (RE2) on the Arrow
path needs no dialect triage.

Reference parity: the themis reference validates documents but has no
scrubbing pass (SURVEY.md §2(b) note on pipeline ops); this operator
belongs to the LLM-data-pipeline family the engine adds on top
(SURVEY.md §2(c)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered dict: redaction applies patterns in this order, so composite
# shapes (credit-card before phone before bare IPv4) are consumed by the
# most specific pattern first and never double-redacted.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — conservative RFC-5322 subset
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # 4-4-4-4 groups with space or dash separators
    "ccn": r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b",
    # US SSN shape 3-2-4
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    # US phone shape 3-3-4 with -, . or space separators
    "phone": r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
    # dotted quad (syntactic — no 0-255 range check, matching the usual
    # scrubber behavior of over-matching rather than leaking)
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count_col(text: Column | str, kind: str) -> Column:
    """Occurrence count of one PII kind (native, scan-stage)."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(PII_PATTERNS[kind]), 0))


def pii_counts_cols(text: Column | str) -> list[Column]:
    """One count column per PII kind plus a ``has_pii`` flag, all
    aliased ``n_<kind>`` for the oracle contract."""
    counts = [pii_count_col(text, k).alias(f"n_{k}") for k in PII_PATTERNS]
    any_pii = None
    for k in PII_PATTERNS:
        p = pii_count_col(text, k) > 0
        any_pii = p if any_pii is None else (any_pii | p)
    return counts + [any_pii.alias("has_pii")]


def redact_pii_col(text: Column | str, token_fmt: str = "<{kind}>") -> Column:
    """Replace every PII match with a typed placeholder (``<EMAIL>``,
    ``<CCN>``, …). Chained native ``regexp_replace`` — Catalyst folds the
    chain into one projection; order follows ``PII_PATTERNS`` so the
    most specific shape wins."""
    out = _c(text)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, token_fmt.format(kind=kind.upper()))
    return out


def pii_flags(df: DataFrame, text: str = "text", keep: list[str] | None = None) -> DataFrame:
    """Per-row PII counts. ``keep`` columns are carried through."""
    keep = keep if keep is not None else [c for c in df.columns if c != text]
    return df.select(*keep, *pii_counts_cols(text))


def redact(df: DataFrame, text: str = "text", out: str = "clean_text") -> DataFrame:
    """Per-row redaction; adds ``out`` plus an ``n_redacted`` count
    (chars removed is not meaningful across placeholder widths, so the
    count is match occurrences across all kinds)."""
    total = None
    for k in PII_PATTERNS:
        c = pii_count_col(F.col(text), k)
        total = c if total is None else (total + c)
    return df.withColumn(out, redact_pii_col(text)).withColumn("n_redacted", total)


def pii_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Corpus-level scrub report: one row — per-kind totals plus the
    count and fraction of documents containing any PII. Single
    aggregation, map-side partials, O(kinds) result row."""
    flags = df.select(*pii_counts_cols(text))
    aggs = [F.sum(f"n_{k}").alias(f"total_{k}") for k in PII_PATTERNS]
    aggs.append(F.sum(F.col("has_pii").cast("long")).alias("docs_with_pii"))
    aggs.append(F.count(F.lit(1)).alias("n_docs"))
    return flags.agg(*aggs).select(
        "*",
        F.round(F.col("docs_with_pii") / F.greatest(F.col("n_docs"), F.lit(1)), 6)
        .alias("pii_doc_frac"),
    )

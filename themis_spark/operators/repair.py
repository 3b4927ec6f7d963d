"""Schema-driven repair: the fix-up counterpart to validation.

Validation says which rows are wrong; pipelines also want the standard
mechanical remedies applied in one pass: coerce mistyped columns
(``"42"`` → 42) via ``try_cast``, fill absent values from schema
``default``s, and optionally clamp numerics into declared
``minimum``/``maximum`` bounds — plus an auditable per-column report of
how many values each remedy touched (a repair that silently rewrites
data is worse than no repair).

Everything compiles from the same draft-4 schema the validator uses
(``properties.{type, default, minimum, maximum}``). All remedies are
native Column expressions (scan-stage, codegen, zero shuffle); the
report is ONE aggregation over the same scan. Like ``default``
insertion in plans/compiler.py, input tables are never mutated — the
repaired frame is a projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPE_MAP = {
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
}


def _remedies(df: DataFrame, schema: dict, clamp: bool):
    """Per repaired column: (name, fixed Column, flag Columns dict)."""
    out = []
    for name, node in (schema.get("properties") or {}).items():
        if name not in df.columns or not isinstance(node, dict):
            continue
        cur = df.schema[name].dataType
        col = F.col(name)
        flags: dict[str, Column] = {}

        want = node.get("type")
        target = _TYPE_MAP.get(want) if isinstance(want, str) else None
        if target is not None and cur != target:
            fixed = col.try_cast(target)
            flags["coerced"] = (col.isNotNull() & fixed.isNotNull()).cast("long")
            flags["uncoercible"] = (col.isNotNull() & fixed.isNull()).cast("long")
            col = fixed

        if "default" in node:
            flags["defaulted"] = col.isNull().cast("long")
            col = F.coalesce(col, F.lit(node["default"]))

        if clamp and isinstance(node.get("minimum"), (int, float)):
            lo = F.lit(node["minimum"])
            flags["clamped_lo"] = (col < lo).cast("long")
            col = F.when(col < lo, lo).otherwise(col)
        if clamp and isinstance(node.get("maximum"), (int, float)):
            hi = F.lit(node["maximum"])
            flags["clamped_hi"] = (col > hi).cast("long")
            col = F.when(col > hi, hi).otherwise(col)

        if flags:
            out.append((name, col, flags))
    return out


def repair_table(df: DataFrame, schema: dict,
                 clamp: bool = False) -> DataFrame:
    """The repaired frame: every repairable column replaced by its
    fixed expression, all other columns untouched. A pure projection —
    fuses into whatever scan/filter precedes it."""
    fixed = {name: col for name, col, _ in _remedies(df, schema, clamp)}
    return df.select(
        *[fixed[c].alias(c) if c in fixed else F.col(c) for c in df.columns])


def repair_report(df: DataFrame, schema: dict,
                  clamp: bool = False) -> DataFrame:
    """Audit counts: ``(column, remedy, n)`` — how many values each
    remedy touched (coerced / uncoercible / defaulted / clamped_lo /
    clamped_hi). ONE aggregation; the reshape to rows happens on the
    single aggregated row."""
    aggs, labels = [], []
    for name, _col, flags in _remedies(df, schema, clamp):
        for remedy, flag in flags.items():
            aggs.append(F.sum(flag).alias(f"f{len(labels)}"))
            labels.append((name, remedy))
    if not aggs:
        raise ValueError("schema has no repairable properties for this table")
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', '{r}', coalesce(f{i}, 0L)" for i, (c, r) in enumerate(labels))
    return wide.selectExpr(
        f"stack({len(labels)}, {stack}) AS (column, remedy, n)")


# --------------------------------------------------------- mojibake
#
# The classic crawl-text corruption: UTF-8 bytes misdecoded as
# Latin-1/Windows-1252 somewhere upstream ("it\u2019s" -> "it\u00e2\u20ac\u2122s",
# "caf\u00e9" -> "caf\u00c3\u00a9"). The repair is the inverse round trip —
# re-encode the mangled string to its original bytes and decode them as
# UTF-8 — and it runs ENTIRELY native: Spark's encode/decode only speak
# the ISO-8859-1 family, so the 27 printable Windows-1252-specific
# characters are first mapped to their byte-equivalent U+0080–U+009F
# controls with one translate() — after which Latin-1 encoding
# reproduces the exact original byte stream for BOTH mojibake flavors
# (cp1252-printed and latin-1-control).
#
# Fail-safe by construction: the repair is only applied where (a) a
# mojibake marker pattern fired, (b) every character survives Latin-1
# encoding (no char > U+00FF after the translate — mixed CJK rows pass
# through untouched), (c) the re-decoded bytes are valid UTF-8 (no
# U+FFFD replacement), and (d) the text actually changed. Everything
# else passes through byte-identical.

#: printable Windows-1252 chars at 0x80-0x9F and their byte values
#: (undefined positions 81 8D 8F 90 9D omitted)
_CP1252_PRINTED = ("\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6"
                   "\u2030\u0160\u2039\u0152\u017d\u2018\u2019\u201c"
                   "\u201d\u2022\u2013\u2014\u02dc\u2122\u0161\u203a"
                   "\u0153\u017e\u0178")
_CP1252_BYTES = ("\x80\x82\x83\x84\x85\x86\x87\x88"
                 "\x89\x8a\x8b\x8c\x8e\x91\x92\x93"
                 "\x94\x95\x96\x97\x98\x99\x9a\x9b"
                 "\x9c\x9e\x9f")

#: a mojibake lead char (the misdecoded UTF-8 lead bytes C2 C3 E2 =
#: \u00c2 \u00c3 \u00e2) followed by a UTF-8 continuation byte
#: misdecoded either as U+0080-U+00BF or as a printed cp1252 char
_MOJI_RE = ("[\u00c2\u00c3\u00e2]"
            "[\u0080-\u00bf" + _CP1252_PRINTED + "]")

#: anchored grammar of VALID UTF-8, written over the latin-1
#: chars-as-bytes representation (RFC 3629 table). Spark 4's decode()
#: THROWS on malformed input rather than substituting U+FFFD, so
#: validity must be proven natively BEFORE the decode ever runs; this
#: also subsumes the no-char-above-U+00FF check (such a char matches no
#: alternative). CaseWhen branches evaluate lazily, so gating the
#: decode behind this pattern keeps the throwing path unreachable.
_VALID_UTF8_RE = (
    "^(?:[\x00-\x7f]"
    "|[\u00c2-\u00df][\u0080-\u00bf]"
    "|\u00e0[\u00a0-\u00bf][\u0080-\u00bf]"
    "|[\u00e1-\u00ec][\u0080-\u00bf][\u0080-\u00bf]"
    "|\u00ed[\u0080-\u009f][\u0080-\u00bf]"
    "|[\u00ee-\u00ef][\u0080-\u00bf][\u0080-\u00bf]"
    "|\u00f0[\u0090-\u00bf][\u0080-\u00bf][\u0080-\u00bf]"
    "|[\u00f1-\u00f3][\u0080-\u00bf][\u0080-\u00bf][\u0080-\u00bf]"
    "|\u00f4[\u0080-\u008f][\u0080-\u00bf][\u0080-\u00bf])*\\z")
#: NOTE the \z anchor: Java's $ matches BEFORE a final line terminator
#: (\n, \r, U+0085, U+2028, U+2029), so a trailing U+0085 — exactly the
#: latin-1-decoded cp1252 ellipsis byte this operator meets — would slip
#: past a $-anchored gate and crash the strict decode. \z is absolute
#: end-of-input.


def mojibake_repair_col(text: Column | str) -> Column:
    """Repaired text (or the input unchanged where repair doesn't
    apply). Pure scan-stage expressions: translate, then — only under
    the marker + valid-UTF-8 gates, in a lazy CaseWhen branch —
    encode(latin-1) / decode(utf-8)."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.translate(c, _CP1252_PRINTED, _CP1252_BYTES)
    repaired = F.decode(F.encode(t, "ISO-8859-1"), "UTF-8")
    guard = c.isNotNull() & c.rlike(_MOJI_RE) & t.rlike(_VALID_UTF8_RE)
    return F.when(guard,
                  F.when(repaired != c, repaired).otherwise(c)).otherwise(c)


def mojibake_detected_col(text: Column | str) -> Column:
    """True where the marker pattern fires — the audit/count column."""
    c = F.col(text) if isinstance(text, str) else text
    return c.isNotNull() & c.rlike(_MOJI_RE)


def repair_mojibake(df: DataFrame, key: str = "doc_id",
                    text: str = "text") -> DataFrame:
    """``(key, text, detected, repaired)`` — the mojibake pass as a
    projection (zero shuffle, plan-asserted): rows with no marker (or
    failing any fail-safe gate) come through byte-identical."""
    return df.select(
        F.col(key), F.col(text),
        mojibake_detected_col(text).alias("detected"),
        mojibake_repair_col(text).alias("repaired"),
    )

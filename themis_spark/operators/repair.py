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

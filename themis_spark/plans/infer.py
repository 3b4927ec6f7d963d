"""Draft-4 schema INFERENCE from data — the inverse of the compiler.

A validator ecosystem needs schemas; at web scale nobody hand-writes one
for a crawl's metadata column. This module derives a draft-4 schema (the
reference's schema dialect, SURVEY.md §2(a)) from a dynamic JSON column,
fully natively, in exactly two aggregation passes:

* **Pass 1 — structure.** ``schema_of_variant_agg`` (JVM partial+final
  aggregate) merges every row's variant type into ONE type string, e.g.
  ``OBJECT<a: DECIMAL(21,1), b: OBJECT<c: ARRAY<BIGINT>>>``. The driver
  parses that string (recursive descent, backquote-aware) into a draft-4
  skeleton. Shuffle volume: one string.

* **Pass 2 — constraints.** For every discovered non-array path (a
  compile-time-known set after pass 1) one fused aggregation of native
  probes counts presence (``variant_get(path) IS NOT NULL`` — absent is
  SQL NULL, JSON null is a VOID variant, matching
  plans/variant_native.py's three-way-null contract) and JSON nulls
  (``schema_of_variant(...) = 'VOID'`` — needed because the merged type
  string ABSORBS nulls: ``[1, 2.5, null]`` merges to ``DECIMAL``).
  ``required`` = child present in every row where the parent object is
  present. Shuffle volume: one row of counters.

Both passes are plain scans + hash aggregates — no Python, no explode,
no per-path jobs. At 100 TB each pass is one map-side-combined pass over
the column (parse the variant once per pass; callers validating anyway
should materialize the variant column and share the scan).

Limitations (declared, fail-open to the permissive side): array ELEMENT
constraints beyond the merged element type are not probed (variant paths
cannot address ``[*]``), and heterogeneous unions collapse to the
permissive ``{}``/``VARIANT`` — inference never emits a schema that
rejects the data it was derived from (see test_infer.py round-trips).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_variant_type",
    "variant_type_to_draft4",
    "merged_variant_schema",
    "json_path_profile",
    "infer_draft4_schema",
]


# --------------------------------------------------------------- type parser

@dataclass
class TypeNode:
    kind: str  # OBJECT | ARRAY | scalar type name (BIGINT, DECIMAL, ...)
    fields: dict[str, "TypeNode"] = field(default_factory=dict)  # OBJECT
    element: "TypeNode | None" = None  # ARRAY
    decimal_scale: int | None = None  # DECIMAL(p,s)


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def eat(self, tok: str) -> None:
        if not self.s.startswith(tok, self.i):
            raise ValueError(
                f"bad variant type string at {self.i}: expected {tok!r} in {self.s!r}")
        self.i += len(tok)

    def skip_ws(self) -> None:
        while self.peek() == " ":
            self.i += 1

    def ident(self) -> str:
        """A field name: backquoted (with `` escaping) or a run up to ':'."""
        if self.peek() == "`":
            self.i += 1
            out = []
            while True:
                ch = self.peek()
                if ch == "":
                    raise ValueError(f"unterminated backquote in {self.s!r}")
                if ch == "`":
                    if self.s.startswith("``", self.i):  # escaped backtick
                        out.append("`")
                        self.i += 2
                        continue
                    self.i += 1
                    return "".join(out)
                out.append(ch)
                self.i += 1
        j = self.s.index(":", self.i)
        name = self.s[self.i:j]
        self.i = j
        return name

    def word(self) -> str:
        j = self.i
        while j < len(self.s) and (self.s[j].isalnum() or self.s[j] == "_"):
            j += 1
        w = self.s[self.i:j]
        self.i = j
        return w


def _parse_type(p: _P) -> TypeNode:
    p.skip_ws()
    w = p.word()
    if w == "OBJECT":
        p.eat("<")
        fields: dict[str, TypeNode] = {}
        p.skip_ws()
        if p.peek() == ">":
            p.eat(">")
            return TypeNode("OBJECT", fields=fields)
        while True:
            p.skip_ws()
            name = p.ident()
            p.eat(":")
            fields[name] = _parse_type(p)
            p.skip_ws()
            if p.peek() == ",":
                p.eat(",")
                continue
            p.eat(">")
            return TypeNode("OBJECT", fields=fields)
    if w == "ARRAY":
        p.eat("<")
        el = _parse_type(p)
        p.skip_ws()
        p.eat(">")
        return TypeNode("ARRAY", element=el)
    if w == "DECIMAL":
        p.eat("(")
        prec = p.word()
        p.eat(",")
        p.skip_ws()
        scale = p.word()
        p.eat(")")
        del prec
        return TypeNode("DECIMAL", decimal_scale=int(scale))
    if not w:
        raise ValueError(f"empty type at {p.i} in {p.s!r}")
    return TypeNode(w)


def parse_variant_type(s: str) -> TypeNode:
    """Parse a ``schema_of_variant``/``schema_of_variant_agg`` type string."""
    p = _P(s.strip())
    node = _parse_type(p)
    p.skip_ws()
    if p.i != len(p.s):
        raise ValueError(f"trailing input at {p.i} in {p.s!r}")
    return node


_SCALAR_DRAFT4 = {
    "BIGINT": "integer",
    "INT": "integer",
    "SMALLINT": "integer",
    "TINYINT": "integer",
    "DOUBLE": "number",
    "FLOAT": "number",
    "STRING": "string",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "VOID": "null",
    "BINARY": "string",
}


def variant_type_to_draft4(node: TypeNode) -> dict:
    """Draft-4 skeleton for a parsed type node. ``VARIANT`` (a merged
    heterogeneous union) becomes the permissive ``{}``."""
    if node.kind == "OBJECT":
        return {
            "type": "object",
            "properties": {k: variant_type_to_draft4(v) for k, v in node.fields.items()},
        }
    if node.kind == "ARRAY":
        items = variant_type_to_draft4(node.element) if node.element else {}
        return {"type": "array"} if items == {} else {"type": "array", "items": items}
    if node.kind == "DECIMAL":
        return {"type": "integer" if node.decimal_scale == 0 else "number"}
    if node.kind == "VARIANT":
        return {}
    jt = _SCALAR_DRAFT4.get(node.kind)
    if jt is None:
        raise ValueError(f"unmapped variant type {node.kind!r}")
    return {"type": jt}


# ------------------------------------------------------------------- passes

def _variant_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.try_parse_json(c)


def merged_variant_schema(df: DataFrame, col: Column | str) -> str:
    """Pass 1: the corpus-merged variant type string (one aggregate)."""
    row = df.agg(F.schema_of_variant_agg(_variant_col(col)).alias("s")).collect()
    return row[0]["s"]


import re as _re

_IDENT = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _child_path(parent: str, key: str) -> str:
    """Variant-path addressing: dotted for identifier keys, bracket-quoted
    (``$['weird key']``) otherwise — verified against variant_get's path
    grammar."""
    if _IDENT.match(key):
        return f"{parent}.{key}"
    return f"{parent}['" + key.replace("\\", "\\\\").replace("'", "\\'") + "']"


def _walk_paths(node: TypeNode, path: str = "$") -> list[tuple[str, TypeNode]]:
    """All variant-addressable paths (array interiors are not addressable)."""
    out = [(path, node)]
    if node.kind == "OBJECT":
        for k, child in node.fields.items():
            out.extend(_walk_paths(child, _child_path(path, k)))
    return out


def _jtype(node: TypeNode) -> str:
    if node.kind in ("OBJECT", "ARRAY"):
        return node.kind.lower()
    if node.kind == "VARIANT":
        return "any"
    if node.kind == "DECIMAL":
        return "integer" if node.decimal_scale == 0 else "number"
    return _SCALAR_DRAFT4[node.kind]


def json_path_profile(
    df: DataFrame, col: Column | str, root: TypeNode | None = None,
) -> DataFrame:
    """Pass 2 as a DataFrame: ``(path, jtype, n_present, n_null)`` per
    discovered path — ONE fused native aggregation (the reshape from one
    wide row to rows operates on a single aggregated row).
    """
    if root is None:
        root = parse_variant_type(merged_variant_schema(df, col))
    v = _variant_col(col)
    paths = _walk_paths(root)
    aggs = []
    for i, (path, _node) in enumerate(paths):
        nd = v if path == "$" else F.variant_get(v, path, "variant")
        aggs.append(F.sum(nd.isNotNull().cast("long")).alias(f"p{i}"))
        aggs.append(
            F.sum((F.schema_of_variant(nd) == "VOID").cast("long")).alias(f"n{i}"))
    wide = df.agg(*aggs)
    stack_args = []
    for i, (path, node) in enumerate(paths):
        lit = path.replace("'", "''")  # SQL string-literal escaping
        stack_args.append(
            f"'{lit}', '{_jtype(node)}', coalesce(p{i}, 0L), coalesce(n{i}, 0L)")
    return wide.selectExpr(
        f"stack({len(paths)}, {', '.join(stack_args)}) "
        "AS (path, jtype, n_present, n_null)"
    )


_NUMERIC_KINDS = {"BIGINT", "INT", "SMALLINT", "TINYINT", "DECIMAL", "DOUBLE", "FLOAT"}
_STRING_KINDS = {"STRING", "VARCHAR"}


def _enrich_stats(df: DataFrame, col: Column | str,
                  paths: list[tuple[str, TypeNode]]) -> dict[str, dict]:
    """Bounds/cardinality enrichment: one more fused native aggregation —
    per scalar path min/max (exact draft-4 ``minimum``/``maximum``),
    string-length bounds, and an approximate distinct count that GATES
    enum discovery (so the later ``collect_set`` can never explode)."""
    v = _variant_col(col)
    aggs: list[Column] = []
    probed: list[str] = []
    for i, (path, node) in enumerate(paths):
        if node.kind in _NUMERIC_KINDS:
            target = "bigint" if _jtype(node) == "integer" else "double"
            x = F.try_variant_get(v, path, target)
            lo, hi = F.min(x), F.max(x)
        elif node.kind in _STRING_KINDS:
            x = F.try_variant_get(v, path, "string")
            lo, hi = F.min(F.length(x)), F.max(F.length(x))
        elif node.kind == "BOOLEAN":
            x = F.try_variant_get(v, path, "boolean")
            lo, hi = F.lit(None), F.lit(None)
        else:
            continue
        aggs += [lo.alias(f"lo{i}"), hi.alias(f"hi{i}"),
                 F.approx_count_distinct(x).alias(f"d{i}")]
        probed.append(path)
    if not aggs:
        return {}
    row = df.agg(*aggs).collect()[0]
    return {
        path: {"lo": row[f"lo{i}"], "hi": row[f"hi{i}"], "nd": row[f"d{i}"]}
        for i, (path, _node) in enumerate(paths) if path in set(probed)
    }


def _enum_values(df: DataFrame, col: Column | str,
                 targets: list[tuple[str, str]]) -> dict[str, list]:
    """Exact distinct value sets for the (pre-gated, low-cardinality)
    enum-candidate paths — one aggregation of bounded ``collect_set``s."""
    if not targets:
        return {}
    v = _variant_col(col)
    aggs = [
        F.sort_array(F.collect_set(F.try_variant_get(v, path, target))).alias(f"e{i}")
        for i, (path, target) in enumerate(targets)
    ]
    row = df.agg(*aggs).collect()[0]
    return {path: list(row[f"e{i}"]) for i, (path, _t) in enumerate(targets)}


def infer_draft4_schema(
    df: DataFrame,
    col: Column | str,
    schema_id: str = "inferred",
    required_min_frac: float = 1.0,
    bounds: bool = False,
    enum_max: int = 0,
) -> dict:
    """Infer a draft-4 schema for a dynamic JSON column (two passes, both
    native aggregations — see module docstring).

    ``required_min_frac``: a property is listed ``required`` when it is
    present in at least this fraction of the rows where its parent object
    is present (1.0 = strictly always, the safe default).

    ``bounds=True`` adds observed ``minimum``/``maximum`` (numerics) and
    ``minLength``/``maxLength`` (strings) from one extra fused
    aggregation. ``enum_max=N`` additionally emits ``enum`` for scalar
    string/integer/boolean paths whose distinct count is ≤ N — gated by
    an approximate count first, then collected exactly (one bounded
    ``collect_set`` aggregation), so the driver never receives an
    unbounded value set. Both stay round-trip-safe: bounds/enums are
    derived from the data, so the inferred schema still accepts every
    source row (JSON nulls join the enum when present).
    """
    merged = merged_variant_schema(df, col)
    root = parse_variant_type(merged)
    counts = {
        r["path"]: (r["n_present"], r["n_null"])
        for r in json_path_profile(df, col, root=root).collect()
    }
    paths = _walk_paths(root)
    enrich = _enrich_stats(df, col, paths) if (bounds or enum_max) else {}
    enums: dict[str, list] = {}
    if enum_max:
        node_by_path = dict(paths)
        targets = []
        for path, st in enrich.items():
            node = node_by_path[path]
            jt = _jtype(node)
            # approx gate with slack; exact cap re-checked after collection
            if jt in ("string", "integer", "boolean") and st["nd"] and \
                    st["nd"] <= enum_max * 1.2:
                target = {"string": "string", "integer": "bigint",
                          "boolean": "boolean"}[jt]
                targets.append((path, target))
        enums = {p: vs for p, vs in _enum_values(df, col, targets).items()
                 if len(vs) <= enum_max}

    def build(node: TypeNode, path: str) -> dict:
        schema = variant_type_to_draft4(node)
        n_present, n_null = counts.get(path, (0, 0))
        # merged type strings absorb JSON nulls — resurface them as a
        # draft-4 type union so the schema accepts the data it came from
        if n_null and schema.get("type") not in (None, "null"):
            schema["type"] = sorted({schema["type"], "null"})
        if node.kind == "OBJECT":
            schema["properties"] = {
                k: build(child, _child_path(path, k)) for k, child in node.fields.items()
            }
            req = [
                k for k in node.fields
                if n_present > 0
                and counts.get(_child_path(path, k), (0, 0))[0]
                >= required_min_frac * n_present
            ]
            if req:
                schema["required"] = sorted(req)
        st = enrich.get(path)
        has_values = n_present - n_null > 0
        if bounds and st and has_values and st["lo"] is not None:
            if node.kind in _NUMERIC_KINDS:
                schema["minimum"], schema["maximum"] = st["lo"], st["hi"]
            elif node.kind in _STRING_KINDS:
                schema["minLength"], schema["maxLength"] = st["lo"], st["hi"]
        if path in enums and has_values:
            vals: list = enums[path]
            if n_null:
                vals = vals + [None]
            schema["enum"] = vals
        return schema

    out = build(root, "$")
    out["id"] = schema_id
    return out


def profile_diff(base: DataFrame, current: DataFrame) -> DataFrame:
    """Schema-drift report between two :func:`json_path_profile` frames
    (e.g. last week's crawl vs today's): per path, whether it was
    ``added``, ``removed``, ``type_changed``, or ``unchanged``, with
    presence counts from both sides.

    This is the schema-space complement of the value-space drift checks
    (KS/PSI in operators/stats.py): upstream producers silently adding
    fields or changing ``integer`` -> ``string`` shows up here before it
    shows up as validation failures.

    Profiles are one row per JSON path (tiny, bounded by schema width,
    not data size), so the full-outer join is trivially broadcast-able;
    the expensive part — profiling the corpus — already happened in the
    two input aggregations.
    """
    b = base.select(
        F.col("path"),
        F.col("jtype").alias("base_jtype"),
        F.col("n_present").alias("base_present"),
    )
    c = current.select(
        F.col("path"),
        F.col("jtype").alias("cur_jtype"),
        F.col("n_present").alias("cur_present"),
    )
    j = b.join(c, "path", "full_outer")
    status = (
        F.when(F.col("base_jtype").isNull(), F.lit("added"))
        .when(F.col("cur_jtype").isNull(), F.lit("removed"))
        .when(F.col("base_jtype") != F.col("cur_jtype"), F.lit("type_changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        "path", status.alias("status"),
        "base_jtype", "cur_jtype", "base_present", "cur_present",
    )

"""Compile a draft-4 schema against a typed Spark table into a fused plan.

Split per SURVEY.md §2(a): every keyword that is expressible as a native
Spark ``Column`` predicate compiles to one (Catalyst whole-stage codegen —
the Spark analogue of the reference's AOT schema→JS codegen in
playlyfe/themis src/themis.js); anything dynamic (nested JSON columns,
cyclic $refs, unknown shapes) falls back to a vectorized Arrow batch
validator built on plans/pyvalidator.py.

FAIL-CLOSED CONTRACT (round-1 verdict item 1): ``compile_plan`` never
silently drops a keyword. The native compiler (``_compile_sub``) either
expresses EVERY keyword of a subschema or raises ``_NotNative``; the
caller then routes the whole column through one of two complete paths:

* dynamic JSON string columns → Variant-native bounded unroll
  (plans/variant_native.py) or the Arrow JSON validator;
* any other typed column → an Arrow WRAPPER spec: the value is
  re-serialized per row via ``to_json(struct(col))`` and validated by the
  compiled Python closure validator against ``{"properties": {col: sub}}``
  — exact draft-4 semantics, correct (keyword, instance_path,
  schema_path) triples, no silent under-validation.

Anything the engine cannot express even that way (root-level combinators
whose branches exceed the native set) raises ``UnsupportedSchemaError``
at compile time — a validator that silently passes invalid rows is worse
than one that refuses to compile.

Typed-table null contract (SURVEY.md §7.3): SQL NULL in a typed column
means the JSON property is ABSENT. Hence `required` fails on NULL, while
value keywords (pattern, enum, bounds, …) pass on NULL — draft-4 keywords
constrain only values of the matching type. INSIDE typed arrays and map
values, NULL instead models JSON null (``null_is_json`` contexts below):
`type` checks fail on it (unless "null" is allowed) and value keywords
still pass.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from themis_spark.plans.parser import SchemaRegistry, parse_schema
from themis_spark.plans.pyvalidator import (
    _GLOBAL_FORMATS,
    BUILTIN_FORMATS,
    PyValidator,
    compile_python_validator,
)
from themis_spark.plans import vector_checks
from themis_spark.plans.regex_triage import (
    java_safe_pattern,
    python_pattern,
    re2_safe_pattern,
)

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_NUMERIC = _INTEGRAL + (T.FloatType, T.DoubleType, T.DecimalType)
_FRACTIONAL = (T.FloatType, T.DoubleType, T.DecimalType)
_STRINGLIKE = (T.StringType, T.TimestampType, T.DateType)

#: inert draft-4 annotations — never produce runtime checks
_ANNOTATIONS = {"id", "title", "description", "definitions", "default"}

#: keywords that, on a StringType column, flag the column as a DYNAMIC
#: JSON document (json.loads interpretation) rather than a plain string
_JSON_CONTAINER_KEYWORDS = {
    "properties", "patternProperties", "additionalProperties",
    "required", "minProperties", "maxProperties", "dependencies",
    "items", "additionalItems", "minItems", "maxItems", "uniqueItems",
}


class UnsupportedSchemaError(Exception):
    """The schema cannot be compiled against this table at all — raised at
    compile time instead of silently under-validating (fail-closed)."""


class _NotNative(Exception):
    """Internal: this subschema exceeds the native Column set for the
    column's type; the caller must fall back to a complete path."""


@dataclass
class ColumnCheck:
    """One compiled keyword check over one column — the unit that becomes a
    violation row (keyword, instance_path, schema_path) on failure."""

    keyword: str
    instance_path: str
    schema_path: str
    predicate: Column  # True/NULL = pass, False = violation
    detail: Column
    column: str


@dataclass
class ArrowColumnSpec:
    """A column validated on the vectorized Arrow path.

    ``payload`` (optional): expression producing the JSON payload the
    Python validator parses. None = the column itself is the JSON string
    (dynamic-JSON columns); otherwise a ``to_json(struct(col))`` wrapper
    for typed columns whose subschema exceeds the native set.

    ``gate`` (optional): only rows satisfying it carry real payloads into
    the Python batch — the UDF input is NULLed otherwise (hybrid
    native/Arrow execution: the Arrow pass handles just the residue the
    bounded-unroll native compile couldn't express, see
    plans/variant_native.py)."""

    column: str
    validator: PyValidator
    instance_prefix: str
    gate: Column | None = None
    payload: Column | None = None

    def payload_col(self) -> Column:
        return self.payload if self.payload is not None else F.col(self.column)


@dataclass
class CompiledPlan:
    """Driver-side compile artifact (reference EP1 analogue): reusable
    across runs, never shipped as data — only its Column trees and the
    pickled batch validators travel to executors."""

    checks: list[ColumnCheck] = field(default_factory=list)
    arrow_specs: list[ArrowColumnSpec] = field(default_factory=list)
    #: pre-assembled array<violation> columns from the bounded-unroll
    #: native Variant compiler (plans/variant_native.py)
    variant_arrays: list[Column] = field(default_factory=list)
    #: parsed-variant projection aliases: alias -> source column. The
    #: variant checks reference these aliases so the JSON string parses
    #: ONCE per row (materialized VariantType column) instead of once per
    #: probe — callers run ``prepare(df)`` before selecting violations.
    variant_sources: dict = field(default_factory=dict)
    root_uri: str = ""
    columns_needed: set[str] = field(default_factory=set)
    #: StringType columns force-treated as serialized JSON documents
    _json_columns: frozenset = frozenset()

    def prepare(self, df):
        """Attach the parsed-variant columns the compiled checks expect.
        No-op for plans without native variant checks."""
        if not self.variant_sources:
            return df
        return df.withColumns(
            {alias: F.try_parse_json(F.col(src))
             for alias, src in self.variant_sources.items()}
        )

    # -- violation assembly (SURVEY 2(a).27) --------------------------------
    def violation_elements(self) -> list[Column]:
        """One 0-or-1-element array per check. Concatenating these beats
        array_compact(array(...)): array_compact rewrites to a
        higher-order filter, which is CodegenFallback — ONE of those in
        the projection knocks the whole fused pass out of whole-stage
        codegen (measured ~3× slower, interpreted + no subexpr reuse)."""
        empty = F.array().cast(VIOLATION_ARRAY_TYPE)
        els = []
        for c in self.checks:
            failed = ~F.coalesce(c.predicate, F.lit(False))
            els.append(
                F.when(
                    failed,
                    F.array(
                        F.struct(
                            F.lit(c.keyword).alias("keyword"),
                            F.lit(c.instance_path).alias("instance_path"),
                            F.lit(c.schema_path).alias("schema_path"),
                            c.detail.alias("detail"),
                        )
                    ),
                ).otherwise(empty)
            )
        return els

    def native_violations_col(self) -> Column:
        els = self.violation_elements()
        if not els:
            return F.lit([]).cast(VIOLATION_ARRAY_TYPE)
        return F.concat(*els)

    def violations_col(self, include_gated_arrow: bool = True) -> Column:
        """Full violations array: native checks ++ Arrow-path checks,
        composed in ONE select (single fused pass per partition).

        ``include_gated_arrow=False`` omits the gate-guarded Arrow specs
        (the deep-recursion residue): callers then run those through
        ``residual_gate()`` + a separate tiny filtered job so the big
        scan never launches Python workers on clean data."""
        col = self.native_violations_col()
        for arr in self.variant_arrays:
            col = F.concat(col, arr)
        for spec in self.arrow_specs:
            if spec.gate is not None and not include_gated_arrow:
                continue
            from themis_spark.plans.arrow_validators import (
                decode_violations,
                violations_pandas_udf,
            )

            udf = violations_pandas_udf(spec.validator, spec.instance_prefix)
            payload = (
                F.when(spec.gate, spec.payload_col())
                if spec.gate is not None
                else spec.payload_col()
            )
            col = F.concat(col, decode_violations(udf(payload)))
        return col

    def residual_gate(self) -> Column | None:
        """Row predicate selecting the Arrow residue (rows deeper than
        the variant unroll); None when no gated spec exists."""
        gates = [s.gate for s in self.arrow_specs if s.gate is not None]
        if not gates:
            return None
        out = F.coalesce(gates[0], F.lit(False))
        for g in gates[1:]:
            out = out | F.coalesce(g, F.lit(False))
        return out

    def valid_col(self) -> Column:
        return F.size(self.violations_col()) == 0


VIOLATION_STRUCT_TYPE = T.StructType(
    [
        T.StructField("keyword", T.StringType()),
        T.StructField("instance_path", T.StringType()),
        T.StructField("schema_path", T.StringType()),
        T.StructField("detail", T.StringType()),
    ]
)
VIOLATION_ARRAY_TYPE = T.ArrayType(VIOLATION_STRUCT_TYPE)


def _type_compatible(json_type: str, dt: T.DataType) -> bool:
    if json_type == "string":
        return isinstance(dt, _STRINGLIKE)
    if json_type == "integer":
        return isinstance(dt, _INTEGRAL)
    if json_type == "number":
        return isinstance(dt, _NUMERIC)
    if json_type == "boolean":
        return isinstance(dt, T.BooleanType)
    if json_type == "array":
        return isinstance(dt, T.ArrayType)
    if json_type == "object":
        return isinstance(dt, (T.StructType, T.MapType))
    if json_type == "null":
        return True  # SQL NULL models it
    return False


def _detail(col: Column) -> Column:
    return F.substring(col.cast("string"), 1, 64)


def _enum_members_for(members, dt: T.DataType) -> list:
    """Enum members comparable to values of this Spark type. Filtering by
    the DRAFT-4 type family prevents ``isin`` cross-type casts from
    matching what the spec says must not match (``"1"`` ≠ ``1``;
    ``true`` ≠ ``1``)."""
    if isinstance(dt, T.BooleanType):
        return [m for m in members if isinstance(m, bool)]
    if isinstance(dt, _NUMERIC):
        return [m for m in members
                if isinstance(m, (int, float)) and not isinstance(m, bool)]
    if isinstance(dt, _STRINGLIKE):
        return [m for m in members if isinstance(m, str)]
    return []


def _str_ops_col(col: Column, dt: T.DataType) -> Column:
    """String-keyword operand: Timestamp/Date columns compare as their
    canonical string form — EXPLICIT cast (ANSI mode rejects the implicit
    timestamp→string coercion rlike/length would need)."""
    return col if isinstance(dt, T.StringType) else col.cast("string")


def _and_all(preds: list[Column]) -> Column:
    if not preds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, preds)


def _or_all(preds: list[Column]) -> Column:
    if not preds:
        return F.lit(False)
    return reduce(lambda a, b: a | b, preds)


# Java-regex format table (draft-4 validation §7 built-ins minus date-time,
# which combines a strict ISO regex with try_to_timestamp). These align
# with the Python table in pyvalidator.py for well-formed inputs; the
# (documented) native-vs-Python divergence is exotic-but-syntactically-odd
# strings only (e.g. ipaddress module quirks).
_IPV4_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
_IPV4_RE = rf"^({_IPV4_OCTET}\.){{3}}{_IPV4_OCTET}$"
_H16 = "[0-9A-Fa-f]{1,4}"
_IPV6_RE = (
    "^("
    f"({_H16}:){{7}}{_H16}"
    f"|({_H16}:){{1,7}}:"
    f"|({_H16}:){{1,6}}(:{_H16}){{1}}"
    f"|({_H16}:){{1,5}}(:{_H16}){{1,2}}"
    f"|({_H16}:){{1,4}}(:{_H16}){{1,3}}"
    f"|({_H16}:){{1,3}}(:{_H16}){{1,4}}"
    f"|({_H16}:){{1,2}}(:{_H16}){{1,5}}"
    f"|{_H16}:(:{_H16}){{1,6}}"
    f"|:((:{_H16}){{1,7}}|:)"
    f"|({_H16}:){{1,6}}{_IPV4_OCTET}(\\.{_IPV4_OCTET}){{3}}"
    f"|({_H16}:){{1,5}}:{_IPV4_OCTET}(\\.{_IPV4_OCTET}){{3}}"
    f"|::(({_H16}:){{0,5}})?{_IPV4_OCTET}(\\.{_IPV4_OCTET}){{3}}"
    ")(%[^%]+)?$"  # RFC 4007 zone id — python ipaddress accepts it
)
_FORMAT_REGEX = {
    "email": r"^[^@\s]+@[^@\s]+\.[^@\s]+$",
    "hostname": r"^[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?(\.[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$",
    "ipv4": _IPV4_RE,
    "ipv6": _IPV6_RE,
    "uri": r"^[a-zA-Z][a-zA-Z0-9+.-]*:",
}
_DATETIME_NATIVE_RE = (
    r"^\d{4}-\d{2}-\d{2}[Tt]\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:\d{2})$"
)


# ---------------------------------------------------------------------------
# scalar predicate BUILDERS — reusable Column→Column keyword predicates used
# inside higher-order lambdas (array elements, map values) where the target
# Column is a lambda variable and cannot be captured statically.
# ---------------------------------------------------------------------------

PredBuilder = Callable[[Column], Column]


def _scalar_pred_builders(
    node: Any, dt: T.DataType, reg: SchemaRegistry, base: str,
    stack: tuple, spath: str,
) -> list[tuple[str, str, PredBuilder]]:
    """(keyword, schema_path, builder) per keyword of a SCALAR subschema.

    Builder predicates use pass-semantics: NULL value (JSON null in these
    contexts) passes every value keyword; only `type` rejects it (unless
    "null" is allowed). Raises _NotNative for anything beyond scalar
    keywords + combinators-of-scalars."""
    if not isinstance(node, dict):
        return []
    if "$ref" in node:
        sub, nb, canon = reg.resolve(node["$ref"], base)
        if id(sub) in stack:
            raise _NotNative("cyclic $ref in element schema")
        return _scalar_pred_builders(sub, dt, reg, nb, stack + (id(sub),), canon)

    out: list[tuple[str, str, PredBuilder]] = []
    handled = set(_ANNOTATIONS)
    is_str = isinstance(dt, _STRINGLIKE)
    is_num = isinstance(dt, _NUMERIC)

    if "type" in node:
        handled.add("type")
        types = node["type"] if isinstance(node["type"], list) else [node["type"]]
        compatible = any(_type_compatible(t, dt) and t != "null" for t in types)
        null_ok = "null" in types
        # draft-4: "integer" is runtime-satisfiable on fractional types
        int_over_frac = (not compatible and "integer" in types
                         and isinstance(dt, _FRACTIONAL))

        def b_type(v: Column, c=compatible, n=null_ok, f=int_over_frac) -> Column:
            if f:
                base = v.isNotNull() & (v == F.floor(v))
                return (v.isNull() | base) if n else base
            if c and n:
                return F.lit(True)
            if c:
                return v.isNotNull()
            if n:
                return v.isNull()
            return F.lit(False)

        out.append(("type", f"{spath}/type", b_type))

    if "enum" in node:
        handled.add("enum")
        members = node["enum"]
        if any(isinstance(m, (list, dict)) for m in members):
            raise _NotNative("non-scalar enum members need deep equality")
        scalars = _enum_members_for(members, dt)
        has_null = any(m is None for m in members)

        # draft-4: null matches enum only via an explicit null member;
        # non-null matches only same-type-family members
        def b_enum(v: Column, s=scalars, hn=has_null) -> Column:
            nonnull_match = v.isin(s) if s else F.lit(False)
            return F.when(v.isNull(), F.lit(hn)).otherwise(
                F.coalesce(nonnull_match, F.lit(False))
            )

        out.append(("enum", f"{spath}/enum", b_enum))

    if "pattern" in node:
        handled.add("pattern")
        if is_str:
            jp = java_safe_pattern(node["pattern"])
            if jp is None:
                raise _NotNative(f"pattern dialect: {node['pattern']!r}")
            out.append(("pattern", f"{spath}/pattern",
                        lambda v, p=jp: v.isNull() | _str_ops_col(v, dt).rlike(p)))
    if "minLength" in node:
        handled.add("minLength")
        if is_str:
            out.append(("minLength", f"{spath}/minLength",
                        lambda v, n=node["minLength"]:
                        v.isNull() | (F.length(_str_ops_col(v, dt)) >= n)))
    if "maxLength" in node:
        handled.add("maxLength")
        if is_str:
            out.append(("maxLength", f"{spath}/maxLength",
                        lambda v, n=node["maxLength"]:
                        v.isNull() | (F.length(_str_ops_col(v, dt)) <= n)))

    if "minimum" in node:
        handled.update({"minimum", "exclusiveMinimum"})
        if is_num:
            excl = bool(node.get("exclusiveMinimum", False))
            kw = "exclusiveMinimum" if excl else "minimum"
            m = node["minimum"]
            out.append((kw, f"{spath}/minimum",
                        lambda v, m=m, e=excl: v.isNull() | ((v > m) if e else (v >= m))))
    elif "exclusiveMinimum" in node:
        handled.add("exclusiveMinimum")  # modifier without bound: inert
    if "maximum" in node:
        handled.update({"maximum", "exclusiveMaximum"})
        if is_num:
            excl = bool(node.get("exclusiveMaximum", False))
            kw = "exclusiveMaximum" if excl else "maximum"
            m = node["maximum"]
            out.append((kw, f"{spath}/maximum",
                        lambda v, m=m, e=excl: v.isNull() | ((v < m) if e else (v <= m))))
    elif "exclusiveMaximum" in node:
        handled.add("exclusiveMaximum")

    if "multipleOf" in node:
        handled.add("multipleOf")
        if is_num:
            n = node["multipleOf"]
            if isinstance(n, int) and isinstance(dt, _INTEGRAL):
                out.append(("multipleOf", f"{spath}/multipleOf",
                            lambda v, n=n: v.isNull() | (F.pmod(v, F.lit(n)) == 0)))
            else:
                scale = max(len(str(n).split(".")[-1]) if "." in str(n) else 0, 6)
                dec = T.DecimalType(38, scale + 6)
                out.append(("multipleOf", f"{spath}/multipleOf",
                            lambda v, n=n, d=dec: v.isNull()
                            | (F.pmod(v.cast(d), F.lit(n).cast(d)) == 0)))

    if "format" in node:
        handled.add("format")
        if isinstance(dt, T.StringType):
            fmt = node["format"]
            if fmt in _GLOBAL_FORMATS:
                raise _NotNative(f"custom format {fmt!r} runs on the Arrow path")
            if fmt == "date-time":
                out.append(("format", f"{spath}/format",
                            lambda v: v.isNull() | (
                                v.rlike(_DATETIME_NATIVE_RE)
                                & F.try_to_timestamp(v).isNotNull())))
            elif fmt in _FORMAT_REGEX:
                out.append(("format", f"{spath}/format",
                            lambda v, r=_FORMAT_REGEX[fmt]: v.isNull() | v.rlike(r)))
            elif fmt in BUILTIN_FORMATS:
                raise _NotNative(f"builtin format {fmt!r} has no native regex")
            # unknown format: draft-4 SHOULD → ignored (same as pyvalidator)

    # combinators of scalars compose in builder space
    if "allOf" in node:
        handled.add("allOf")
        for i, b in enumerate(node["allOf"]):
            out.extend(_scalar_pred_builders(b, dt, reg, base, stack, f"{spath}/allOf/{i}"))
    if "anyOf" in node:
        handled.add("anyOf")
        branches = [
            _scalar_valid_builder(b, dt, reg, base, stack, f"{spath}/anyOf/{i}")
            for i, b in enumerate(node["anyOf"])
        ]
        out.append(("anyOf", f"{spath}/anyOf",
                    lambda v, bs=branches: _or_all([F.coalesce(f(v), F.lit(True)) for f in bs])))
    if "oneOf" in node:
        handled.add("oneOf")
        branches = [
            _scalar_valid_builder(b, dt, reg, base, stack, f"{spath}/oneOf/{i}")
            for i, b in enumerate(node["oneOf"])
        ]
        out.append(("oneOf", f"{spath}/oneOf",
                    lambda v, bs=branches: sum(
                        (F.coalesce(f(v), F.lit(True)).cast("int") for f in bs),
                        F.lit(0)) == 1))
    if "not" in node:
        handled.add("not")
        inner = _scalar_valid_builder(node["not"], dt, reg, base, stack, f"{spath}/not")
        out.append(("not", f"{spath}/not",
                    lambda v, f=inner: ~F.coalesce(f(v), F.lit(True))))

    # object/array keywords are vacuous on genuinely scalar types (the
    # value can never be an object/array) but NOT on string columns that
    # might hold JSON — callers decide that before reaching here.
    if not isinstance(dt, (T.ArrayType, T.StructType, T.MapType, T.StringType)):
        handled |= _JSON_CONTAINER_KEYWORDS

    extra = set(node) - handled
    if extra:
        raise _NotNative(f"keywords {sorted(extra)} on {dt.simpleString()}")
    return out


def _scalar_valid_builder(node, dt, reg, base, stack, spath) -> PredBuilder:
    builders = _scalar_pred_builders(node, dt, reg, base, stack, spath)

    def valid(v: Column) -> Column:
        return _and_all([F.coalesce(fn(v), F.lit(True)) for _, _, fn in builders])

    return valid


# ---------------------------------------------------------------------------
# the universal native subschema compiler
# ---------------------------------------------------------------------------


def _compile_sub(
    col: Column,
    node: Any,
    dt: T.DataType,
    spath: str,
    ipath: str,
    colname: str,
    reg: SchemaRegistry,
    base: str,
    stack: tuple = (),
) -> list[ColumnCheck]:
    """Compile ``node`` applied to the value ``col`` of Spark type ``dt``.

    COMPLETE or raises _NotNative — never drops a keyword (fail-closed).
    NULL here means ABSENT (top-level columns / struct fields); array
    elements and map values go through _scalar_pred_builders where NULL
    means JSON null."""
    if not isinstance(node, dict) or not node:
        return []
    if "$ref" in node:
        # draft-4: $ref siblings are ignored
        sub, nb, canon = reg.resolve(node["$ref"], base)
        if id(sub) in stack:
            raise _NotNative("cyclic $ref on typed column")
        return _compile_sub(col, sub, dt, canon, ipath, colname, reg, nb,
                            stack + (id(sub),))

    out: list[ColumnCheck] = []
    handled = set(_ANNOTATIONS)
    null_pass = col.isNull()  # absent value: value keywords pass
    is_str = isinstance(dt, _STRINGLIKE)
    is_num = isinstance(dt, _NUMERIC)

    def add(keyword: str, pred: Column, leaf: str | None = None,
            ip: str | None = None, detail: Column | None = None) -> None:
        out.append(ColumnCheck(
            keyword, ip or ipath, f"{spath}/{leaf or keyword}", pred,
            detail if detail is not None else _detail(col), colname))

    # ---- type ------------------------------------------------------------
    if "type" in node:
        handled.add("type")
        types = node["type"] if isinstance(node["type"], list) else [node["type"]]
        compatible = any(_type_compatible(t, dt) for t in types)
        if not compatible:
            if "integer" in types and isinstance(dt, _FRACTIONAL):
                # draft-4: 1.0 IS an integer — a fractional column can
                # satisfy "integer" at runtime (fraction-free values)
                add("type", null_pass | (col == F.floor(col)))
            else:
                add("type", null_pass)  # every present value violates
        # otherwise satisfied at schema level — zero runtime cost

    # ---- enum (scalar members; complex types need deep equality) ----------
    if "enum" in node:
        handled.add("enum")
        if isinstance(dt, (T.ArrayType, T.StructType, T.MapType)):
            raise _NotNative("enum over complex type needs deep equality")
        scalars = _enum_members_for(node["enum"], dt)
        if (len(scalars) > vector_checks.ENUM_LITERAL_MAX
                and isinstance(dt, T.StringType)
                and all(isinstance(m, str) for m in scalars)):
            # broadcast-hash-set regime (BASELINE.json north star): the
            # member list ships once per executor and probes through an
            # Arrow C++ hash index — a >10^3-literal isin list would
            # bloat the plan and the generated code instead
            member = vector_checks.broadcast_isin_predicate(scalars)
            add("enum", null_pass | member(col))
        else:
            add("enum",
                null_pass | (col.isin(scalars) if scalars else F.lit(False)))

    # ---- string keywords (vacuous on non-string types) ---------------------
    if "pattern" in node:
        handled.add("pattern")
        if is_str:
            jp = java_safe_pattern(node["pattern"])
            if jp is not None:
                add("pattern", null_pass | _str_ops_col(col, dt).rlike(jp))
            else:
                # middle tier (BASELINE.json north star: "regex via
                # pyarrow.compute"): Java-incompatible but RE2-safe
                # patterns evaluate vectorized in Arrow C++ — only the
                # residue (backrefs, lookaround, unicode shorthands)
                # falls through to the per-value Python path
                r2 = re2_safe_pattern(node["pattern"])
                if r2 is None:
                    raise _NotNative(f"pattern dialect: {node['pattern']!r}")
                matcher = vector_checks.re2_pattern_predicate(r2)
                add("pattern", null_pass | matcher(_str_ops_col(col, dt)))
    if "minLength" in node:
        handled.add("minLength")
        if is_str:
            add("minLength",
                null_pass | (F.length(_str_ops_col(col, dt)) >= node["minLength"]))
    if "maxLength" in node:
        handled.add("maxLength")
        if is_str:
            add("maxLength",
                null_pass | (F.length(_str_ops_col(col, dt)) <= node["maxLength"]))
    if "format" in node:
        handled.add("format")
        if isinstance(dt, T.StringType):
            fmt = node["format"]
            if fmt in _GLOBAL_FORMATS:
                raise _NotNative(f"custom format {fmt!r} runs on the Arrow path")
            if fmt == "date-time":
                add("format", null_pass | (col.rlike(_DATETIME_NATIVE_RE)
                                           & F.try_to_timestamp(col).isNotNull()))
            elif fmt in _FORMAT_REGEX:
                add("format", null_pass | col.rlike(_FORMAT_REGEX[fmt]))
            elif fmt in BUILTIN_FORMATS:
                raise _NotNative(f"builtin format {fmt!r} has no native regex")
            # unknown format name: ignored, matching pyvalidator

    # ---- numeric keywords (vacuous on non-numeric types) -------------------
    if "minimum" in node:
        handled.update({"minimum", "exclusiveMinimum"})
        if is_num:
            excl = bool(node.get("exclusiveMinimum", False))
            pred = (col > node["minimum"]) if excl else (col >= node["minimum"])
            add("exclusiveMinimum" if excl else "minimum",
                null_pass | pred, leaf="minimum")
    elif "exclusiveMinimum" in node:
        handled.add("exclusiveMinimum")
    if "maximum" in node:
        handled.update({"maximum", "exclusiveMaximum"})
        if is_num:
            excl = bool(node.get("exclusiveMaximum", False))
            pred = (col < node["maximum"]) if excl else (col <= node["maximum"])
            add("exclusiveMaximum" if excl else "maximum",
                null_pass | pred, leaf="maximum")
    elif "exclusiveMaximum" in node:
        handled.add("exclusiveMaximum")
    if "multipleOf" in node:
        handled.add("multipleOf")
        if is_num:
            n = node["multipleOf"]
            if isinstance(n, int) and isinstance(dt, _INTEGRAL):
                pred = F.pmod(col, F.lit(n)) == 0
            else:
                # exact decimal modulus defeats binary-float noise
                scale = max(len(str(n).split(".")[-1]) if "." in str(n) else 0, 6)
                dec = T.DecimalType(38, scale + 6)
                pred = F.pmod(col.cast(dec), F.lit(n).cast(dec)) == 0
            add("multipleOf", null_pass | pred)

    # ---- array keywords ----------------------------------------------------
    if isinstance(dt, T.ArrayType):
        el_dt = dt.elementType
        if "minItems" in node:
            handled.add("minItems")
            add("minItems", null_pass | (F.size(col) >= node["minItems"]))
        if "maxItems" in node:
            handled.add("maxItems")
            add("maxItems", null_pass | (F.size(col) <= node["maxItems"]))
        if "uniqueItems" in node:
            handled.add("uniqueItems")
            if node["uniqueItems"] is True:
                add("uniqueItems",
                    null_pass | (F.size(F.array_distinct(col)) == F.size(col)))
        items = node.get("items")
        if isinstance(items, dict):
            handled.update({"items", "additionalItems"})  # additionalItems inert
            builders = _scalar_pred_builders(items, el_dt, reg, base, stack,
                                             f"{spath}/items")
            for kw, sp, fn in builders:
                # one violation per array when ANY element fails this
                # keyword; per-index paths are static only on the tuple
                # form — the array form reports at the array path.
                pred = null_pass | _forall_ok(col, fn)
                out.append(ColumnCheck(kw, ipath, sp, pred, _detail(col), colname))
        elif isinstance(items, list):
            handled.update({"items", "additionalItems"})
            n_pos = len(items)
            for i, isub in enumerate(items):
                el = F.get(col, i)
                within = F.size(col) > i
                builders = _scalar_pred_builders(isub, el_dt, reg, base, stack,
                                                 f"{spath}/items/{i}")
                for kw, sp, fn in builders:
                    pred = null_pass | ~within | F.coalesce(fn(el), F.lit(True))
                    out.append(ColumnCheck(kw, f"{ipath}[{i}]", sp, pred,
                                           _detail(el), colname))
            addl = node.get("additionalItems", True)
            if addl is False:
                add("additionalItems", null_pass | (F.size(col) <= n_pos),
                    leaf="additionalItems")
            elif isinstance(addl, dict):
                extras = F.slice(col, n_pos + 1,
                                 F.greatest(F.size(col) - n_pos, F.lit(0)))
                builders = _scalar_pred_builders(addl, el_dt, reg, base, stack,
                                                 f"{spath}/additionalItems")
                for kw, sp, fn in builders:
                    pred = null_pass | _forall_ok(extras, fn)
                    out.append(ColumnCheck(kw, ipath, sp, pred, _detail(col), colname))
        elif items is None:
            if "additionalItems" in node:
                handled.add("additionalItems")  # inert without tuple items
    else:
        # array keywords are vacuous on non-array typed values — but a
        # StringType column could hold a JSON array; compile_plan routes
        # those to the dynamic path BEFORE calling us, so vacuous is safe
        # only off strings.
        if not isinstance(dt, T.StringType):
            handled.update({"items", "additionalItems", "minItems",
                            "maxItems", "uniqueItems"})

    # ---- object keywords ----------------------------------------------------
    if isinstance(dt, T.StructType):
        handled |= {"required", "properties", "patternProperties",
                    "additionalProperties", "minProperties", "maxProperties",
                    "dependencies"}
        out.extend(_compile_struct(col, node, dt, spath, ipath, colname,
                                   reg, base, stack))
    elif isinstance(dt, T.MapType):
        handled |= {"required", "properties", "patternProperties",
                    "additionalProperties", "minProperties", "maxProperties",
                    "dependencies"}
        out.extend(_compile_map(col, node, dt, spath, ipath, colname,
                                reg, base, stack))
    elif not isinstance(dt, T.StringType):
        # scalar value can never be a JSON object → vacuous
        handled |= {"required", "properties", "patternProperties",
                    "additionalProperties", "minProperties", "maxProperties",
                    "dependencies"}

    # ---- combinators (any type) ---------------------------------------------
    if "allOf" in node:
        handled.add("allOf")
        for i, b in enumerate(node["allOf"]):
            out.extend(_compile_sub(col, b, dt, f"{spath}/allOf/{i}", ipath,
                                    colname, reg, base, stack))
    if "anyOf" in node:
        handled.add("anyOf")
        preds = [
            _valid_pred(col, b, dt, f"{spath}/anyOf/{i}", ipath, colname, reg, base, stack)
            for i, b in enumerate(node["anyOf"])
        ]
        add("anyOf", null_pass | _or_all(preds), leaf="anyOf")
    if "oneOf" in node:
        handled.add("oneOf")
        preds = [
            _valid_pred(col, b, dt, f"{spath}/oneOf/{i}", ipath, colname, reg, base, stack)
            for i, b in enumerate(node["oneOf"])
        ]
        hits = sum((p.cast("int") for p in preds), F.lit(0))
        add("oneOf", null_pass | (hits == 1), leaf="oneOf")
    if "not" in node:
        handled.add("not")
        p = _valid_pred(col, node["not"], dt, f"{spath}/not", ipath, colname,
                        reg, base, stack)
        add("not", null_pass | ~p, leaf="not")

    extra = set(node) - handled
    if extra:
        raise _NotNative(f"keywords {sorted(extra)} on {dt.simpleString()}")
    return out


def _forall_ok(arr: Column, fn: PredBuilder) -> Column:
    """forall(arr, x -> coalesce(fn(x), true)) with a strictly
    SINGLE-parameter lambda — pyspark binds a second lambda parameter to
    the array index, so closures must capture fn, never default-arg it."""
    def _ok(x: Column) -> Column:
        return F.coalesce(fn(x), F.lit(True))

    return F.forall(arr, _ok)


def _valid_pred(col, node, dt, spath, ipath, colname, reg, base, stack) -> Column:
    """'value satisfies node' as one Column (three-valued-safe): the
    conjunction of the compiled checks with NULL coerced to pass."""
    checks = _compile_sub(col, node, dt, spath, ipath, colname, reg, base, stack)
    return _and_all([F.coalesce(c.predicate, F.lit(True)) for c in checks])


def _compile_struct(col, node, dt: T.StructType, spath, ipath, colname,
                    reg, base, stack) -> list[ColumnCheck]:
    """Object keywords over a typed StructType column (SURVEY 2(a).13):
    checks address nested fields via getField — still pure Column
    expressions, still one codegen stage. A NULL parent struct means the
    object is absent, so every nested check passes."""
    out: list[ColumnCheck] = []
    fields = {f.name: f.dataType for f in dt.fields}
    parent_absent = col.isNull()
    req = list(node.get("required", []) or [])
    props = node.get("properties", {}) or {}
    pat_props = node.get("patternProperties", {}) or {}

    for k in req:
        if k in fields:
            out.append(ColumnCheck(
                "required", f"{ipath}.{k}", f"{spath}/required",
                parent_absent | col.getField(k).isNotNull(),
                F.lit("<absent>"), colname))
        else:
            out.append(ColumnCheck(
                "required", f"{ipath}.{k}", f"{spath}/required",
                parent_absent, F.lit("<missing field>"), colname))

    for k, ksub in props.items():
        if k not in fields:
            continue
        out.extend(_compile_sub(col.getField(k), ksub, fields[k],
                                f"{spath}/properties/{k}", f"{ipath}.{k}",
                                colname, reg, base, stack))
    for rx, psub in pat_props.items():
        try:
            crx = re.compile(python_pattern(rx))
        except re.error as exc:
            raise _NotNative(f"bad patternProperties regex {rx!r}") from exc
        for k in fields:
            if crx.search(k):
                out.extend(_compile_sub(col.getField(k), psub, fields[k],
                                        f"{spath}/patternProperties/{rx}",
                                        f"{ipath}.{k}", colname, reg, base, stack))

    addl = node.get("additionalProperties", True)
    declared = set(props)
    pat_res = [re.compile(python_pattern(rx)) for rx in pat_props]
    if addl is not True:
        for k in fields:
            if k in declared or any(crx.search(k) for crx in pat_res):
                continue
            if addl is False:
                out.append(ColumnCheck(
                    "additionalProperties", f"{ipath}.{k}",
                    f"{spath}/additionalProperties",
                    parent_absent | col.getField(k).isNull(),
                    F.lit("<extra key>"), colname))
            else:
                out.extend(_compile_sub(col.getField(k), addl, fields[k],
                                        f"{spath}/additionalProperties",
                                        f"{ipath}.{k}", colname, reg, base, stack))

    if "maxProperties" in node or "minProperties" in node:
        present = sum(
            (F.when(col.getField(f.name).isNotNull(), 1).otherwise(0)
             for f in dt.fields),
            F.lit(0),
        )
        if "maxProperties" in node:
            out.append(ColumnCheck("maxProperties", ipath, f"{spath}/maxProperties",
                                   parent_absent | (present <= node["maxProperties"]),
                                   present.cast("string"), colname))
        if "minProperties" in node:
            out.append(ColumnCheck("minProperties", ipath, f"{spath}/minProperties",
                                   parent_absent | (present >= node["minProperties"]),
                                   present.cast("string"), colname))

    for k, dep in (node.get("dependencies") or {}).items():
        trigger = (col.getField(k).isNotNull() if k in fields else F.lit(False))
        if isinstance(dep, dict):
            sub_checks = _compile_sub(col, dep, dt, f"{spath}/dependencies/{k}",
                                      ipath, colname, reg, base, stack)
            for c in sub_checks:
                out.append(ColumnCheck(
                    c.keyword, c.instance_path, c.schema_path,
                    ~trigger | F.coalesce(c.predicate, F.lit(True)),
                    c.detail, colname))
        else:
            dl = [dep] if isinstance(dep, str) else list(dep)
            for dk in dl:
                dk_present = (col.getField(dk).isNotNull()
                              if dk in fields else F.lit(False))
                out.append(ColumnCheck(
                    "dependencies", f"{ipath}.{dk}", f"{spath}/dependencies",
                    parent_absent | ~trigger | dk_present,
                    F.lit("<dependency>"), colname))
    return out


def _compile_map(col, node, dt: T.MapType, spath, ipath, colname,
                 reg, base, stack) -> list[ColumnCheck]:
    """Object keywords over open-key MapType columns (SURVEY 2(a).12/14/15)
    via higher-order functions — map_contains_key / size / forall."""
    out: list[ColumnCheck] = []
    absent = col.isNull()
    v_dt = dt.valueType

    for k in node.get("required", []) or []:
        out.append(ColumnCheck("required", f"{ipath}.{k}", f"{spath}/required",
                               absent | F.map_contains_key(col, F.lit(k)),
                               F.lit("<absent>"), colname))
    if "minProperties" in node:
        out.append(ColumnCheck("minProperties", ipath, f"{spath}/minProperties",
                               absent | (F.size(col) >= node["minProperties"]),
                               F.size(col).cast("string"), colname))
    if "maxProperties" in node:
        out.append(ColumnCheck("maxProperties", ipath, f"{spath}/maxProperties",
                               absent | (F.size(col) <= node["maxProperties"]),
                               F.size(col).cast("string"), colname))

    declared = set(node.get("properties", {}) or {})
    pat_specs = node.get("patternProperties", {}) or {}
    for rx in pat_specs:
        if java_safe_pattern(rx) is None:
            raise _NotNative(f"patternProperties regex dialect {rx!r}")
    addl = node.get("additionalProperties", True)
    if addl is False:
        allowed_keys = sorted(declared)
        pat_list = [java_safe_pattern(rx) for rx in pat_specs]

        def _covered(k):  # MUST stay single-parameter (pyspark HOF arity)
            p = k.isin(allowed_keys) if allowed_keys else F.lit(False)
            for rx in pat_list:
                p = p | k.rlike(rx)
            return p

        out.append(ColumnCheck("additionalProperties", ipath,
                               f"{spath}/additionalProperties",
                               absent | F.forall(F.map_keys(col), _covered),
                               F.lit("<extra key>"), colname))
    elif isinstance(addl, dict):
        allowed_keys = sorted(declared)
        pat_list = [java_safe_pattern(rx) for rx in pat_specs]
        vfn = _scalar_valid_builder(addl, v_dt, reg, base, stack,
                                    f"{spath}/additionalProperties")
        ak, pl = allowed_keys, pat_list

        def _extra_ok(e):  # MUST stay single-parameter (pyspark HOF arity)
            k, v = e.getField("key"), e.getField("value")
            known = k.isin(ak) if ak else F.lit(False)
            for rx in pl:
                known = known | k.rlike(rx)
            return F.when(known, F.lit(True)).otherwise(
                F.coalesce(vfn(v), F.lit(True)))

        out.append(ColumnCheck("additionalProperties", ipath,
                               f"{spath}/additionalProperties",
                               absent | F.forall(F.map_entries(col), _extra_ok),
                               F.lit("<extra value>"), colname))

    # properties / patternProperties value checks (full scalar keyword set,
    # fail-closed: anything richer raises _NotNative → Arrow wrapper)
    for k, vsub in (node.get("properties", {}) or {}).items():
        if not isinstance(vsub, dict) or not vsub:
            continue
        builders = _scalar_pred_builders(vsub, v_dt, reg, base, stack,
                                         f"{spath}/properties/{k}")
        val = F.element_at(col, F.lit(k))
        has_k = F.map_contains_key(col, F.lit(k))
        for kw, sp, fn in builders:
            out.append(ColumnCheck(
                kw, f"{ipath}.{k}", sp,
                absent | ~has_k | F.coalesce(fn(val), F.lit(True)),
                F.substring(val.cast("string"), 1, 64), colname))
    for rx, vsub in pat_specs.items():
        if not isinstance(vsub, dict) or not vsub:
            continue
        vfn = _scalar_valid_builder(vsub, v_dt, reg, base, stack,
                                    f"{spath}/patternProperties/{rx}")
        jrx = java_safe_pattern(rx)

        def _mk_entry_ok(jrx, vfn):
            def entry_ok(e):  # single-parameter (pyspark HOF arity)
                k, v = e.getField("key"), e.getField("value")
                return F.when(k.rlike(jrx),
                              F.coalesce(vfn(v), F.lit(True))).otherwise(F.lit(True))
            return entry_ok

        entry_ok = _mk_entry_ok(jrx, vfn)
        out.append(ColumnCheck(
            "patternProperties", ipath, f"{spath}/patternProperties/{rx}",
            absent | F.forall(F.map_entries(col), entry_ok),
            F.lit("<pattern value>"), colname))

    for k, dep in (node.get("dependencies") or {}).items():
        trigger = F.coalesce(F.map_contains_key(col, F.lit(k)), F.lit(False))
        if isinstance(dep, dict):
            # _compile_sub, not _compile_map: the dep schema gets the full
            # fail-closed keyword check, not just the object subset
            sub_checks = _compile_sub(col, dep, dt, f"{spath}/dependencies/{k}",
                                      ipath, colname, reg, base, stack)
            for c in sub_checks:
                out.append(ColumnCheck(
                    c.keyword, c.instance_path, c.schema_path,
                    ~trigger | F.coalesce(c.predicate, F.lit(True)),
                    c.detail, colname))
        else:
            dl = [dep] if isinstance(dep, str) else list(dep)
            for dk in dl:
                out.append(ColumnCheck(
                    "dependencies", f"{ipath}.{dk}", f"{spath}/dependencies",
                    absent | ~trigger | F.map_contains_key(col, F.lit(dk)),
                    F.lit("<dependency>"), colname))
    return out


# ---------------------------------------------------------------------------
# dynamic-JSON detection & Arrow wrapper fallback
# ---------------------------------------------------------------------------


def _string_is_dynamic(sub: Any, reg: SchemaRegistry, base: str,
                       stack: tuple = ()) -> bool:
    """Does this subschema, applied to a StringType column, demand JSON
    interpretation (the column holds a serialized document)? Container
    keywords or container types anywhere reachable say yes; plain string
    scalars stay on the raw-string contract."""
    if not isinstance(sub, dict):
        return False
    if "$ref" in sub:
        try:
            target, nb, _ = reg.resolve(sub["$ref"], base)
        except Exception:
            return True  # unresolvable here → let the dynamic path report
        if id(target) in stack:
            return True  # cyclic → dynamic by definition
        return _string_is_dynamic(target, reg, nb, stack + (id(target),))
    if set(sub) & _JSON_CONTAINER_KEYWORDS:
        return True
    types = sub.get("type")
    if types is not None:
        tlist = types if isinstance(types, list) else [types]
        if any(t in ("object", "array") for t in tlist):
            return True
    if any(isinstance(m, (list, dict)) for m in sub.get("enum", []) or []):
        return True
    for comb in ("allOf", "anyOf", "oneOf"):
        for b in sub.get(comb, []) or []:
            if _string_is_dynamic(b, reg, base, stack):
                return True
    if "not" in sub and _string_is_dynamic(sub["not"], reg, base, stack):
        return True
    return False


def _arrow_wrapper_spec(name: str, sub: Any, reg: SchemaRegistry,
                        root_uri: str) -> ArrowColumnSpec:
    """Complete fallback for a typed column whose subschema exceeds the
    native set: serialize the single value per row (``to_json(struct)``,
    still vectorized JVM-side) and run the compiled Python closure
    validator on the Arrow path. The wrapper object schema reproduces the
    table convention exactly: instance paths ``$.{name}…``, schema paths
    ``{root}#/properties/{name}/…``; a NULL column serializes to ``{}``
    (ignoreNullFields), i.e. ABSENT, preserving the typed null contract."""
    wrapper = {"type": "object", "properties": {name: sub}}
    validator = compile_python_validator(wrapper, registry=reg, base_uri=root_uri)
    payload = F.to_json(F.struct(F.col(name).alias(name)))
    return ArrowColumnSpec(column=name, validator=validator,
                           instance_prefix="$", payload=payload)


# ---------------------------------------------------------------------------
# defaults / enum-as-table helpers (SURVEY 2(a).26, 2(a).2)
# ---------------------------------------------------------------------------


def defaults_projection(schema: dict, df_columns: list[str]) -> list[Column]:
    """Native `default` insertion (reference: Themis enable_defaults,
    SURVEY 2(a).26): a coalesce projection emitted BEFORE the validation
    pass. Ours never mutates the input table — callers select these
    columns into a derived frame."""
    out: list[Column] = []
    props = schema.get("properties", {}) or {}
    for name in df_columns:
        sub = props.get(name)
        if isinstance(sub, dict) and "default" in sub:
            out.append(F.coalesce(F.col(name), F.lit(sub["default"])).alias(name))
        else:
            out.append(F.col(name))
    return out


def semi_join_filter(df, col: str, allowed_df, allowed_col: str,
                     broadcast_allowed: bool = True):
    """df rows whose `col` IS in the allowed set — broadcast left-semi
    join (the enum-as-table regime for web-scale allowlists, SURVEY
    2(a).2: enums too large for an isin literal list)."""
    keys = allowed_df.select(F.col(allowed_col).alias("__allowed")).dropDuplicates(["__allowed"])
    if broadcast_allowed:
        keys = F.broadcast(keys)
    return df.join(keys, df[col] == keys["__allowed"], "left_semi")


# ---------------------------------------------------------------------------
# table-level compile (reference EP1 analogue)
# ---------------------------------------------------------------------------

_ROOT_KEYWORDS = ({"type", "properties", "required", "dependencies",
                   "patternProperties", "additionalProperties",
                   "minProperties", "maxProperties",
                   "allOf", "anyOf", "oneOf", "not"} | _ANNOTATIONS)


def compile_plan(
    schema: dict,
    table_schema: T.StructType,
    registry: SchemaRegistry | None = None,
    variant_unroll_depth: int = 3,
    json_columns: set | frozenset | None = None,
) -> CompiledPlan:
    """Compile a root object schema against a typed table's StructType.

    Each top-level property maps to a column. Native-expressible
    subschemas become Column checks; dynamic JSON string columns go to
    the Variant-native/Arrow path; every other inexpressible subschema
    gets a complete Arrow wrapper spec (fail-closed — see module
    docstring). Unsupported ROOT keywords raise UnsupportedSchemaError.

    ``json_columns``: StringType columns to ALWAYS treat as serialized
    JSON documents. By default a string column is treated as a plain
    string value unless its subschema mentions container keywords/types
    (``_string_is_dynamic``) — a column holding e.g. ``"30"`` that must
    validate as the NUMBER 30 is ambiguous and needs this declaration.
    """
    registry, root_uri = parse_schema(schema, registry)
    if schema.get("type") not in (None, "object"):
        raise ValueError("table-level compile expects a root object schema")

    unknown_root = set(schema) - _ROOT_KEYWORDS
    if unknown_root:
        raise UnsupportedSchemaError(
            f"root keywords {sorted(unknown_root)} are not supported over "
            f"typed tables (fail-closed; wrap the dynamic part in a JSON column)")

    plan = CompiledPlan(root_uri=root_uri)
    fields = {f.name: f.dataType for f in table_schema.fields}
    plan._json_columns = frozenset(json_columns or ())
    _compile_object_level(schema, f"{root_uri}#", plan, fields, registry,
                          root_uri, variant_unroll_depth)
    return plan


def _compile_object_level(node: dict, spath: str, plan: CompiledPlan,
                          fields: dict, registry: SchemaRegistry,
                          root_uri: str, unroll: int) -> None:
    """One object level of the ROOT schema applied to table columns.
    Recurses for root allOf branches; anyOf/oneOf/not compose natively
    via row predicates."""
    required = set(node.get("required", []) or [])
    props: dict[str, Any] = dict(node.get("properties", {}) or {})
    for name in sorted(required - set(props)):
        props[name] = {}

    for name, sub in props.items():
        _compile_column(name, sub, name in required, spath, plan, fields,
                        registry, root_uri, unroll)

    # patternProperties at root: compile-time name matching over columns
    for rx, psub in (node.get("patternProperties") or {}).items():
        try:
            crx = re.compile(python_pattern(rx))
        except re.error as exc:
            raise UnsupportedSchemaError(f"bad root patternProperties {rx!r}") from exc
        for name in fields:
            if crx.search(name) and name not in props:
                _compile_column(name, psub, False,
                                spath, plan, fields, registry, root_uri, unroll,
                                spath_leaf=f"patternProperties/{rx}")

    # additionalProperties at root: undeclared columns must be absent /
    # match the additional schema (a typed table CAN have extra columns —
    # they must be NULL for additionalProperties=false rows to validate)
    addl = node.get("additionalProperties", True)
    if addl is not True:
        pat_res = [re.compile(python_pattern(rx))
                   for rx in (node.get("patternProperties") or {})]
        for name in fields:
            if name in props or any(crx.search(name) for crx in pat_res):
                continue
            if addl is False:
                plan.checks.append(ColumnCheck(
                    "additionalProperties", f"$.{name}",
                    f"{spath}/additionalProperties",
                    F.col(name).isNull(), F.lit("<extra column>"), name))
                plan.columns_needed.add(name)
            else:
                _compile_column(name, addl, False, spath, plan, fields,
                                registry, root_uri, unroll,
                                spath_leaf="additionalProperties")

    if "minProperties" in node or "maxProperties" in node:
        present = sum((F.when(F.col(c).isNotNull(), 1).otherwise(0)
                       for c in fields), F.lit(0))
        plan.columns_needed.update(fields)
        if "minProperties" in node:
            plan.checks.append(ColumnCheck(
                "minProperties", "$", f"{spath}/minProperties",
                present >= node["minProperties"], present.cast("string"), "*"))
        if "maxProperties" in node:
            plan.checks.append(ColumnCheck(
                "maxProperties", "$", f"{spath}/maxProperties",
                present <= node["maxProperties"], present.cast("string"), "*"))

    # dependencies at root (round-1 verdict item 9): cross-column presence
    # and gated schema-form checks — native F.when logic
    for k, dep in (node.get("dependencies") or {}).items():
        trigger = (F.col(k).isNotNull() if k in fields else F.lit(False))
        if k in fields:
            plan.columns_needed.add(k)
        if isinstance(dep, dict):
            branch_checks = _root_branch_checks(dep, f"{spath}/dependencies/{k}",
                                                fields, registry, root_uri, plan)
            for c in branch_checks:
                plan.checks.append(ColumnCheck(
                    c.keyword, c.instance_path, c.schema_path,
                    ~trigger | F.coalesce(c.predicate, F.lit(True)),
                    c.detail, c.column))
        else:
            dl = [dep] if isinstance(dep, str) else list(dep)
            for dk in dl:
                dk_present = F.col(dk).isNotNull() if dk in fields else F.lit(False)
                if dk in fields:
                    plan.columns_needed.add(dk)
                plan.checks.append(ColumnCheck(
                    "dependencies", f"$.{dk}", f"{spath}/dependencies",
                    ~trigger | dk_present, F.lit("<dependency>"), k))

    # root combinators over typed columns (round-1 verdict items 1–2)
    if "allOf" in node:
        for i, b in enumerate(node["allOf"]):
            if not isinstance(b, dict):
                continue
            unknown = set(b) - _ROOT_KEYWORDS
            if unknown:
                raise UnsupportedSchemaError(
                    f"root allOf branch keywords {sorted(unknown)} unsupported")
            _compile_object_level(b, f"{spath}/allOf/{i}", plan, fields,
                                  registry, root_uri, unroll)
    for comb in ("anyOf", "oneOf"):
        if comb in node:
            preds = []
            for i, b in enumerate(node[comb]):
                checks = _root_branch_checks(b, f"{spath}/{comb}/{i}", fields,
                                             registry, root_uri, plan)
                preds.append(_and_all(
                    [F.coalesce(c.predicate, F.lit(True)) for c in checks]))
            pred = _or_all(preds) if comb == "anyOf" else (
                sum((p.cast("int") for p in preds), F.lit(0)) == 1)
            plan.checks.append(ColumnCheck(
                comb, "$", f"{spath}/{comb}", pred, F.lit(f"<{comb}>"), "*"))
    if "not" in node:
        checks = _root_branch_checks(node["not"], f"{spath}/not", fields,
                                     registry, root_uri, plan)
        p = _and_all([F.coalesce(c.predicate, F.lit(True)) for c in checks])
        plan.checks.append(ColumnCheck(
            "not", "$", f"{spath}/not", ~p, F.lit("<not>"), "*"))


def _root_branch_checks(branch: Any, spath: str, fields: dict,
                        registry: SchemaRegistry, root_uri: str,
                        plan: CompiledPlan) -> list[ColumnCheck]:
    """Native checks for a root combinator/dependency branch (an object
    schema over table columns). Fail-closed: anything the native path
    can't express raises UnsupportedSchemaError — a branch predicate
    cannot be partially evaluated."""
    if not isinstance(branch, dict):
        return []
    allowed = {"required", "properties", "dependencies", "type"} | _ANNOTATIONS
    unknown = set(branch) - allowed
    if unknown:
        raise UnsupportedSchemaError(
            f"root branch keywords {sorted(unknown)} not natively expressible "
            f"over typed columns at {spath}")
    out: list[ColumnCheck] = []
    for name in branch.get("required", []) or []:
        pred = F.col(name).isNotNull() if name in fields else F.lit(False)
        if name in fields:
            plan.columns_needed.add(name)
        out.append(ColumnCheck("required", f"$.{name}", f"{spath}/required",
                               pred, F.lit("<absent>"), name))
    for name, sub in (branch.get("properties") or {}).items():
        if name not in fields:
            continue
        plan.columns_needed.add(name)
        try:
            out.extend(_compile_sub(F.col(name), sub, fields[name],
                                    f"{spath}/properties/{name}", f"$.{name}",
                                    name, registry, root_uri))
        except _NotNative as exc:
            raise UnsupportedSchemaError(
                f"root branch property {name!r} at {spath}: {exc}") from exc
    for k, dep in (branch.get("dependencies") or {}).items():
        trigger = F.col(k).isNotNull() if k in fields else F.lit(False)
        if not isinstance(dep, dict):
            dl = [dep] if isinstance(dep, str) else list(dep)
            for dk in dl:
                dk_present = F.col(dk).isNotNull() if dk in fields else F.lit(False)
                out.append(ColumnCheck("dependencies", f"$.{dk}",
                                       f"{spath}/dependencies",
                                       ~trigger | dk_present,
                                       F.lit("<dependency>"), k))
        else:
            raise UnsupportedSchemaError(
                f"schema-form dependencies inside a root branch at {spath}")
    return out


def _compile_column(name: str, sub: Any, is_required: bool, spath_base: str,
                    plan: CompiledPlan, fields: dict,
                    registry: SchemaRegistry, root_uri: str, unroll: int,
                    spath_leaf: str | None = None) -> None:
    """Dispatch one (column, subschema) pair to the right compile path."""
    spath = f"{spath_base}/{spath_leaf}" if spath_leaf else f"{spath_base}/properties/{name}"
    if name not in fields:
        if is_required:
            # column missing entirely: constant violation
            plan.checks.append(
                ColumnCheck("required", f"$.{name}", f"{spath}/required",
                            F.lit(False), F.lit("<missing column>"), name))
        return
    dt = fields[name]
    plan.columns_needed.add(name)

    if is_required:
        # presence: SQL NULL == absent (typed-table contract)
        plan.checks.append(
            ColumnCheck("required", f"$.{name}", f"{spath}/required",
                        F.col(name).isNotNull(), F.lit("<absent>"), name))

    if not isinstance(sub, dict) or not sub:
        return

    # dynamic JSON string column? → Variant-native bounded unroll, else the
    # full Arrow JSON path (cyclic $refs via compiled-closure recursion,
    # deep equality, ECMA regex, combinators over unknown shapes).
    forced_json = name in getattr(plan, "_json_columns", ())
    if isinstance(dt, T.StringType) and (
            forced_json or _string_is_dynamic(sub, registry, root_uri)):
        from themis_spark.plans.variant_native import try_compile_variant_native

        # the alias doubles as the error message: selecting
        # violations_col() on a frame that skipped plan.prepare(df)
        # fails analysis with this name spelled out in the exception
        valias = f"__variant_{name}__run_plan_prepare_first"
        vn = (
            try_compile_variant_native(
                name, sub, registry, root_uri, unroll,
                parsed=F.col(valias),
            )
            if unroll > 0
            else None
        )
        if vn is not None:
            plan.variant_sources[valias] = name
            plan.variant_arrays.append(vn.violations_array)
            if vn.deep_guard is not None:
                sub_validator = compile_python_validator(
                    sub, registry=registry, base_uri=root_uri
                )
                plan.arrow_specs.append(
                    ArrowColumnSpec(name, sub_validator, f"$.{name}",
                                    gate=vn.deep_guard)
                )
        else:
            sub_validator = compile_python_validator(
                sub, registry=registry, base_uri=root_uri
            )
            plan.arrow_specs.append(ArrowColumnSpec(name, sub_validator, f"$.{name}"))
        return

    # typed column: try the complete native compile; on _NotNative fall
    # back to the Arrow wrapper (never silently under-validate)
    try:
        plan.checks.extend(
            _compile_sub(F.col(name), sub, dt, spath, f"$.{name}", name,
                         registry, root_uri)
        )
    except _NotNative:
        plan.arrow_specs.append(_arrow_wrapper_spec(name, sub, registry, root_uri))

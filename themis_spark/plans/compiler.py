"""Compile a draft-4 schema against a typed Spark table into a fused plan.

Split per SURVEY.md §2(a): every keyword that is expressible as a native
Spark ``Column`` predicate compiles to one (Catalyst whole-stage codegen —
the Spark analogue of the reference's AOT schema→JS codegen in
playlyfe/themis src/themis.js); anything dynamic (nested JSON columns,
cyclic $refs, combinators over unknown shapes) falls back to a vectorized
Arrow batch validator built on plans/pyvalidator.py.

Typed-table null contract (SURVEY.md §7.3): SQL NULL in a typed column
means the JSON property is ABSENT. Hence `required` fails on NULL, while
value keywords (pattern, enum, bounds, …) pass on NULL — draft-4 keywords
constrain only values of the matching type.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from themis_spark.plans.parser import SchemaRegistry, parse_schema
from themis_spark.plans.pyvalidator import PyValidator, compile_python_validator

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_NUMERIC = _INTEGRAL + (T.FloatType, T.DoubleType, T.DecimalType)

#: keywords the native column path can always express on a scalar column
_NATIVE_SAFE = {
    "type", "enum", "pattern", "required", "minLength", "maxLength",
    "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
    "multipleOf", "format", "minItems", "maxItems", "uniqueItems", "items",
    "default", "id", "description", "title", "definitions",
}


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
    """A JSON-string column validated on the vectorized Arrow path.

    ``gate`` (optional): only rows satisfying it carry real payloads into
    the Python batch — the UDF input is NULLed otherwise (hybrid
    native/Arrow execution: the Arrow pass handles just the residue the
    bounded-unroll native compile couldn't express, see
    plans/variant_native.py)."""

    column: str
    validator: PyValidator
    instance_prefix: str
    gate: Column | None = None


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
                F.when(spec.gate, F.col(spec.column))
                if spec.gate is not None
                else F.col(spec.column)
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
        return isinstance(dt, (T.StringType, T.TimestampType, T.DateType))
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


def _is_native_expressible(sub: Any) -> bool:
    if not isinstance(sub, dict):
        return True
    return all(k in _NATIVE_SAFE for k in sub) and not isinstance(sub.get("items"), list)


def _compile_scalar_checks(
    name: str, sub: dict, dt: T.DataType, spath: str, required: bool
) -> list[ColumnCheck]:
    """Native checks for one column against one (simple) subschema."""
    col = F.col(name)
    ipath = f"$.{name}"
    out: list[ColumnCheck] = []

    def add(keyword: str, pred: Column, leaf: str | None = None) -> None:
        out.append(
            ColumnCheck(keyword, ipath, f"{spath}/{leaf or keyword}", pred, _detail(col), name)
        )

    if required:
        # presence: SQL NULL == absent (typed-table contract)
        out.append(
            ColumnCheck(
                "required", ipath, f"{spath}/required",
                col.isNotNull(), F.lit("<absent>"), name,
            )
        )

    null_pass = col.isNull()  # value keywords pass when absent

    if "type" in sub:
        types = sub["type"] if isinstance(sub["type"], list) else [sub["type"]]
        compatible = any(_type_compatible(t, dt) for t in types)
        if not compatible:
            # compile-time type mismatch: every present value violates
            add("type", null_pass)
        elif isinstance(dt, T.DoubleType) and types == ["integer"]:
            # draft-4: 1.0 is an integer; fractional doubles are not
            add("type", null_pass | (col == F.floor(col)))
        # otherwise: satisfied at schema level — zero runtime cost

    if "enum" in sub:
        scalars = [
            m for m in sub["enum"]
            if isinstance(m, (str, int, float)) and not isinstance(m, bool)
        ]
        add("enum", null_pass | col.isin(scalars))

    if "pattern" in sub:
        # ECMA-262 search ≈ Java regex search for the common subset; the
        # Arrow path handles incompatible dialects (SURVEY §7.3).
        add("pattern", null_pass | col.rlike(sub["pattern"]))

    if "minLength" in sub:
        add("minLength", null_pass | (F.length(col) >= sub["minLength"]))
    if "maxLength" in sub:
        add("maxLength", null_pass | (F.length(col) <= sub["maxLength"]))

    if "minimum" in sub:
        pred = (col > sub["minimum"]) if sub.get("exclusiveMinimum") else (col >= sub["minimum"])
        add("exclusiveMinimum" if sub.get("exclusiveMinimum") else "minimum",
            null_pass | pred, leaf="minimum")
    if "maximum" in sub:
        pred = (col < sub["maximum"]) if sub.get("exclusiveMaximum") else (col <= sub["maximum"])
        add("exclusiveMaximum" if sub.get("exclusiveMaximum") else "maximum",
            null_pass | pred, leaf="maximum")

    if "multipleOf" in sub:
        n = sub["multipleOf"]
        if isinstance(n, int) and isinstance(dt, _INTEGRAL):
            pred = F.pmod(col, F.lit(n)) == 0
        else:
            # exact decimal modulus defeats binary-float noise
            scale = max(len(str(n).split(".")[-1]) if "." in str(n) else 0, 6)
            dec = T.DecimalType(38, scale + 6)
            pred = F.pmod(col.cast(dec), F.lit(n).cast(dec)) == 0
        add("multipleOf", null_pass | pred)

    if "format" in sub and isinstance(dt, T.StringType):
        fmt = sub["format"]
        if fmt == "date-time":
            add("format", null_pass | F.try_to_timestamp(col).isNotNull())
        elif fmt in _FORMAT_REGEX:
            add("format", null_pass | col.rlike(_FORMAT_REGEX[fmt]))

    if isinstance(dt, T.ArrayType):
        if "minItems" in sub:
            add("minItems", null_pass | (F.size(col) >= sub["minItems"]))
        if "maxItems" in sub:
            add("maxItems", null_pass | (F.size(col) <= sub["maxItems"]))
        if sub.get("uniqueItems") is True:
            add("uniqueItems", null_pass | (F.size(F.array_distinct(col)) == F.size(col)))
        items = sub.get("items")
        if isinstance(items, dict) and "type" in items:
            el_ok = _element_type_pred(items["type"], dt.elementType)
            if el_ok is not None:
                add("items", null_pass | F.forall(col, el_ok), leaf="items/type")

    return out


def _element_type_pred(json_type: str, el_dt: T.DataType):
    if _type_compatible(json_type, el_dt):
        return lambda x: x.isNotNull()
    return lambda x: F.lit(False)


def _value_lambda(sub: dict):
    """Build a Column→Column predicate for simple value subschemas (used
    inside higher-order map/array checks). Returns None if the subschema
    needs more than scalar bounds/pattern."""
    simple = {"type", "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
              "minLength", "maxLength", "pattern", "enum"}
    if not isinstance(sub, dict) or not set(sub) <= simple:
        return None

    def pred(v: Column) -> Column:
        p = F.lit(True)
        if "minimum" in sub:
            p = p & ((v > sub["minimum"]) if sub.get("exclusiveMinimum") else (v >= sub["minimum"]))
        if "maximum" in sub:
            p = p & ((v < sub["maximum"]) if sub.get("exclusiveMaximum") else (v <= sub["maximum"]))
        if "minLength" in sub:
            p = p & (F.length(v) >= sub["minLength"])
        if "maxLength" in sub:
            p = p & (F.length(v) <= sub["maxLength"])
        if "pattern" in sub:
            p = p & v.rlike(sub["pattern"])
        if "enum" in sub:
            p = p & v.isin([m for m in sub["enum"] if not isinstance(m, bool)])
        return p

    return pred


def _compile_struct_checks(name: str, col: Column, sub: dict, dt: T.StructType,
                           spath: str, ipath: str) -> list[ColumnCheck]:
    """Recurse `properties` into a typed StructType column (SURVEY
    2(a).13): checks address nested fields via getField — still pure
    Column expressions, still one codegen stage. A NULL parent struct
    means the object is absent, so every nested check passes."""
    out: list[ColumnCheck] = []
    fields = {f.name: f.dataType for f in dt.fields}
    parent_absent = col.isNull()
    req = set(sub.get("required", []))
    props = sub.get("properties", {}) or {}
    for k in sorted(req - set(props)):
        props = {**props, k: {}}
    for k, ksub in props.items():
        if k not in fields:
            if k in req:
                out.append(ColumnCheck(
                    "required", f"{ipath}.{k}", f"{spath}/properties/{k}/required",
                    parent_absent, F.lit("<missing field>"), name))
            continue
        fcol = col.getField(k)
        fpath = f"{ipath}.{k}"
        fspath = f"{spath}/properties/{k}"
        if k in req:
            out.append(ColumnCheck(
                "required", fpath, f"{fspath}/required",
                parent_absent | fcol.isNotNull(), F.lit("<absent>"), name))
        if isinstance(fields[k], T.StructType) and isinstance(ksub, dict) and "properties" in ksub:
            out.extend(_compile_struct_checks(name, fcol, ksub, fields[k], fspath, fpath))
        elif isinstance(ksub, dict):
            for c in _compile_scalar_checks_on(fcol, ksub, fields[k], fspath, fpath, name):
                out.append(c)
    if "maxProperties" in sub or "minProperties" in sub:
        present = sum(
            (F.when(col.getField(f.name).isNotNull(), 1).otherwise(0) for f in dt.fields),
            F.lit(0),
        )
        if "maxProperties" in sub:
            out.append(ColumnCheck("maxProperties", ipath, f"{spath}/maxProperties",
                                   parent_absent | (present <= sub["maxProperties"]),
                                   present.cast("string"), name))
        if "minProperties" in sub:
            out.append(ColumnCheck("minProperties", ipath, f"{spath}/minProperties",
                                   parent_absent | (present >= sub["minProperties"]),
                                   present.cast("string"), name))
    return out


def _compile_map_checks(name: str, col: Column, sub: dict, dt: T.MapType,
                        spath: str, ipath: str) -> list[ColumnCheck]:
    """Object keywords over open-key MapType columns (SURVEY 2(a).12/14/15)
    via higher-order functions — map_contains_key / size / forall."""
    out: list[ColumnCheck] = []
    absent = col.isNull()

    for k in sub.get("required", []):
        out.append(ColumnCheck("required", f"{ipath}.{k}", f"{spath}/required",
                               absent | F.map_contains_key(col, F.lit(k)),
                               F.lit("<absent>"), name))
    if "minProperties" in sub:
        out.append(ColumnCheck("minProperties", ipath, f"{spath}/minProperties",
                               absent | (F.size(col) >= sub["minProperties"]),
                               F.size(col).cast("string"), name))
    if "maxProperties" in sub:
        out.append(ColumnCheck("maxProperties", ipath, f"{spath}/maxProperties",
                               absent | (F.size(col) <= sub["maxProperties"]),
                               F.size(col).cast("string"), name))

    declared = set(sub.get("properties", {}) or {})
    pat_specs = sub.get("patternProperties", {}) or {}
    if sub.get("additionalProperties") is False:
        allowed_keys = sorted(declared)
        pat_list = list(pat_specs)

        def _covered(k):  # MUST stay single-parameter (pyspark HOF arity)
            p = k.isin(allowed_keys) if allowed_keys else F.lit(False)
            for rx in pat_list:
                p = p | k.rlike(rx)
            return p

        out.append(ColumnCheck("additionalProperties", ipath, f"{spath}/additionalProperties",
                               absent | F.forall(F.map_keys(col), _covered),
                               F.lit("<extra key>"), name))

    # properties / patternProperties value checks (simple value schemas)
    for k, vsub in (sub.get("properties", {}) or {}).items():
        vp = _value_lambda(vsub)
        if vp is not None and vsub:
            val = F.element_at(col, F.lit(k))
            out.append(ColumnCheck("properties", f"{ipath}.{k}", f"{spath}/properties/{k}",
                                   absent | val.isNull() | vp(val),
                                   F.substring(val.cast("string"), 1, 64), name))
    for rx, vsub in pat_specs.items():
        vp = _value_lambda(vsub)
        if vp is not None and vsub:
            def entry_ok(k, v, rx=rx, vp=vp):
                return F.when(k.rlike(rx), vp(v)).otherwise(F.lit(True))

            out.append(ColumnCheck(
                "patternProperties", ipath, f"{spath}/patternProperties/{rx}",
                absent | F.forall(F.map_entries(col),
                                  lambda e: entry_ok(e.getField("key"), e.getField("value"))),
                F.lit("<pattern value>"), name))
    return out


def _compile_scalar_checks_on(col: Column, sub: dict, dt: T.DataType,
                              spath: str, ipath: str, colname: str) -> list[ColumnCheck]:
    """Scalar keyword checks against an arbitrary Column expression
    (nested field) — same semantics as _compile_scalar_checks but without
    the top-level naming/required handling."""
    out: list[ColumnCheck] = []
    null_pass = col.isNull()

    def add(keyword: str, pred: Column, leaf: str | None = None) -> None:
        out.append(ColumnCheck(keyword, ipath, f"{spath}/{leaf or keyword}", pred,
                               F.substring(col.cast("string"), 1, 64), colname))

    if "type" in sub:
        types = sub["type"] if isinstance(sub["type"], list) else [sub["type"]]
        if not any(_type_compatible(t, dt) for t in types):
            add("type", null_pass)
    if "enum" in sub:
        add("enum", null_pass | col.isin([m for m in sub["enum"] if not isinstance(m, bool)]))
    if "pattern" in sub:
        add("pattern", null_pass | col.rlike(sub["pattern"]))
    if "minLength" in sub:
        add("minLength", null_pass | (F.length(col) >= sub["minLength"]))
    if "maxLength" in sub:
        add("maxLength", null_pass | (F.length(col) <= sub["maxLength"]))
    if "minimum" in sub:
        pred = (col > sub["minimum"]) if sub.get("exclusiveMinimum") else (col >= sub["minimum"])
        add("exclusiveMinimum" if sub.get("exclusiveMinimum") else "minimum", null_pass | pred, leaf="minimum")
    if "maximum" in sub:
        pred = (col < sub["maximum"]) if sub.get("exclusiveMaximum") else (col <= sub["maximum"])
        add("exclusiveMaximum" if sub.get("exclusiveMaximum") else "maximum", null_pass | pred, leaf="maximum")
    if isinstance(dt, T.ArrayType):
        if "minItems" in sub:
            add("minItems", null_pass | (F.size(col) >= sub["minItems"]))
        if "maxItems" in sub:
            add("maxItems", null_pass | (F.size(col) <= sub["maxItems"]))
        if sub.get("uniqueItems") is True:
            add("uniqueItems", null_pass | (F.size(F.array_distinct(col)) == F.size(col)))
    return out


# Java-regex format table (draft-4 validation §7 built-ins minus date-time,
# which uses try_to_timestamp natively).
_FORMAT_REGEX = {
    "email": r"^[^@\s]+@[^@\s]+\.[^@\s]+$",
    "hostname": r"^[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?(\.[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$",
    "ipv4": r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
    "uri": r"^[a-zA-Z][a-zA-Z0-9+.-]*:",
}


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


def enum_broadcast_predicate(col: Column | str, allowed, spark=None) -> Column:
    """Large-enum membership via a broadcast hash set (SURVEY 2(a).2).

    For enums too large for an `isin` literal list (e.g. a 1M-entry
    allowlist), the scalable plan is a broadcast LEFT SEMI join; as a
    Column predicate composable into the fused pass we broadcast the set
    into a literal map-side array only up to a bound, else callers should
    use `semi_join_filter`."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin(list(allowed))


def semi_join_filter(df, col: str, allowed_df, allowed_col: str,
                     broadcast_allowed: bool = True):
    """df rows whose `col` IS in the allowed set — broadcast left-semi
    join (the enum-as-table regime for web-scale allowlists)."""
    keys = allowed_df.select(F.col(allowed_col).alias("__allowed")).dropDuplicates(["__allowed"])
    if broadcast_allowed:
        keys = F.broadcast(keys)
    return df.join(keys, df[col] == keys["__allowed"], "left_semi")


def compile_plan(
    schema: dict,
    table_schema: T.StructType,
    registry: SchemaRegistry | None = None,
    variant_unroll_depth: int = 3,
) -> CompiledPlan:
    """Compile a root object schema against a typed table's StructType.

    Each top-level property maps to a column. Native-expressible
    subschemas become Column checks; the rest (nested objects, $refs,
    combinators) become Arrow batch validators over that column
    (JSON-string payload).
    """
    registry, root_uri = parse_schema(schema, registry)
    if schema.get("type") not in (None, "object"):
        raise ValueError("table-level compile expects a root object schema")

    plan = CompiledPlan(root_uri=root_uri)
    fields = {f.name: f.dataType for f in table_schema.fields}
    required = set(schema.get("required", []))
    props: dict[str, Any] = schema.get("properties", {}) or {}
    base_spath = f"{root_uri}#/properties"

    for name in sorted(required - set(props)):
        props = {**props, name: {}}

    for name, sub in props.items():
        spath = f"{base_spath}/{name}"
        if name not in fields:
            if name in required:
                # column missing entirely: constant violation
                plan.checks.append(
                    ColumnCheck("required", f"$.{name}", f"{spath}/required",
                                F.lit(False), F.lit("<missing column>"), name)
                )
            continue
        dt = fields[name]
        plan.columns_needed.add(name)
        resolved = sub
        if isinstance(sub, dict) and "$ref" in sub:
            resolved_node, _, canon = registry.resolve(sub["$ref"], root_uri)
            if _is_native_expressible(resolved_node):
                resolved, spath = resolved_node, canon.replace("#", "#", 1)
        # typed nested objects: recurse natively into struct fields / map keys
        if isinstance(dt, T.StructType) and isinstance(resolved, dict) and (
            "properties" in resolved or "required" in resolved
            or "maxProperties" in resolved or "minProperties" in resolved
        ) and "$ref" not in resolved:
            plan.columns_needed.add(name)
            if name in required:
                plan.checks.append(ColumnCheck(
                    "required", f"$.{name}", f"{spath}/required",
                    F.col(name).isNotNull(), F.lit("<absent>"), name))
            plan.checks.extend(
                _compile_struct_checks(name, F.col(name), resolved, dt, spath, f"$.{name}")
            )
            continue
        if isinstance(dt, T.MapType) and isinstance(resolved, dict) and "$ref" not in resolved:
            plan.columns_needed.add(name)
            if name in required:
                plan.checks.append(ColumnCheck(
                    "required", f"$.{name}", f"{spath}/required",
                    F.col(name).isNotNull(), F.lit("<absent>"), name))
            plan.checks.extend(
                _compile_map_checks(name, F.col(name), resolved, dt, spath, f"$.{name}")
            )
            continue
        if isinstance(dt, T.StringType) and not _is_native_expressible(resolved):
            # dynamic JSON column. Fast path: bounded-unroll native Variant
            # compile (plans/variant_native.py) — zero Python for rows
            # within the unroll depth; only deeper rows (deep_guard) cross
            # the Arrow boundary. Fallback: full vectorized Arrow path
            # (cyclic $refs via compiled-closure recursion, deep equality,
            # ECMA regex, combinators).
            from themis_spark.plans.variant_native import try_compile_variant_native

            valias = f"__variant_{name}"
            vn = (
                try_compile_variant_native(
                    name, sub, registry, root_uri, variant_unroll_depth,
                    parsed=F.col(valias),
                )
                if variant_unroll_depth > 0
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
            if name in required:
                plan.checks.append(
                    ColumnCheck("required", f"$.{name}", f"{spath}/required",
                                F.col(name).isNotNull(), F.lit("<absent>"), name)
                )
            continue
        plan.checks.extend(
            _compile_scalar_checks(name, resolved if isinstance(resolved, dict) else {},
                                   dt, spath, name in required)
        )

    return plan

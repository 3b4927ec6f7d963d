"""Reference-parity facade: the entry points a playlyfe/themis user
calls, re-expressed over this engine.

The reference's public API (SURVEY.md §3.1, reconstructed — the
checkout is empty) is three calls::

    validator = Themis.validator(schema_or_array, options)
    report    = validator.validate(document, schema_id)   # {valid, errors}
    Themis.registerFormat(name, fn)

``validator()`` here mirrors that shape 1:1 for single documents
(driver-side, the compiled Python closure validator — same triples as
the distributed path, pinned by the differential tests) and adds the
table form ``validate_table`` that runs the SAME registered schemas as
a compiled Spark plan. ``register_format`` is re-exported from
pyvalidator (it feeds both paths).

Anonymous schemas get ids ``"0", "1", …`` exactly like the reference
(array index as string).
"""

from __future__ import annotations

from typing import Any

from themis_spark.plans.parser import SchemaRegistry
from themis_spark.plans.pyvalidator import (
    PyValidator,
    compile_python_validator,
    register_format,  # noqa: F401  (re-export: EP3 of the reference API)
)


class Validator:
    """Compiled multi-schema validator — the reference's EP2 object."""

    def __init__(self, by_id: dict[str, PyValidator], default_id: str,
                 schemas_by_id: dict[str, Any],
                 registry: SchemaRegistry | None = None):
        self._by_id = by_id
        self._default_id = default_id
        self._schemas_by_id = schemas_by_id
        # the shared multi-schema registry: validate_table must compile
        # against it or cross-schema $refs that the single-document path
        # resolves would fail on the table path
        self._registry = registry

    @property
    def schema_ids(self) -> list[str]:
        return list(self._by_id)

    def validate(self, document: Any, schema_id: str | None = None) -> dict:
        """One document → ``{"valid": bool, "errors": [...]}`` with the
        reference's per-error triple (keyword, instance path, schema
        path)."""
        pv = self._by_id[schema_id or self._default_id]
        errors = [
            {"keyword": v.keyword, "instance_path": v.instance_path,
             "schema_path": v.schema_path}
            for v in pv.validate(document)
        ]
        return {"valid": not errors, "errors": errors}

    def is_valid(self, document: Any, schema_id: str | None = None) -> bool:
        return self.validate(document, schema_id)["valid"]

    def validate_table(self, df, schema_id: str | None = None,
                       key_col: str = "url"):
        """The distributed form of ``validate``: compile the registered
        schema against ``df``'s Spark schema and return the violations
        DataFrame ``(key, keyword, instance_path, schema_path, detail)``
        — same triples, evaluated as native Column trees + Arrow batch
        validators in one fused pass (no per-row Python)."""
        from themis_spark.operators import validate as V
        from themis_spark.plans.compiler import compile_plan

        schema = self._schemas_by_id[schema_id or self._default_id]
        plan = compile_plan(schema, df.schema, registry=self._registry)
        ann = V.annotate(df, plan, keep=[key_col])
        return V.violations_df(ann, key_col=key_col, partition_col=None)

    def validate_table_dispatch(self, df, schema_id_col: str = "schema_id",
                                key_col: str = "url"):
        """Per-ROW schema dispatch at table scale — the reference's
        ``validate(doc, id)`` registry dispatch (SURVEY §2(a).28) lifted
        to DataFrames: each row is validated against the registered
        schema named by its ``schema_id_col`` value, one violations
        frame out (validate_table's columns + ``schema_id``).

        Rows whose id matches no registered schema emit the synthetic
        ``($dispatch, $, $)`` triple — the table analogue of the
        single-document path's KeyError (a lost row must surface as a
        violation, not vanish).

        Plan shape: one column-pruned branch per registered schema
        (``schema_id = <id>`` pushes down to the scan, so clustered /
        partitioned-by-producer tables prune row groups), unioned.
        Branch count = registered schemas (handfuls, not thousands);
        each branch is the same fused native pass validate_table runs.

        A registered schema that does NOT compile against this frame's
        Spark schema (it constrains columns the frame lacks outright)
        must not fail the whole call when its rows may not even exist:
        that branch degrades to a synthetic ``($schema, $, $)`` triple
        on the rows that DO carry its id — schema/frame mismatch
        surfaces per-row, like ``$dispatch`` does for unknown ids.
        """
        from pyspark.sql import functions as F

        from themis_spark.operators import validate as V
        from themis_spark.plans.compiler import compile_plan

        ids = list(self._schemas_by_id)
        parts = []
        for sid in ids:
            sub = df.where(F.col(schema_id_col) == sid)
            try:
                plan = compile_plan(self._schemas_by_id[sid], df.schema,
                                    registry=self._registry)
            except Exception as exc:  # schema/frame shape mismatch
                parts.append(sub.select(
                    F.col(key_col).alias("url"),
                    F.lit("0").alias("partition_id"),
                    F.lit("r0").alias("run_id"),
                    F.lit("$schema").alias("keyword"),
                    F.lit("$").alias("instance_path"),
                    F.lit("$").alias("schema_path"),
                    F.lit(f"schema does not compile against frame: "
                          f"{exc}"[:512]).alias("detail"),
                    F.lit(sid).alias("schema_id"),
                ))
                continue
            ann = V.annotate(sub, plan, keep=[key_col])
            parts.append(
                V.violations_df(ann, key_col=key_col, partition_col=None)
                .withColumn("schema_id", F.lit(sid)))
        unknown = (
            df.where(F.col(schema_id_col).isNull()
                     | ~F.col(schema_id_col).isin(ids))
            .select(
                F.col(key_col).alias("url"),
                F.lit("0").alias("partition_id"),
                F.lit("r0").alias("run_id"),
                F.lit("$dispatch").alias("keyword"),
                F.lit("$").alias("instance_path"),
                F.lit("$").alias("schema_path"),
                F.concat(
                    F.lit("unknown schema id: "),
                    F.coalesce(F.col(schema_id_col).cast("string"),
                               F.lit("null"))).alias("detail"),
                F.col(schema_id_col).cast("string").alias("schema_id"),
            ))
        out = unknown  # parts can be empty (no registered schemas)
        for p in parts:
            out = out.unionByName(p)
        return out

    def repair_table(self, df, schema_id: str | None = None,
                     clamp: bool = False):
        """The fix-up counterpart of ``validate_table`` from the SAME
        registered schema: try_cast coercion, default fill, optional
        bound clamping (operators/repair.py) — returns the repaired
        projection; pair with ``repair_report`` for the audit counts."""
        from themis_spark.operators.repair import repair_table

        schema = self._schemas_by_id[schema_id or self._default_id]
        return repair_table(df, schema, clamp=clamp)

    def repair_report(self, df, schema_id: str | None = None,
                      clamp: bool = False):
        from themis_spark.operators.repair import repair_report

        schema = self._schemas_by_id[schema_id or self._default_id]
        return repair_report(df, schema, clamp=clamp)


def validator(schema_or_list: Any, formats: dict | None = None,
              validate_formats: bool = True) -> Validator:
    """Reference EP1: compile one schema or a list of cross-referencing
    schemas. List entries may carry draft-4 ``id``s (used for $ref
    resolution and as their schema_id); anonymous entries get their
    array index as id, like the reference."""
    from themis_spark.plans.parser import parse_schema

    schemas = schema_or_list if isinstance(schema_or_list, list) else [schema_or_list]
    if not schemas:
        raise ValueError("validator() requires at least one schema")
    registry = SchemaRegistry()
    # two phases, like the reference's normalize-then-codegen: register
    # EVERY schema first so a $ref from schema 0 to schema 1's uri
    # resolves regardless of array order, then compile each
    uris: list[tuple[str, Any, str]] = []
    for i, schema in enumerate(schemas):
        _, root_uri = parse_schema(schema, registry)
        sid = (schema.get("id") if isinstance(schema, dict) else None) or str(i)
        uris.append((sid, schema, root_uri))
    by_id: dict[str, PyValidator] = {}
    schemas_by_id: dict[str, Any] = {}
    for sid, schema, root_uri in uris:
        by_id[sid] = compile_python_validator(
            schema, registry=registry, formats=formats,
            validate_formats=validate_formats, base_uri=root_uri)
        schemas_by_id[sid] = schema
    default_id = uris[0][0]
    return Validator(by_id, default_id, schemas_by_id, registry=registry)


def validator_from_table(
    df,
    col: str,
    schema_id: str = "inferred",
    bounds: bool = False,
    enum_max: int = 0,
    required_min_frac: float = 1.0,
    formats: dict | None = None,
) -> Validator:
    """The inference-closed loop the reference never had: derive a draft-4
    schema FROM a healthy corpus (plans/infer.py — two native aggregation
    passes) and return a compiled :class:`Validator` for it, ready to
    validate single documents or future crawls via ``validate_table``.

    The inferred schema is round-trip-safe (it accepts every row it was
    derived from), so violations on a LATER run indicate drift — new
    keys missing, type changes, out-of-band values — which makes this
    the schema-level complement of the histogram drift checks in
    operators/stats.py.
    """
    from themis_spark.plans.infer import infer_draft4_schema

    schema = infer_draft4_schema(
        df, col, schema_id=schema_id, required_min_frac=required_min_frac,
        bounds=bounds, enum_max=enum_max)
    return validator(schema, formats=formats)

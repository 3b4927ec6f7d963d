"""Vectorized Arrow/pandas batch validators — the engine's "A" path.

Everything native Columns can't express (cyclic $refs, deep JSON equality,
ECMA-regex-only patterns, unknown-shape objects) runs here: a compiled
Python closure validator (plans/pyvalidator.py — the analogue of the
reference's generated JS functions in playlyfe/themis src/themis.js)
applied over Arrow record batches via ``pandas_udf``. Data crosses the
JVM↔Python boundary once per batch, never per row (BASELINE.json
input_hint: vectorized pandas/Arrow UDFs, no per-row Python UDFs).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql.functions import pandas_udf

from themis_spark.plans.compiler import VIOLATION_ARRAY_TYPE
from themis_spark.plans.pyvalidator import PyValidator


def violations_pandas_udf(validator: PyValidator, instance_prefix: str = "$"):
    """Build an Arrow-batched UDF: JSON-string column → array<violation>.

    The validator closure tree is compiled ONCE on the driver and
    cloudpickled to executors; regexes inside it are pre-compiled
    (reference parity: Themis precompiles RegExp objects at codegen time).
    """
    validate = validator.validate

    def _batch(series: pd.Series) -> pd.Series:
        out = []
        for raw in series:
            if raw is None:
                out.append([])  # absent — presence is `required`'s job
                continue
            try:
                doc = json.loads(raw) if isinstance(raw, str) else raw
            except (ValueError, TypeError):
                out.append([("type", instance_prefix, f"{validator.root_uri}#", "<malformed json>")])
                continue
            out.append(
                [
                    (v.keyword, v.instance_path, v.schema_path, None)
                    for v in validate(doc, instance_prefix)
                ]
            )
        return pd.Series(out)

    return pandas_udf(_batch, VIOLATION_ARRAY_TYPE)


def verdict_pandas_udf(validator: PyValidator):
    """JSON-string column → boolean validity (conformance-suite harness)."""
    validate = validator.validate

    def _batch(series: pd.Series) -> pd.Series:
        vals = []
        for raw in series:
            try:
                doc = json.loads(raw) if isinstance(raw, str) else raw
            except (ValueError, TypeError):
                vals.append(False)
                continue
            vals.append(not validate(doc))
        return pd.Series(vals)

    return pandas_udf(_batch, "boolean")

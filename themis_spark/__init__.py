"""themis_spark — a from-scratch PySpark-native schema + constraint
validation engine with the capabilities of playlyfe/themis (a JSON Schema
draft-4 validator), rebuilt Spark-first for web-scale tables.

Layout
------
plans/      schema parsing, $ref resolution, compilation to (a) native
            Spark Column expression trees and (b) vectorized Arrow/pandas
            batch validators (the two execution regimes from SURVEY.md §2a).
operators/  table-level dataflow operators: the fused validate+stats pass,
            cross-row uniqueness, referential integrity, distribution drift,
            dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
            embedding-cosine), similarity search, text analysis, multimodal
            plumbing (SURVEY.md §2b + training-data ops).
functions/  shared column-level helpers: portable hashing, shingling,
            format predicates.
sources/    table IO abstraction (partitioned Parquet now, Iceberg-shaped
            API) + the deterministic synthetic pages-table generator.
streaming/  Structured Streaming wrapper (foreachBatch validation).
runner.py   checkpointed, resumable end-to-end validation runs.
pipeline.py the documented curation composition (curate()).
"""

from themis_spark.api import Validator, validator, validator_from_table
from themis_spark.plans.parser import SchemaRegistry, parse_schema
from themis_spark.plans.pyvalidator import compile_python_validator, register_format
from themis_spark.plans.compiler import (
    CompiledPlan,
    UnsupportedSchemaError,
    compile_plan,
)
from themis_spark.plans.infer import infer_draft4_schema, json_path_profile
from themis_spark.pipeline import CurationConfig, curate
from themis_spark.sources.tableio import open_table

__version__ = "0.2.0"

__all__ = [
    "Validator",
    "validator",
    "validator_from_table",
    "SchemaRegistry",
    "parse_schema",
    "compile_python_validator",
    "register_format",
    "compile_plan",
    "CompiledPlan",
    "UnsupportedSchemaError",
    "infer_draft4_schema",
    "json_path_profile",
    "open_table",
    "curate",
    "CurationConfig",
]

"""Shared column-level helper functions (all native pyspark.sql.functions
compositions — JVM-side, whole-stage-codegen friendly)."""

"""Standalone oracle harness: replicates the driver's correctness gate —
runs every __spark_entry__.queries() entry on Spark AND its oracle_sql()
on DuckDB over the same parquet, compares row count, sorted-column
schema, and an order-insensitive value hash.

Usage: python tests/oracle_check.py [sf_dir] [only_query_name]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    payload = df.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.md5(payload).hexdigest()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else None

    from themis_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name != only:
            continue
        try:
            spark_pdf = fn(spark, sf).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"✗ {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"· {name}: rows-only ({len(spark_pdf)} rows)")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"✗ {name}: duckdb error {str(e)[:200]}")
            continue
        a, b = normalize(spark_pdf), normalize(duck_pdf)
        if len(a) != len(b):
            failures.append((name, f"rowcount {len(a)} vs {len(b)}"))
            print(f"✗ {name}: rowcount {len(a)} vs {len(b)}")
            continue
        if list(a.columns) != list(b.columns):
            failures.append((name, f"schema {list(a.columns)} vs {list(b.columns)}"))
            print(f"✗ {name}: schema {list(a.columns)} vs {list(b.columns)}")
            continue
        ha, hb = value_hash(a), value_hash(b)
        if ha != hb:
            diff = (a != b)
            bad_cols = [c for c in a.columns if diff[c].any()]
            idx = diff.any(axis=1)
            sample = pd.concat([a[idx].head(3).add_suffix("_spark"),
                                b[idx].head(3).add_suffix("_duck")], axis=1)
            failures.append((name, f"value hash mismatch in {bad_cols}"))
            print(f"✗ {name}: value mismatch in {bad_cols}\n{sample}")
        else:
            print(f"✓ {name}: {len(a)} rows match")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} OK")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

"""Data-layout operators (operators/layout.py): z-value correctness
against an independent Python bit-interleave, the locality property the
curve exists for, write-plan shape, and compaction-group invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import themis_spark.operators.layout as L

BITS = 4
B = 1 << BITS


@pytest.fixture(scope="module")
def grid(spark):
    # full B×B grid of already-normalized coordinates: min/max
    # normalization at bits=4 is then the identity, so zval must equal
    # the textbook Morton interleave exactly
    rows = [(y * B + x, x, y) for y in range(B) for x in range(B)]
    return spark.createDataFrame(rows, "id long, x long, y long")


def _morton(x: int, y: int) -> int:
    z = 0
    for b in range(BITS):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zval_matches_python_morton(spark, grid):
    out = {r["id"]: r["zval"]
           for r in L.zorder_frame(grid, ["x", "y"], bits=BITS,
                                   n_buckets=4).collect()}
    for y in range(B):
        for x in range(B):
            assert out[y * B + x] == _morton(x, y), (x, y)


def test_zorder_buckets_are_quadrants(spark, grid):
    # 4 buckets over a 2-D grid = the 4 quadrants: every bucket's
    # bounding box must span exactly half of each axis — the zone-map
    # narrowness a sort by (x, y) cannot give for y
    stats = L.zorder_bucket_stats(grid, ["x", "y"], bits=BITS,
                                  n_buckets=4).collect()
    assert len(stats) == 4
    for r in stats:
        assert r["n_rows"] == B * B // 4
        assert r["max_x"] - r["min_x"] == B // 2 - 1
        assert r["max_y"] - r["min_y"] == B // 2 - 1


def test_cluster_plan_is_range_partition_plus_sort(spark, grid):
    plan = L.cluster_by_zorder(grid, ["x", "y"], bits=BITS, n_files=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan, plan
    assert "Sort [zval" in plan, plan


def test_normalization_is_monotone_and_bounded(spark):
    rows = [(i, v) for i, v in enumerate([-50, -3, 0, 7, 999, 1000])]
    df = spark.createDataFrame(rows, "id long, v long")
    out = [r["zval"] for r in L.zorder_frame(df, ["v"], bits=8, n_buckets=4)
           .orderBy("id").collect()]
    assert out == sorted(out)
    assert out[0] == 0 and out[-1] < 256


def test_compaction_groups_are_contiguous_and_sized(spark):
    rows = [(f"f{i:03d}", (i * 37) % 90 + 10) for i in range(50)]
    df = spark.createDataFrame(rows, "path string, n_bytes long")
    out = L.compaction_plan(df, target_bytes=200).orderBy("path").collect()
    # groups are contiguous runs in path order
    seen = [r["compact_group"] for r in out]
    assert seen == sorted(seen)
    # fixed-window rule: everything after a group's FIRST file fits in
    # the window (a group exceeds target only by its straddling head)
    by_group: dict[int, list] = {}
    for r in out:
        by_group.setdefault(r["compact_group"], []).append(r)
    for g, files in by_group.items():
        assert sum(f["n_bytes"] for f in files) == files[0]["group_bytes"]
        assert sum(f["n_bytes"] for f in files[1:]) < 200
    # an oversized file always crosses a boundary away from its
    # predecessor's group
    big = spark.createDataFrame(
        [("a", 50), ("b", 1000), ("c", 60)], "path string, n_bytes long")
    got = {r["path"]: r["compact_group"]
           for r in L.compaction_plan(big, target_bytes=200).collect()}
    assert got["a"] != got["b"]


def test_compaction_leading_zero_byte_files_group_zero(spark):
    # review finding (r5): a LEADING zero-byte file has cumsum = 0 and
    # the raw rule gave floor(-1/target) = -1 — must clamp into group 0
    df = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 50), ("d", 300)],
        "path string, n_bytes long")
    got = {r["path"]: r["compact_group"]
           for r in L.compaction_plan(df, target_bytes=200).collect()}
    assert got["a"] == 0 and got["b"] == 0 and got["c"] == 0
    assert min(got.values()) >= 0


def test_normalized_span_guard_raises_on_wide_domain(spark):
    # review finding (r5): hash-valued key domains exceed the
    # 2^(53-bits) exact-division bound — must raise at runtime, not
    # silently emit wrong z-values (span 2^40+1 > 2^37 for bits=16;
    # full-long spans additionally trip ANSI subtraction overflow)
    df = spark.createDataFrame(
        [(0, 0), (1, 1 << 40)], "id long, v long")
    with pytest.raises(Exception, match="key span exceeds"):
        L.zorder_frame(df, ["v"], bits=16, n_buckets=4).collect()
    # an in-bound span still works and stays exact
    ok = spark.createDataFrame([(0, 5), (1, 1 << 30)], "id long, v long")
    vals = [r["zval"] for r in
            L.zorder_frame(ok, ["v"], bits=16, n_buckets=4)
            .orderBy("id").collect()]
    assert vals[0] == 0 and 0 < vals[1] < (1 << 16)


def test_zbucket_overflow_config_raises(spark):
    # review finding: 2 cols x 31 bits passes the zval guard but
    # zval * n_buckets wraps a signed long -- must refuse at plan build
    df = spark.createDataFrame([(0, 1, 2)], "id long, x long, y long")
    with pytest.raises(ValueError, match="overflows"):
        L.zorder_frame(df, ["x", "y"], bits=31, n_buckets=64)
    # a representable config still works
    assert L.zorder_frame(df, ["x", "y"], bits=8, n_buckets=64) is not None

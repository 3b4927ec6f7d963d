"""Scaling-gap attribution probe (BASELINE.md protocol, round 2).

Question: when the full engine run misses the 0.8 N→4N efficiency
criterion on this single-host sandbox, is the limiter the ENGINE
(serial fraction, shuffle growth, driver bottleneck — fixable) or the
HOST (one shared DRAM bus behind all executor JVMs — not present on a
real cluster, where every executor node brings its own memory system)?

Three experiments, every one on the same input at both cluster sizes
(local-cluster[1,4,3072] vs local-cluster[4,4,3072] = the criterion
pair):

1. ``host`` — Spark-free multiprocessing ceilings: a pure-arithmetic
   strong-scaling probe and a pure-memory-stream probe at 4 vs 16
   worker processes. These bound what ANY workload can measure here.
2. ``sweep`` — the same fused-pass scan at three arithmetic
   intensities (CPU work per scanned byte):
     i0: bare column scan (sum of lengths — minimal CPU, max traffic)
     i1: the real fused validate+stats kernel
     i2: the kernel plus 4 extra regex checks over ``text`` (same
         traffic, ~2× CPU)
   If efficiency RISES monotonically with intensity toward the host's
   pure-CPU ceiling, the gap is bandwidth, not architecture: more CPU
   per byte hides the shared-DRAM stall, which is exactly what a real
   cluster's per-node memory would do.
3. The per-stage wall breakdown already reported by ``bench.py
   --scaling`` (stage_secs) locates WHICH stages pay the gap.

Usage: python BENCH/attribution.py [host|sweep|all]  (default all)
Writes one JSON line per experiment to stdout; human summary to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LO = os.environ.get("ATTR_LO", "local-cluster[1,4,3072]")
HI = os.environ.get("ATTR_HI", "local-cluster[4,4,3072]")
ROWS = int(os.environ.get("ATTR_ROWS", "8000000"))
FACTOR = 4.0


# ---------------------------------------------------------------- host
def _cpu_task(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i % 7
    return s


def _mem_task(reps: int) -> float:
    import numpy as np

    a = np.random.rand(32_000_000)  # 256 MB stream
    for _ in range(reps):
        a = a * 1.000001
    return float(a[0])


def host_ceilings() -> dict:
    """Strong-scaling efficiency of the two pure regimes at the same
    4 → 16 process counts the criterion pair uses."""
    import multiprocessing as mp

    def run(kind: str, workers: int, units: int) -> float:
        per = units // workers
        with mp.Pool(workers) as p:
            t0 = time.time()
            if kind == "cpu":
                p.map(_cpu_task, [per * 1_000_000] * workers)
            else:
                p.map(_mem_task, [per] * workers)
            return time.time() - t0

    def med(vals: list) -> float:
        return sorted(vals)[len(vals) // 2]

    out = {}
    # work sized so even the 16-worker config runs >5 s (pool startup
    # and scheduler jitter otherwise dominate); medians of 3,
    # configurations interleaved like the main bench
    for kind, units in (("cpu", 640), ("mem", 96)):
        t4s, t16s = [], []
        for _ in range(3):
            t4s.append(run(kind, 4, units))
            t16s.append(run(kind, 16, units))
        t4, t16 = med(t4s), med(t16s)
        out[kind] = {
            "t_4workers": round(t4, 2),
            "t_16workers": round(t16, 2),
            "runs_4": [round(t, 1) for t in t4s],
            "runs_16": [round(t, 1) for t in t16s],
            "efficiency": round(t4 / (FACTOR * t16), 3),
        }
    return out


# --------------------------------------------------------------- sweep
def _sweep_one(master: str) -> dict:
    """Three intensities on one cluster size; fresh JVM per call.
    Reports best-of-2 steady passes per intensity (warm pass first)."""
    from pyspark.sql import functions as F

    from bench import ensure_pages, PAGES_DIR as _  # noqa: F401
    from themis_spark.operators import validate as V
    from themis_spark.operators.stats import column_stats
    from themis_spark.plans.compiler import compile_plan
    from themis_spark.session import get_spark
    from themis_spark.sources.pages import PAGES_SCHEMA_JSON
    from themis_spark.sources.tableio import ParquetTable

    pages_dir = os.path.join(REPO, ".bench_data", f"pages_{ROWS}")
    spark = get_spark(app_name=f"attr-{master}", master=master)
    try:
        ensure_pages(spark, ROWS, pages_dir)
        df = ParquetTable(spark, f"{pages_dir}/pages", "part_id").read()

        heavy = json.loads(json.dumps(PAGES_SCHEMA_JSON))
        heavy["properties"]["text"] = {
            "type": "string",
            "allOf": [
                {"pattern": "[A-Za-z]{4,} [A-Za-z]{4,} [A-Za-z]{4,}"},
                {"pattern": "([.!?] +[A-Z])|^[A-Z]"},
                {"pattern": "(http|www|href)|^[^<>]*$"},
                {"pattern": "([0-9]{4})|([a-z]+ [a-z]+ [a-z]+ [a-z]+)"},
            ],
        }

        plans = {
            "i1_kernel": compile_plan(PAGES_SCHEMA_JSON, df.schema),
            "i2_heavy": compile_plan(heavy, df.schema),
        }

        def run_intensity(name: str):
            if name == "i0_scan":
                return lambda: df.select(
                    F.sum(F.length("text")), F.sum(F.length("url"))
                ).collect()
            if name == "i3_constraints":
                # the engine's constraints stage in isolation (round-4:
                # stage efficiencies 0.742/0.672 straddle the bare-scan
                # ceiling 0.734 — this probe pins each stage against it)
                from themis_spark.operators import constraints as C

                def go_c():
                    C.duplicate_keys_hashed(df, "url").count()
                return go_c
            if name == "i4_stats":
                def go_s():
                    column_stats(df, ["url", "text", "lang", "warc_ts"],
                                 "part_id", [], "a").collect()
                return go_s
            plan = plans[name]
            ann = V.annotate(df, plan, keep=["url", "part_id"],
                             defer_residual=True)
            res = V.residual_violations_df(df, plan, "url", "part_id", "a")

            def go():
                ann.select(F.sum("n_violations")).collect()
                if res is not None:
                    res.count()
                column_stats(df, ["url", "text", "lang", "warc_ts"],
                             "part_id", [], "a").collect()

            return go

        out = {}
        for name in ("i0_scan", "i1_kernel", "i2_heavy",
                     "i3_constraints", "i4_stats"):
            fn = run_intensity(name)
            fn()  # warm: JIT/codegen/python daemons outside the window
            times = []
            for _ in range(2):
                t0 = time.time()
                fn()
                times.append(time.time() - t0)
            out[name] = round(min(times), 2)
        return out
    finally:
        spark.stop()


def sweep() -> dict:
    """Both cluster sizes in subprocesses (fresh JVMs, like bench.py)."""
    results = {}
    for master in (LO, HI):
        p = subprocess.run(
            [sys.executable, __file__, "--sweep-one", master],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("SWEEP_ONE:")]
        if not line:
            raise RuntimeError(f"sweep failed at {master}: "
                               f"{p.stdout[-800:]} {p.stderr[-800:]}")
        results[master] = json.loads(line[0][len("SWEEP_ONE:"):])
    effs = {
        k: round(results[LO][k] / (FACTOR * results[HI][k]), 3)
        for k in results[LO]
    }
    return {"rows": ROWS, "lo": results[LO], "hi": results[HI],
            "efficiency": effs}


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--sweep-one":
        print("SWEEP_ONE:" + json.dumps(_sweep_one(sys.argv[2])))
        return
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    report = {}
    if which in ("host", "all"):
        report["host_ceilings"] = host_ceilings()
        print("host ceilings:", report["host_ceilings"], file=sys.stderr)
    if which in ("sweep", "all"):
        report["intensity_sweep"] = sweep()
        print("intensity sweep:", report["intensity_sweep"], file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

"""Interleaved A/B: round-2 code vs current code, same harness.

Round-3 verdict headline question: the driver measured the engine pass
at 290k docs/s on r2 code and 183k on r3 code (same harness, comparable
host phases) — estimator artifact, host drift, or a real code
regression? This script answers it the way the scaling campaigns do:
both code versions run `bench.py --engine-json` in fresh subprocesses,
INTERLEAVED (r2, r4, r2, r4, ...) so host drift spreads across both,
with BENCH_PASSES=6 and the SAME estimator applied to both sides'
recorded pass lists (ramp-trimmed median — r2's own bench reported
last-of-ramp, so its docs_per_sec field is recomputed, not trusted).

Usage:
    git worktree add /tmp/r2tree <r2-commit>
    python BENCH/ab_r2_vs_r4.py /tmp/r2tree [repeats]

Writes one JSON line to stdout; human summary to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MASTER = os.environ.get("AB_MASTER", "local-cluster[8,4,3072]")
ROWS = os.environ.get("AB_ROWS", "4000000")


def trimmed_median(passes: list[float], tol: float = 0.10) -> float:
    """The round-4 estimator, applied identically to both sides: find
    the first converged consecutive pair (within tol); else drop the
    initial monotone ramp; median of what remains."""
    plateau_at = None
    for i in range(1, len(passes)):
        if abs(passes[i] - passes[i - 1]) <= tol * max(passes[i], passes[i - 1]):
            plateau_at = i - 1
            break
    if plateau_at is not None:
        stable = passes[plateau_at:]
    else:
        j = 0
        while j + 1 < len(passes) and passes[j + 1] > passes[j] * (1 + tol):
            j += 1
        stable = passes[j:]
    s = sorted(stable)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def engine_run(tree: str) -> dict:
    p = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py"),
         "--engine-json", "--master", MASTER],
        capture_output=True, text=True, cwd=tree,
        env={**os.environ, "BENCH_PAGES_ROWS": ROWS, "BENCH_PASSES": "6",
             "BENCH_MAX_PASSES": "6"},
    )
    line = [l for l in p.stdout.splitlines() if l.startswith("ENGINE_JSON:")]
    if not line:
        raise RuntimeError(f"engine run failed in {tree}: "
                           f"{p.stdout[-800:]} {p.stderr[-800:]}")
    return json.loads(line[0][len("ENGINE_JSON:"):])


def main() -> None:
    r2tree = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sides = {"r2": r2tree, "r4": REPO}
    meds: dict[str, list[float]] = {"r2": [], "r4": []}
    raw: dict[str, list[list[float]]] = {"r2": [], "r4": []}
    for i in range(repeats):
        for name in ("r2", "r4"):
            data = engine_run(sides[name])
            passes = data.get("passes") or [data["docs_per_sec"]]
            med = trimmed_median([float(x) for x in passes])
            meds[name].append(round(med, 1))
            raw[name].append(passes)
            print(f"rep {i+1} {name}: passes={passes} -> {med:.0f} docs/s",
                  file=sys.stderr)
    pair_ratios = [a / b for a, b in zip(meds["r4"], meds["r2"])]
    pair_ratios.sort()
    n = len(pair_ratios)
    med_ratio = (pair_ratios[n // 2] if n % 2
                 else (pair_ratios[n // 2 - 1] + pair_ratios[n // 2]) / 2)
    out = {"master": MASTER, "rows": int(ROWS), "repeats": repeats,
           "r2_medians": meds["r2"], "r4_medians": meds["r4"],
           "r2_passes": raw["r2"], "r4_passes": raw["r4"],
           "r4_over_r2_paired_median": round(med_ratio, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

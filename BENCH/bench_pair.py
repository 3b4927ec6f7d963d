"""Bench-pair consistency check (round-3 VERDICT item 6 close-out).

Compares two consecutive full bench runs entry by entry and reports the
max per-query ratio; the acceptance bar from the verdict is "two
consecutive full bench runs agree within 1.5x on every entry". Writes
BENCH/bench_pair_r04.json with the per-query ratios, flagged outliers,
and both engine-pass summaries.

Usage: python BENCH/bench_pair.py run1.json run2.json out.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    run1, run2, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    a = json.load(open(run1))
    b = json.load(open(run2))
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    ratios = {}
    for k in common:
        lo, hi = sorted([qa[k], qb[k]])
        ratios[k] = round(hi / max(lo, 1e-9), 3)
    flagged = {k: {"run1_sec": qa[k], "run2_sec": qb[k], "ratio": r}
               for k, r in ratios.items() if r > 1.5}
    summary = {
        "n_queries": len(common),
        "max_ratio": max(ratios.values()),
        "median_ratio": sorted(ratios.values())[len(ratios) // 2],
        "n_over_1_5": len(flagged),
        "flagged": flagged,
        "ratios": ratios,
        "engine": {
            "run1": {k: a.get(k) for k in
                     ("docs_per_sec", "engine_passes", "plateaued",
                      "host_probe_mops")},
            "run2": {k: b.get(k) for k in
                     ("docs_per_sec", "engine_passes", "plateaued",
                      "host_probe_mops")},
        },
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("n_queries", "max_ratio", "median_ratio",
                       "n_over_1_5")}))
    print("flagged:", list(flagged))


if __name__ == "__main__":
    main()

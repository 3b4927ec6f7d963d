"""Bench-pair consistency check (round-3 VERDICT item 6 close-out,
hardened per round-4 VERDICT items 1-2).

Compares two consecutive full bench runs entry by entry and reports the
max per-query ratio; the acceptance bar from the verdict is "two
consecutive full bench runs agree within 1.5x on every entry".

The engine-pass bookkeeping is MECHANICAL (round-4 verdict item 1: the
``plateaued`` flag and the prose disagreed about what the word meant):
each run's flag is recomputed here from its recorded pass history with
bench.plateau_info — the ONE unit-tested convergence rule — and the
headline run is chosen by a fixed rule, with the rationale emitted into
the artifact:

* exactly one run plateaued -> that run;
* both or neither -> the run with the LOWER recomputed median (the
  conservative choice — never best-of).

Writes the out JSON with per-query ratios, flagged outliers, both
engine-pass summaries, and the chosen-run record.

Usage: python BENCH/bench_pair.py run1.json run2.json out.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import plateau_info  # noqa: E402


def choose_run(passes1: list[float], passes2: list[float],
               tol: float = 0.10) -> dict:
    """The mechanical chosen-run rule (unit-tested). Returns the full
    record: per-run plateau recomputation + choice + rationale."""
    i1, i2 = plateau_info(passes1, tol), plateau_info(passes2, tol)
    if i1["plateaued"] != i2["plateaued"]:
        chosen = 1 if i1["plateaued"] else 2
        rationale = (f"run {chosen} is the only one whose pass history "
                     "converged (two consecutive passes within "
                     f"{tol:.0%}); the other run's flag is recomputed "
                     "false by the same rule")
    else:
        both = "both runs" if i1["plateaued"] else "neither run"
        chosen = 1 if i1["median"] <= i2["median"] else 2
        rationale = (f"{both} plateaued under the {tol:.0%} rule; the "
                     f"LOWER recomputed median (run {chosen}) is the "
                     "headline — conservative, never best-of")
    return {
        "run1": {"passes": passes1, "plateaued": i1["plateaued"],
                 "plateau_at": i1["plateau_at"], "median": i1["median"]},
        "run2": {"passes": passes2, "plateaued": i2["plateaued"],
                 "plateau_at": i2["plateau_at"], "median": i2["median"]},
        "chosen_run": chosen,
        "headline_docs_per_sec": (i1 if chosen == 1 else i2)["median"],
        "rationale": rationale,
        "rule": ("plateaued = some consecutive pass pair within tol; "
                 "stable window = from that pair on; value = its median"),
        "tol": tol,
    }


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
        "batch_k": {"run1": a.get("query_batch_k"),
                    "run2": b.get("query_batch_k"),
                    "min_entry_sec": a.get("min_entry_sec")},
        "engine": {
            "run1": {k: a.get(k) for k in
                     ("docs_per_sec", "engine_passes", "plateaued",
                      "host_probe_mops")},
            "run2": {k: b.get(k) for k in
                     ("docs_per_sec", "engine_passes", "plateaued",
                      "host_probe_mops")},
            "chosen": choose_run(a.get("engine_passes") or [],
                                 b.get("engine_passes") or []),
        },
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("n_queries", "max_ratio", "median_ratio",
                       "n_over_1_5")}))
    print("flagged:", list(flagged))
    print("chosen run:", summary["engine"]["chosen"]["chosen_run"],
          "—", summary["engine"]["chosen"]["rationale"])


if __name__ == "__main__":
    main()

"""The scaling-evidence record is append-only and pooled honestly.

bench.py --scaling appends each campaign to BENCH/scaling_campaigns.jsonl
and regenerates BENCH/BASELINE.md from the FULL history: the criterion
headline is the median over every paired repeat of every campaign, so a
re-run under a degraded host phase can neither replace a better
measurement nor be hidden by one. Pure-Python tests (no Spark).
"""

from __future__ import annotations

import json
import os

import pytest

import bench


def _campaign(pairs, lo=50_000.0, hi=170_000.0, ts=1_787_000_000.0, **extra):
    return {
        "master_lo": "local-cluster[1,4,3072]",
        "master_hi": "local-cluster[4,4,3072]",
        "cores_lo": 4, "cores_hi": 16, "rows": 16_000_000,
        "docs_per_sec_lo": lo, "docs_per_sec_hi": hi,
        "runs_lo": [lo] * len(pairs), "runs_hi": [hi] * len(pairs),
        "stage_secs_lo": {"validate_sink": 100.0},
        "stage_secs_hi": {"validate_sink": 30.0},
        "stage_efficiency": {"validate_sink": 0.833},
        "pair_efficiencies": list(pairs),
        "scaling_efficiency": sorted(pairs)[len(pairs) // 2],
        "scaling_efficiency_pooled": 0.8,
        "passed": True,
        "ts": ts,
        **extra,
    }


@pytest.fixture()
def campaigns_file(tmp_path, monkeypatch):
    path = tmp_path / "scaling_campaigns.jsonl"
    monkeypatch.setattr(bench, "_CAMPAIGNS_PATH", str(path))
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    return path


def test_append_and_load_roundtrip(campaigns_file):
    c1 = _campaign([0.9, 0.85])
    c2 = _campaign([0.5, 0.7], ts=1_787_100_000.0)
    bench._append_campaign(c1)
    bench._append_campaign(c2)
    loaded = bench._load_campaigns()
    assert [c["pair_efficiencies"] for c in loaded] == [[0.9, 0.85], [0.5, 0.7]]


def test_headline_pools_all_pairs_across_campaigns(campaigns_file, tmp_path):
    # campaign medians 0.88 (pass) and 0.55 (fail); pooled median over all
    # 6 pairs = (0.7+0.85)/2 = 0.775 -> FAIL: the good campaign cannot
    # hide the bad one
    bench._append_campaign(_campaign([0.88, 0.9, 0.85]))
    bench._append_campaign(_campaign([0.55, 0.4, 0.7], ts=1_787_100_000.0))
    bench._write_baseline_md(bench._load_campaigns())
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "median over ALL 6 paired repeats" in md
    assert "= 0.775" in md
    assert "**FAIL**" in md
    # both campaigns visible as table rows
    assert md.count("| 16,000,000 |") == 2


def test_headline_passes_when_pooled_median_clears(campaigns_file, tmp_path):
    bench._append_campaign(_campaign([0.9, 0.85, 0.87]))
    bench._append_campaign(_campaign([0.82, 0.3], ts=1_787_100_000.0))
    bench._write_baseline_md(bench._load_campaigns())
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    # all pairs sorted: 0.3 0.82 0.85 0.87 0.9 -> median 0.85
    assert "= 0.85" in md
    assert "**PASS**" in md


def test_latest_campaign_supplies_stage_detail(campaigns_file, tmp_path):
    bench._append_campaign(_campaign([0.9]))
    newer = _campaign([0.84], ts=1_787_100_000.0)
    newer["stage_secs_lo"] = {"validate_sink": 222.0}
    newer["stage_secs_hi"] = {"validate_sink": 66.0}
    newer["stage_efficiency"] = {"validate_sink": 0.841}
    bench._append_campaign(newer)
    bench._write_baseline_md(bench._load_campaigns())
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "222.0 s" in md and "66.0 s" in md


def test_host_cpu_probe_column_rendered(campaigns_file, tmp_path):
    bench._append_campaign(_campaign([0.9], host_cpu_probe_eff=0.87))
    bench._write_baseline_md(bench._load_campaigns())
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "| 0.87 |" in md


def test_plateau_rule_is_two_consecutive_within_tol():
    # round-4 verdict item 1: ONE tested convergence rule every
    # artifact derives from. Converged pair -> plateaued, stable window
    # from the first such pair onward, value = its median.
    i = bench.plateau_info([100, 200, 210, 190])
    assert i["plateaued"] and i["plateau_at"] == 1
    assert i["stable"] == [200, 210, 190] and i["median"] == 200
    # monotone ramp that never converges -> ramp dropped entirely
    i2 = bench.plateau_info([100, 150, 225, 340])
    assert not i2["plateaued"] and i2["stable"] == [340]
    # ramp then a divergent (non-monotone) tail -> median of the tail
    i3 = bench.plateau_info([100, 150, 120])
    assert not i3["plateaued"] and i3["stable"] == [150, 120]
    assert i3["median"] == 135
    # degenerate inputs
    assert bench.plateau_info([])["median"] is None
    assert bench.plateau_info([42.0])["stable"] == [42.0]
    # tol is relative to the LARGER of the pair
    assert bench.plateau_info([100, 110])["plateaued"]
    assert not bench.plateau_info([100, 112])["plateaued"]


def _bench_pair_mod():
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)),
                        "BENCH", "bench_pair.py")
    spec = importlib.util.spec_from_file_location("bench_pair", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_bench_pair_chosen_run_rule_is_mechanical():
    bp = _bench_pair_mod()
    # exactly one run plateaued -> that run, regardless of magnitude
    r = bp.choose_run([100, 300, 200], [100, 200, 205])
    assert r["chosen_run"] == 2 and r["run2"]["plateaued"]
    assert not r["run1"]["plateaued"]
    assert r["headline_docs_per_sec"] == 202.5
    assert "converged" in r["rationale"]
    # both plateaued -> the LOWER median (conservative, never best-of)
    r2 = bp.choose_run([200, 205], [300, 310])
    assert r2["chosen_run"] == 1 and r2["headline_docs_per_sec"] == 202.5
    # neither plateaued -> lower ramp-trimmed median
    # (run1 trims to [300] -> 300; run2 trims to [240] -> 240)
    r3 = bp.choose_run([100, 300], [100, 240])
    assert r3["chosen_run"] == 2


def test_bench_headline_keys_all_resolve():
    # a HEADLINE typo would crash the driver's bench run with a KeyError
    import bench
    import __spark_entry__ as entry

    qs = entry.queries()
    missing = [k for k in bench.HEADLINE if k not in qs]
    assert not missing, missing
    # and every query has an oracle (the driver's correctness gate)
    assert set(qs) == set(entry.oracle_sql())

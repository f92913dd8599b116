"""Pins for the bench host-canary gate (bench.py, VERDICT r12 #1).

The canary machinery decides whether a BENCH record is stamped
`host_degraded` — a wrong stamp either hides a real regression (false
healthy) or teaches readers to ignore the field (false degraded), so the
gate's mechanics get direct pins: field shape, band comparison logic,
and the settle-and-retry taking the BEST of both attempts per probe.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_measure_canaries_shape(spark):
    from bench import CANARY_BANDS, measure_canaries

    got = measure_canaries(spark)
    assert set(got) == set(CANARY_BANDS)
    for k, v in got.items():
        assert isinstance(v, float) and v > 0, (k, v)


def test_gate_canaries_retry_takes_best_and_flags(monkeypatch):
    import bench

    # first attempt breaches, second is healthy -> best-of wins, no flag
    readings = iter(
        [
            {"canary_gemm_sec": 0.009, "canary_job_sec": 0.9,
             "canary_shuffle_sec": 0.30},
            {"canary_gemm_sec": 0.010, "canary_job_sec": 0.03,
             "canary_shuffle_sec": 0.35},
        ]
    )
    monkeypatch.setattr(bench, "measure_canaries", lambda s: next(readings))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    best, degraded = bench.gate_canaries(None)
    assert not degraded
    assert best["canary_job_sec"] == 0.03  # min over attempts
    assert best["canary_gemm_sec"] == 0.009
    assert best["canary_shuffle_sec"] == 0.30

    # both attempts breach -> degraded with the best reading recorded
    readings = iter(
        [
            {"canary_gemm_sec": 0.009, "canary_job_sec": 0.12,
             "canary_shuffle_sec": 0.38},
            {"canary_gemm_sec": 0.009, "canary_job_sec": 0.10,
             "canary_shuffle_sec": 0.36},
        ]
    )
    monkeypatch.setattr(bench, "measure_canaries", lambda s: next(readings))
    best, degraded = bench.gate_canaries(None)
    assert degraded and best["canary_job_sec"] == 0.10

    # healthy first attempt -> ONE measurement, no retry
    calls = {"n": 0}

    def healthy(_):
        calls["n"] += 1
        return {"canary_gemm_sec": 0.009, "canary_job_sec": 0.03,
                "canary_shuffle_sec": 0.30}

    monkeypatch.setattr(bench, "measure_canaries", healthy)
    _, degraded = bench.gate_canaries(None)
    assert not degraded and calls["n"] == 1


def test_driver_contract_line_fits_tail_capture():
    """VERDICT r13 #2: the driver keeps only a ~2KB stdout TAIL, so the
    final printed line must carry metric/value/queries/sf inside that
    budget. Reconstruct the compact projection from the newest committed
    full record and assert it fits (with the 2-decimal fallback as the
    escape hatch bench.main applies before printing)."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    records = sorted(glob.glob(os.path.join(repo, "BENCH_LOCAL_r*.json")))
    assert records, "no committed BENCH_LOCAL record"
    d = json.load(open(records[-1]))
    compact = {
        "metric": "headline_total",
        "value": d["value"],
        "unit": "sec",
        "queries": d["queries"],
        "sf": d["sf"],
        "host_degraded": d["host_degraded"],
        # r15 normalized-series scalars (see bench.py CANARY_JOB_REF);
        # worst-case widths for records predating them
        "value_norm": d.get("value_norm", d["value"]),
        "norm_factor": d.get("canary_norm_factor", 1.8182),
        "full_record": "BENCH_LOCAL",
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        compact["queries"] = {k: round(v, 2) for k, v in d["queries"].items()}
        line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= 1900, (
        f"bench contract line {len(line)} chars exceeds the driver tail "
        "budget even at 2-decimal precision — trim fields or add a "
        "coarser fallback in bench.main"
    )

"""Compare two BENCH records the way the host-latency reality demands.

Round boots differ up to ~2x in per-Spark-job scheduling latency at
identical raw-CPU speed (BENCH canary fields; SURVEY round-12/13
deltas), so raw totals and per-entry deltas across records are
meaningless. This tool prints what IS meaningful:

- the canary context of both records (gemm / job / shuffle, pre-flight
  and end-of-run where present, host_degraded stamps);
- the shared-entry MEDIAN ratio (the round-over-round signal; a uniform
  host tax moves the median, an engine regression moves entries
  relative to it);
- entries whose ratio exceeds the median by more than a threshold —
  the actual regression candidates — with their spreads.

Usage: python tools/bench_compare.py OLD.json NEW.json [outlier_factor]
"""

from __future__ import annotations

import json
import statistics
import sys


def _canaries(d: dict) -> str:
    parts = []
    for k in ("canary_gemm_sec", "canary_job_sec", "canary_shuffle_sec"):
        if d.get(k) is not None:
            parts.append(f"{k.split('_')[1]}={d[k]}")
    if d.get("canary_preflight"):
        pf = d["canary_preflight"]
        parts.append(
            "preflight(job=%s shuffle=%s)"
            % (pf.get("canary_job_sec"), pf.get("canary_shuffle_sec"))
        )
    if d.get("host_degraded") is not None:
        parts.append(f"host_degraded={d['host_degraded']}")
    return " ".join(parts) or "(no canary fields — pre-r12 record)"


def norm_factor(d: dict) -> tuple[float, str]:
    """Canary-normalization factor of a record (bench.py model:
    max(1, mean(preflight job, end-of-run job) / 0.055 healthy edge)).
    Records that already carry canary_norm_factor use it verbatim;
    older records with canaries get it recomputed; canary-free records
    (pre-r12, incl. BASELINE) get 1.0 with a caveat — their boot health
    is unknown, so their normalized series IS their raw series."""
    if d.get("canary_norm_factor") is not None:
        return float(d["canary_norm_factor"]), "recorded"
    post = d.get("canary_job_sec")
    pre = (d.get("canary_preflight") or {}).get("canary_job_sec")
    samples = [v for v in (pre, post) if v is not None]
    if not samples:
        return 1.0, "no canaries (pre-r12 record) — raw == normalized"
    return max(1.0, round(sum(samples) / len(samples) / 0.055, 4)), "recomputed"


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25

    qo, qn = old.get("queries", {}), new.get("queries", {})
    shared = sorted(k for k in qn if k in qo and qo[k] > 0 and qn[k] > 0)
    if not shared:
        print("no shared entries")
        sys.exit(1)
    ratios = {k: qn[k] / qo[k] for k in shared}
    med = statistics.median(ratios.values())

    fo, fo_src = norm_factor(old)
    fn, fn_src = norm_factor(new)
    med_norm = med * fo / fn

    print(f"old: {sys.argv[1]}  total={old.get('value')}  {_canaries(old)}")
    print(f"new: {sys.argv[2]}  total={new.get('value')}  {_canaries(new)}")
    print(
        f"shared entries: {len(shared)}   MEDIAN ratio new/old: {med:.3f}"
        "   (a uniform shift here is the HOST, not the engine)"
    )
    print(
        f"canary-normalized: old factor {fo:.3f} ({fo_src}), new factor "
        f"{fn:.3f} ({fn_src}) -> NORMALIZED median ratio {med_norm:.3f}"
        "   (this is the engine signal; adjudicate 2x-of-BASELINE here)"
    )
    vo, vn = old.get("value"), new.get("value")
    if vo and vn:
        print(
            f"normalized totals: old {vo / fo:.2f}s  new {vn / fn:.2f}s"
            f"  (raw {vo} / {vn})"
        )
    spread = new.get("spread", {})
    flagged = [
        (r, k) for k, r in ratios.items() if r > med * factor
    ]
    if not flagged:
        print(f"no entry exceeds median x {factor} — no regression candidates")
        return
    print(f"entries exceeding median x {factor} (regression candidates):")
    for r, k in sorted(flagged, reverse=True):
        print(
            f"  {k}: {qo[k]} -> {qn[k]}  ratio {r:.2f}"
            f"  (vs median {med:.2f}; spread {spread.get(k)})"
        )


if __name__ == "__main__":
    main()

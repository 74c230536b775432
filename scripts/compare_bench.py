"""Canary-normalized comparison of two bench JSONs.

The sandbox host's effective speed varies several-fold between rounds
(see BENCH/BASELINE.md), so raw wall-time deltas between
``BENCH_r{N}.json`` files are dominated by the window, not the code.
This script divides every timing by the run's own single-thread host
canary (and every throughput by its inverse) before diffing, and
flags only deltas that exceed both the 10 % noise floor and — when
the metric carries a ``<name>_spread`` key (median-of-3 metrics,
round 5+) — its own recorded per-run spread.

Usage:
    python scripts/compare_bench.py BENCH_r04.json BENCH_r05.json

Accepts either a raw ``bench.py`` output line or the driver's wrapper
shape (``{"parsed": {...}}``).
"""

from __future__ import annotations

import json
import sys

#: metrics where BIGGER is better (normalized by multiplying with the
#: canary ratio instead of dividing)
_THROUGHPUT_MARKERS = ("per_sec", "qps_")


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' section (not a bench JSON?)")
    return d


def _is_throughput(name: str) -> bool:
    return any(m in name for m in _THROUGHPUT_MARKERS)


def compare(a: dict, b: dict) -> list[tuple[str, float, float, float, str]]:
    """[(metric, a_norm, b_norm, rel_delta, flag)] — normalized to a's
    canary basis; positive delta = b slower (timings) / b faster
    (throughputs) is reported with its sign as b-vs-a change.

    Parallelism-bound metrics (throughputs, multi-second pipeline
    walls) normalize by the MT16 canary — the effective-capacity
    measure — while single-stream latencies use the single-thread
    canary (a window can be st-calm yet deliver fewer effective cores;
    see the r5 preview analysis in BENCH/BASELINE.md)."""
    ca, cb = a["host_canary_sec"], b["host_canary_sec"]
    ma = a.get("host_canary_mt16_sec", ca)
    mb = b.get("host_canary_mt16_sec", cb)
    st_ratio = ca / cb  # b ran on a (ratio<1 ⇒ faster) host
    mt_ratio = ma / mb
    qa, qb = a["queries"], b["queries"]
    rows = []
    for k in sorted(set(qa) & set(qb)):
        if k.endswith("_spread") or not isinstance(qa[k], (int, float)):
            continue
        va, vb = float(qa[k]), float(qb[k])
        if k.endswith(("_candidate_pairs", "_n_seqs")):
            # COUNT invariants, not timings — any change is a
            # correctness smell, not a speed one (no normalization)
            if va != vb:
                rows.append((k, va, vb, (vb - va) / abs(va or 1),
                             "COUNT CHANGED"))
            continue
        if va == 0 or vb == 0:
            continue
        parallel = _is_throughput(k) or (not k.startswith("query_p95")
                                         and vb >= 1.0)
        ratio = mt_ratio if parallel else st_ratio
        nb = vb * ratio if not _is_throughput(k) else vb / ratio
        rel = (nb - va) / abs(va)
        spread = float(qb.get(k + "_spread", 0.0))
        noise = max(0.10, spread / abs(vb) if vb else 0.0)
        worse = rel > 0 if not _is_throughput(k) else rel < 0
        flag = ""
        if abs(rel) > noise:
            flag = "REGRESSION?" if worse else "improved"
        rows.append((k, va, nb, rel, flag))
    return rows


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = _load(sys.argv[1]), _load(sys.argv[2])
    print(f"canary: {sys.argv[1]}={a['host_canary_sec']}s  "
          f"{sys.argv[2]}={b['host_canary_sec']}s  "
          f"(normalizing {sys.argv[2]} onto {sys.argv[1]}'s basis)")
    flagged = 0
    for k, va, nb, rel, flag in compare(a, b):
        if flag:
            flagged += flag == "REGRESSION?"
            print(f"  {k:36s} {va:>12.4f} -> {nb:>12.4f}  "
                  f"{rel:+7.1%}  {flag}")
    if not flagged:
        print("no normalized regressions beyond the noise floor")
    return 0


if __name__ == "__main__":
    sys.exit(main())

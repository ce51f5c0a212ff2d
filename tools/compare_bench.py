"""Compare two bench JSONs across rounds, canary-normalized.

    python tools/compare_bench.py BENCH_r02.json BENCH_r03.json

Raw per-query seconds are NOT comparable across rounds on this host (the
load-triggered CPU quota varies 2-4x between epochs — BASELINE.md). This
tool compares `queries_norm16` (sec x effective_cores / 16) when both
files carry canaries; for older files without canaries (r1/r2) it falls
back to raw seconds and SAYS SO per row, so a reader can't mistake an
epoch for a regression.
"""

from __future__ import annotations

import json
import sys


def norm_queries(d: dict) -> tuple[dict, str]:
    if "parsed" in d and isinstance(d["parsed"], dict):  # driver BENCH wrapper
        d = d["parsed"]
    if d.get("queries_norm16"):
        return d["queries_norm16"], "norm16"
    q = d.get("queries", {})
    eff = (d.get("host_canary") or {}).get("effective_cores")
    if eff:  # canary present but pre-norm16 format: normalize here
        return {k: round(v * eff / 16.0, 3) for k, v in q.items()}, f"norm16(from eff={eff})"
    return q, "RAW (no canary — epoch-dependent!)"


def main() -> int:
    a_path, b_path = sys.argv[1], sys.argv[2]
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    qa, mode_a = norm_queries(a)
    qb, mode_b = norm_queries(b)
    print(f"{a_path}: {mode_a}   {b_path}: {mode_b}")
    print(f"{'query':28s} {'A':>9s} {'B':>9s} {'B/A':>6s}")
    for k in sorted(set(qa) | set(qb)):
        va, vb = qa.get(k), qb.get(k)
        ratio = f"{vb / va:.2f}" if va and vb else "-"
        print(f"{k:28s} {va if va is not None else '-':>9} "
              f"{vb if vb is not None else '-':>9} {ratio:>6s}")
    if "RAW" in mode_a or "RAW" in mode_b:
        print("\nWARNING: at least one side is raw seconds — differences may "
              "be host epochs, not code (see BASELINE.md canary sections).")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Compare two Bench artifacts with calib normalization.

Usage: python3 tools/compare_bench.py OLD.json NEW.json [threshold_pct]

Reads the one-line JSON each Bench run writes (or the driver's wrapped
{"parsed": ...} form), normalizes every per-query second by the run's
cpu_calib_ms ratio to ref_calib_ms (284 ms, the round-8 reference
host), and prints per-query deltas for BOTH sections (headline +
scale). Exits 1 if any query regressed more than threshold_pct
(default 25%) after normalization — the cross-round regression check
as one command instead of reader arithmetic.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return d


def norm(d):
    ref = d.get("ref_calib_ms", 284)
    ratio = d.get("cpu_calib_ms", ref) / ref
    out = {}
    for section in ("queries", "scale_queries"):
        for k, v in d.get(section, {}).items():
            if v is not None and v >= 0:
                out[k] = v / ratio
    return out


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
    for d, name in ((old, sys.argv[1]), (new, sys.argv[2])):
        if not d.get("valid", True):
            print(f"WARNING: {name} carries valid=false "
                  "(load-contaminated) — deltas below are unreliable")
    a, b = norm(old), norm(new)
    worst = 0.0
    print(f"{'query':34} {'old*':>8} {'new*':>8} {'delta':>8}")
    for k in sorted(set(a) | set(b)):
        if k not in a or k not in b:
            print(f"{k:34} {'—' if k not in a else f'{a[k]:.3f}':>8} "
                  f"{'—' if k not in b else f'{b[k]:.3f}':>8} {'new' if k not in a else 'gone':>8}")
            continue
        pct = (b[k] - a[k]) / a[k] * 100 if a[k] > 0 else 0.0
        worst = max(worst, pct)
        print(f"{k:34} {a[k]:8.3f} {b[k]:8.3f} {pct:+7.1f}%")
    print(f"\n(* seconds normalized to ref calib "
          f"{old.get('ref_calib_ms', 284)} ms; threshold {thr:.0f}%)")
    if worst > thr:
        print(f"REGRESSION: worst normalized delta {worst:+.1f}% > {thr:.0f}%")
        return 1
    print(f"OK: worst normalized delta {worst:+.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())

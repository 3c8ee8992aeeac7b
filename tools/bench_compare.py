"""Diff two bench records (BENCH_DETAIL.json / BENCH_r*.json shapes):
per-query warm deltas, sorted by regression factor, with adds/removes.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold=1.5]
"""

from __future__ import annotations

import json
import sys


def _queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if isinstance(d.get("parsed"), dict):  # driver BENCH_r*.json wrapper
        d = d["parsed"]
    qs = d.get("queries", d)
    return {k: float(v) for k, v in qs.items() if isinstance(v, (int, float))}


def main() -> int:
    old_p, new_p = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, new = _queries(old_p), _queries(new_p)
    shared = sorted(set(old) & set(new))
    rows = [
        (new[q] / old[q] if old[q] > 0 else float("inf"), q, old[q], new[q])
        for q in shared
    ]
    # sub-second queries sit inside shared-machine jitter (bench.py now
    # records their warm as a median-of-3, but a ±2× swing on a 0.3 s
    # wall is still noise, not a plan change) — never flag a mover
    # unless at least one side reached 1 s
    flaggable = [r for r in rows if max(r[2], r[3]) >= 1.0]
    regressions = sorted((r for r in flaggable if r[0] >= thresh), reverse=True)
    improvements = sorted(r for r in flaggable if r[0] <= 1 / thresh)
    print(f"shared: {len(shared)}  sum_old={sum(old[q] for q in shared):.1f}s"
          f"  sum_new={sum(new[q] for q in shared):.1f}s")
    if regressions:
        print(f"\nregressions ≥ {thresh}x:")
        for ratio, q, a, b in regressions:
            print(f"  {ratio:5.2f}x  {a:7.2f} -> {b:7.2f}  {q}")
    if improvements:
        print(f"\nimprovements ≥ {thresh}x:")
        for ratio, q, a, b in improvements:
            print(f"  {1/ratio:5.2f}x  {a:7.2f} -> {b:7.2f}  {q}")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"\nadded ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"\nremoved ({len(removed)}): " + ", ".join(removed))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

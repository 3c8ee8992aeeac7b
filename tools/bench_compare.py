"""Diff two bench records (BENCH_DETAIL.json / BENCH_r*.json shapes):
per-query warm deltas, sorted by regression factor, with adds/removes,
plus the machine-state adjudication (round-8 verdict item 2): median
ratio across shared entries vs the fixed-cost calibration-probe ratio —
when the two agree, apparent movers are uniform machine contention, not
plan regressions.

Usage:
  python tools/bench_compare.py OLD.json NEW.json [threshold=1.5]
  python tools/bench_compare.py --gate OLD.json NEW.json

--gate (round-8 verdict item 5): exit 1 when the median shared-entry
ratio exceeds GATE_MEDIAN_RATIO (1.10) — i.e. NEW looks uniformly
inflated vs OLD and must not be committed as the round record without a
machine-state note in the same commit. Wire it before any BENCH_DETAIL
commit:  python tools/bench_compare.py --gate BENCH_DETAIL_r08.json \
BENCH_DETAIL.json || echo "REFUSED: add machine-state note or re-run \
on a quiet box".
"""

from __future__ import annotations

import json
import statistics
import sys

GATE_MEDIAN_RATIO = 1.10


def _load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    if isinstance(d.get("parsed"), dict):  # driver BENCH_r*.json wrapper
        d = d["parsed"]
    return d


def _queries(d: dict) -> dict[str, float]:
    qs = d.get("queries", d)
    return {k: float(v) for k, v in qs.items() if isinstance(v, (int, float))}


def _calib(d: dict) -> float | None:
    """Mean of the start/end calibration probes, if recorded."""
    m = d.get("machine") or {}
    vals = [
        m.get("calib_start_sec"),
        m.get("calib_end_sec"),
    ]
    vals = [v for v in vals if isinstance(v, (int, float)) and v > 0]
    if not vals and isinstance(d.get("calib"), list):
        vals = [v for v in d["calib"] if isinstance(v, (int, float)) and v > 0]
    return sum(vals) / len(vals) if vals else None


def _median_shared_ratio(old: dict[str, float], new: dict[str, float]) -> float | None:
    """Median new/old over shared entries (both sides > 0). Uniform
    contention moves this in lock-step with the calibration ratio; a
    genuine single-plan regression leaves it ~1.0."""
    ratios = [
        new[q] / old[q]
        for q in set(old) & set(new)
        if old[q] > 0 and new[q] > 0
    ]
    return statistics.median(ratios) if ratios else None


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    gate = "--gate" in argv
    if gate:
        argv.remove("--gate")
    old_p, new_p = argv[0], argv[1]
    thresh = float(argv[2]) if len(argv) > 2 else 1.5
    old_d, new_d = _load(old_p), _load(new_p)
    old, new = _queries(old_d), _queries(new_d)
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

    # machine-state adjudication
    med = _median_shared_ratio(old, new)
    c_old, c_new = _calib(old_d), _calib(new_d)
    if med is not None:
        line = f"median shared-entry ratio: {med:.3f}"
        if c_old and c_new:
            cr = c_new / c_old
            line += f"  calibration-probe ratio: {cr:.3f}"
            if med >= GATE_MEDIAN_RATIO and abs(med - cr) <= 0.10:
                line += "  => uniform inflation ~ machine contention"
            elif med >= GATE_MEDIAN_RATIO:
                line += "  => inflation NOT explained by the probe"
        else:
            line += "  (no calibration probe on one side)"
        print(line)
    for d, tag in ((old_d, "old"), (new_d, "new")):
        m = d.get("machine") or {}
        if m:
            print(
                f"machine[{tag}]: load {m.get('load_start')} -> "
                f"{m.get('load_end')}  calib {m.get('calib_start_sec')}s -> "
                f"{m.get('calib_end_sec')}s"
            )

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

    if gate:
        if med is None:
            # a vacuous comparison (no shared positive entries — wrong
            # files, empty record) must not pass the gate silently
            print(
                "\nGATE: REFUSED — no shared entries to compare; check the "
                "record paths.",
                file=sys.stderr,
            )
            return 1
        if med >= GATE_MEDIAN_RATIO:
            print(
                f"\nGATE: REFUSED — median shared-entry ratio {med:.3f} >= "
                f"{GATE_MEDIAN_RATIO}. Re-run on a quiet box, or commit with "
                "an explicit machine-state note.",
                file=sys.stderr,
            )
            return 1
        print(f"\nGATE: ok (median ratio {round(med, 3)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

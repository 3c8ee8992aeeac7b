"""Diff two PLANS_AUDIT.md revisions: per-entry changes in exchange /
join / window node counts — the plan-shape regression tracker that
catches "this round added two shuffles to an old entry" before the
bench does.

Usage:
    python tools/audit_compare.py OLD.md NEW.md
    git show r6close:PLANS_AUDIT.md > /tmp/old.md && \
        python tools/audit_compare.py /tmp/old.md PLANS_AUDIT.md
"""

from __future__ import annotations

import sys

_COLS = (
    "exchanges", "bhj", "smj", "bnlj", "cartesian", "window",
    "arrow_py", "grouped_py", "row_py",
)


def _parse(path: str) -> dict[str, tuple[int, ...]]:
    out: dict[str, tuple[int, ...]] = {}
    for line in open(path):
        if not line.startswith("|") or "---" in line or "| query |" in line:
            continue
        cells = [c.strip() for c in line.split("|")]
        # ['', query, 9 numeric cols, '']
        if len(cells) < len(_COLS) + 3:
            continue
        try:
            out[cells[1]] = tuple(int(v) for v in cells[2 : 2 + len(_COLS)])
        except ValueError:
            continue
    return out


def main() -> int:
    old_p, new_p = sys.argv[1], sys.argv[2]
    old, new = _parse(old_p), _parse(new_p)
    shared = sorted(set(old) & set(new))
    changed = [(q, old[q], new[q]) for q in shared if old[q] != new[q]]
    print(f"shared: {len(shared)}  changed: {len(changed)}  "
          f"added: {len(set(new) - set(old))}  "
          f"removed: {len(set(old) - set(new))}")
    for q, o, n in changed:
        deltas = [
            f"{c}: {a}->{b}" for c, a, b in zip(_COLS, o, n) if a != b
        ]
        print(f"  {q}: " + ", ".join(deltas))
    worse = [
        (q, o, n) for q, o, n in changed
        if n[0] > o[0] or n[4] > o[4] or n[8] > o[8]
    ]
    if worse:
        print(f"\nplan regressions (more exchanges/cartesian/row-py): "
              f"{len(worse)}")
        return 1
    print("\nno plan regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())

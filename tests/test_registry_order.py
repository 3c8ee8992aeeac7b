"""The driver's correctness gate oracle-checks only the first
``CHECKED_WINDOW`` registry entries (registration order). Guard that every
entry inside the window carries an oracle and that the rotation contract
holds: no oracled entry stays driver-unchecked for more than one round
after registration.

Round-11 window policy (the round-10 verdict directive 1, verbatim): the
5-entry round-10 POST_FREEZE slate rotated in wholesale, plus
``pricing_summary`` as the proven spine, plus 44 re-checks of the stalest
green rows by (last green driver round across CORRECTNESS_r01–r10,
registry order) — the remaining r5 cohort plus the 6 oldest r6 rows.
1 + 5 + 44 = 50 exactly. A green round-11 driver check takes cumulative
driver coverage to ALL 285 oracled entries — full saturation.
"""

from __future__ import annotations

import json
import pathlib
import re

import __spark_entry__ as entrymod

# the four only-coverage operators (as-of join, range join, exact
# percentiles, multimodal plumbing). They rode the round-9 window and hold
# green rows in CORRECTNESS_r09; the standing contract is that they are
# never allowed to go stale past the re-check horizon (a green row within
# the last two completed rounds, or a seat in the current window).
ONLY_COVERAGE = [
    "click_view_attribution",
    "event_window_density",
    "event_value_percentiles",
    "multimodal_features",
]

# the 5-entry round-10 POST_FREEZE slate (rotated into the round-11 window)
R10_SLATE = [
    "nation_seat_apportionment",
    "part_price_size_skyline",
    "order_price_stump_split",
    "event_score_isotonic_fit",
    "nation_profile_mst",
]

_ROOT = pathlib.Path(__file__).resolve().parent.parent
_PRIOR_ROUNDS = "CORRECTNESS_r*.json"  # r01–r10 exist at round-11 build time


def _prior_files():
    out = []
    for p in sorted(_ROOT.glob(_PRIOR_ROUNDS)):
        rnd = int(re.search(r"_r(\d+)", p.stem).group(1))
        if rnd <= 10:
            out.append((rnd, p))
    return out


def _driver_checked() -> set[str]:
    """Names holding a fully-green driver row in rounds 1-10."""
    checked: set[str] = set()
    for _rnd, p in _prior_files():
        d = json.loads(p.read_text())
        qs = d.get("queries", d)
        if isinstance(qs, dict):
            for name, row in qs.items():
                if isinstance(row, dict) and row.get("hash_match"):
                    checked.add(name)
    return checked


def _last_green() -> dict[str, int]:
    """Per-entry newest round holding a fully-green driver row (r1-r10)."""
    last: dict[str, int] = {}
    for rnd, p in _prior_files():
        d = json.loads(p.read_text())
        qs = d.get("queries", d)
        if isinstance(qs, dict):
            for name, row in qs.items():
                if isinstance(row, dict) and row.get("hash_match"):
                    last[name] = max(last.get(name, 0), rnd)
    return last


def test_checked_window_is_fully_oracled():
    names = list(entrymod._registry())
    oracles = entrymod.oracle_sql()
    window = names[: entrymod.CHECKED_WINDOW]
    missing = [n for n in window if n not in oracles]
    assert not missing, f"oracle-less queries inside the checked window: {missing}"


def test_window_is_exactly_the_explicit_list():
    names = list(entrymod._registry())
    assert names[: entrymod.CHECKED_WINDOW] == entrymod._WINDOW
    assert len(entrymod._WINDOW) == entrymod.CHECKED_WINDOW
    assert len(set(entrymod._WINDOW)) == entrymod.CHECKED_WINDOW


def test_only_coverage_operators_recently_checked():
    """The four only-coverage operators must hold a green driver row no
    older than two completed rounds back (they rode the round-9 window)
    — or be in the current window."""
    last = _last_green()
    window = set(entrymod._WINDOW)
    stale = [
        n for n in ONLY_COVERAGE if n not in window and last.get(n, 0) < 9
    ]
    assert not stale, f"only-coverage operators gone stale: {stale}"


# entries registered AFTER the round-11 window froze (they become rotation
# candidates for round 12; append here when adding queries mid-round)
POST_FREEZE: set[str] = {
    # battery_r11 (registered post-freeze): paired-comparison ranking +
    # off-policy evaluation — both sweep-verified as uncovered families
    "event_type_bradley_terry",
    "event_type_policy_replay",
}


def test_round11_window_composition():
    """The round-11 window is exactly: spine + 5-entry r10 slate + 44
    stalest-green re-checks (r10 verdict directive 1)."""
    window = entrymod._WINDOW
    assert window[0] == "pricing_summary"
    assert window[1:6] == R10_SLATE
    # the slate had never held a driver row before round 11
    checked_prior = _driver_checked()
    assert not (set(R10_SLATE) & checked_prior)
    # every re-check slot holds a green row already (it IS a re-check)
    rechecks = window[6:]
    assert len(rechecks) == 44
    missing = [n for n in rechecks if n not in checked_prior]
    assert not missing, f"re-check entries without prior green rows: {missing}"
    # staleness rule: rechecks are the pool's 44 oldest by
    # (last-green round, registry order) — deterministic, no cherry-picking
    last = _last_green()
    names = list(entrymod._registry())
    order = {n: i for i, n in enumerate(names)}
    oracles = entrymod.oracle_sql()
    excluded = set(R10_SLATE) | {"pricing_summary"}
    pool = [n for n in names if n in oracles and n in last and n not in excluded]
    pool.sort(key=lambda n: (last[n], order[n]))
    assert rechecks == pool[:44]


def test_round11_window_covers_all_never_checked_oracled_entries():
    """Every oracled entry with no driver row in r01-r10 must be in the
    round-11 window (or the explicit POST_FREEZE slate for round 12) —
    the standing rotation contract: no oracled entry stays
    driver-unchecked for more than one round after registration."""
    # backlog membership counts ANY recorded row (not just hash-green),
    # so build the set from plain membership
    seen: set[str] = set()
    for _rnd, p in _prior_files():
        d = json.loads(p.read_text())
        qs = d.get("queries", d)
        if isinstance(qs, dict):
            seen |= set(qs)
    oracles = entrymod.oracle_sql()
    never = [n for n in entrymod._registry() if n not in seen and n in oracles]
    out = [n for n in never if n not in set(entrymod._WINDOW) | POST_FREEZE]
    assert not out, f"never-driver-checked oracled entries outside window: {out}"


def test_tail_entries_are_outside_window():
    names = list(entrymod._registry())
    tail = entrymod._tail_names()
    assert names[entrymod.CHECKED_WINDOW:] == tail
    assert set(tail) & set(entrymod._WINDOW) == set()

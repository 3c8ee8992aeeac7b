"""The driver's correctness gate oracle-checks only the first
``CHECKED_WINDOW`` registry entries (registration order). Guard that every
entry inside the window carries an oracle and that the rotation contract
holds: no oracled entry stays driver-unchecked for more than one round
after registration.

Round-13 window policy (the round-12 verdict directive 1, verbatim): the
3-entry round-12 POST_FREEZE slate rotated in wholesale, plus
``pricing_summary`` as the proven spine, plus 46 re-checks of the stalest
green rows by (last green driver round across CORRECTNESS_r01–r12,
registry order) — the remaining r7 cohort (41 rows) plus the 5 oldest r8
rows. 1 + 3 + 46 = 50 exactly. A green round-13 driver check re-saturates
cumulative driver coverage at ALL 290 oracled entries.
"""

from __future__ import annotations

import json
import pathlib
import re

import __spark_entry__ as entrymod

# the four only-coverage operators (as-of join, range join, exact
# percentiles, multimodal plumbing). They rode the round-9 window; the
# standing contract is that they never drift past the deterministic
# staleness frontier: each must either hold a seat in the current window
# or be FRESHER than every re-check the staleness rule selected (if one
# of them ranked among the stalest, the rule itself would have seated it
# — this test catches a hand-edited window that skips them).
ONLY_COVERAGE = [
    "click_view_attribution",
    "event_window_density",
    "event_value_percentiles",
    "multimodal_features",
]

# the 3-entry round-12 POST_FREEZE slate (rotated into the round-13 window)
R12_SLATE = [
    "doc_nb_lang_classifier",
    "doc_nb_stream_train",
    "corpus_heaps_fit",
]

# slots after the spine occupied by the slate; re-checks start after it
_RECHECK_START = 1 + len(R12_SLATE)

_ROOT = pathlib.Path(__file__).resolve().parent.parent
_PRIOR_ROUNDS = "CORRECTNESS_r*.json"  # r01–r12 exist at round-13 build time
_PRIOR_MAX = 12


def _prior_files():
    out = []
    for p in sorted(_ROOT.glob(_PRIOR_ROUNDS)):
        rnd = int(re.search(r"_r(\d+)", p.stem).group(1))
        if rnd <= _PRIOR_MAX:
            out.append((rnd, p))
    return out


def _driver_checked() -> set[str]:
    """Names holding a fully-green driver row in rounds 1-12."""
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
    """Per-entry newest round holding a fully-green driver row (r1-r12)."""
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


def test_only_coverage_operators_not_past_the_frontier():
    """Each only-coverage operator must hold a seat in the current window
    or be strictly fresher than the staleness frontier (the newest
    last-green round among the re-checks the deterministic rule chose).
    They are r9-green; the round-13 frontier is r8, so the rotation will
    seat them automatically when their cohort reaches the frontier."""
    last = _last_green()
    window = set(entrymod._WINDOW)
    rechecks = entrymod._WINDOW[_RECHECK_START:]
    unknown = [n for n in rechecks if n not in last]
    assert not unknown, f"re-check seats with no prior green driver row: {unknown}"
    frontier = max(last.get(n, 0) for n in rechecks)
    stale = [
        n
        for n in ONLY_COVERAGE
        if n not in window and last.get(n, 0) <= frontier
    ]
    assert not stale, f"only-coverage operators past the frontier: {stale}"


# entries registered AFTER the round-13 window froze (they become rotation
# candidates for round 14; append here when adding queries mid-round)
POST_FREEZE: set[str] = {
    "doc_duplicated_coverage",    # battery_r13: exact-span doc coverage
    "doc_nb_margin_calibration",  # battery_r13: NB reliability table
    "doc_nb_unlearn_erasure",     # battery_r13: exact NB unlearning
    "doc_coverage_stream_index",  # battery_r13: span-index stream twin
}


def test_round13_window_composition():
    """The round-13 window is exactly: spine + 3-entry r12 slate + 46
    stalest-green re-checks (r12 verdict directive 1)."""
    window = entrymod._WINDOW
    assert window[0] == "pricing_summary"
    assert window[1:_RECHECK_START] == R12_SLATE
    # the slate had never held a driver row before round 13
    checked_prior = _driver_checked()
    assert not (set(R12_SLATE) & checked_prior)
    # every re-check slot holds a green row already (it IS a re-check)
    rechecks = window[_RECHECK_START:]
    assert len(rechecks) == entrymod.CHECKED_WINDOW - _RECHECK_START
    missing = [n for n in rechecks if n not in checked_prior]
    assert not missing, f"re-check entries without prior green rows: {missing}"
    # staleness rule: rechecks are the pool's oldest by
    # (last-green round, registry order) — deterministic, no cherry-picking
    last = _last_green()
    names = list(entrymod._registry())
    order = {n: i for i, n in enumerate(names)}
    oracles = entrymod.oracle_sql()
    excluded = set(R12_SLATE) | {"pricing_summary"}
    pool = [n for n in names if n in oracles and n in last and n not in excluded]
    pool.sort(key=lambda n: (last[n], order[n]))
    assert rechecks == pool[: len(rechecks)]


def test_round13_window_covers_all_never_checked_oracled_entries():
    """Every oracled entry with no driver row in r01-r12 must be in the
    round-13 window (or the explicit POST_FREEZE slate for round 14) —
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


def test_duplicate_registration_raises():
    """register() and register_grid_plans() refuse duplicate names — a
    silent overwrite once served a grid subplan under a public entry
    name (round-12 ADVICE)."""
    import pytest

    from flight_radar_pipeline_spark.plans.battery import (
        REGISTRY,
        register,
        register_grid_plans,
    )

    taken = next(iter(REGISTRY))
    with pytest.raises(ValueError, match="duplicate battery registration"):
        register(taken, None)(lambda spark, sf_dir: None)

    from flight_radar_pipeline_spark.plans.battery import GRID_PLANS

    taken_grid = next(iter(GRID_PLANS))
    with pytest.raises(ValueError, match="duplicate grid-plan registration"):
        register_grid_plans(taken_grid)(lambda spark, sf_dir: {})

"""The driver's correctness gate oracle-checks only the first
``CHECKED_WINDOW`` registry entries (registration order). Guard that every
entry inside the window carries an oracle and that the operators the round-1
gate missed (as-of join, range join, percentiles, multimodal) now sit inside
it — so adding queries can never silently push an only-coverage entry out.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

MUST_BE_CHECKED = [
    "click_view_attribution",   # only battery coverage of the as-of join
    "event_window_density",     # only battery coverage of the range join
    "event_value_percentiles",
    "multimodal_features",
]


def test_checked_window_is_fully_oracled():
    names = list(entrymod._registry())
    oracles = entrymod.oracle_sql()
    window = names[: entrymod.CHECKED_WINDOW]
    missing = [n for n in window if n not in oracles]
    assert not missing, f"oracle-less queries inside the checked window: {missing}"


def test_unique_operator_coverage_inside_window():
    names = list(entrymod._registry())
    window = set(names[: entrymod.CHECKED_WINDOW])
    out = [n for n in MUST_BE_CHECKED if n not in window]
    assert not out, f"only-coverage queries outside the checked window: {out}"


def test_tail_entries_exist_and_are_redundant_or_rows_only():
    names = list(entrymod._registry())
    assert names[-len(entrymod._TAIL):] == entrymod._TAIL
    # every tail entry either lacks an oracle by design or duplicates a
    # shape that holds a green row inside the window
    assert set(entrymod._TAIL) & set(names[: entrymod.CHECKED_WINDOW]) == set()

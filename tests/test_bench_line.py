"""The bench stdout line must fit the recording harness's 2000-char tail.

Round 3's record was silently lost: the single JSON line grew past the
tail window once the battery passed ~65 queries, the head of the line fell
outside the captured buffer, and the harness parsed nothing. _fit_line is
the guarantee this cannot recur — these tests pin the budget invariant and
the keep-the-slowest drop policy without needing a SparkSession.
"""

from __future__ import annotations

import json

from bench import _STDOUT_LINE_BUDGET, _fit_line, _time_with_retry


def _payload():
    return {
        "metric": "battery_total_wall",
        "value": 50.0,
        "unit": "sec",
        "cold_total": 100.0,
        "timing_mode": "warm-of-2",
        "sf": 0.1,
        "n_queries": 0,
        "detail": "BENCH_DETAIL.json",
    }


def test_small_battery_keeps_every_query():
    warm = {f"q{i}": float(i) for i in range(10)}
    line = _fit_line(_payload(), warm)
    parsed = json.loads(line)
    assert parsed["queries"] == warm
    assert parsed["queries_omitted"] == 0
    assert len(line) <= _STDOUT_LINE_BUDGET


def test_oversized_battery_fits_and_keeps_slowest():
    # 300 long-named queries cannot all fit; the slowest must survive.
    warm = {f"extremely_long_query_name_number_{i:03d}": i / 10.0 for i in range(300)}
    line = _fit_line(_payload(), warm)
    assert len(line) <= _STDOUT_LINE_BUDGET
    parsed = json.loads(line)
    kept = parsed["queries"]
    assert parsed["queries_omitted"] == 300 - len(kept)
    assert 0 < len(kept) < 300
    slowest = max(warm, key=warm.get)
    assert slowest in kept
    # every kept query is at least as slow as every dropped one
    dropped_max = max(v for n, v in warm.items() if n not in kept)
    assert min(kept.values()) >= dropped_max


def test_line_is_single_line_json():
    warm = {f"q{i}": 1.0 for i in range(5)}
    line = _fit_line(_payload(), warm)
    assert "\n" not in line
    json.loads(line)


def test_warm_stall_retries_once_and_keeps_better_warm():
    seq = iter([3.0, 9.2, 1.2])  # cold, stalled warm, retry
    cold, warm = _time_with_retry(lambda: next(seq))
    assert (cold, warm) == (3.0, 1.2)


def test_clean_warm_does_not_retry():
    calls = []

    def run():
        calls.append(1)
        return [3.0, 1.5][len(calls) - 1]

    cold, warm = _time_with_retry(run)
    assert (cold, warm) == (3.0, 1.5)
    assert len(calls) == 2


def test_error_short_circuits():
    cold, warm = _time_with_retry(lambda: -1.0)
    assert (cold, warm) == (-1.0, -1.0)


def test_both_warm_passes_slower_clamps_to_cold():
    seq = iter([3.0, 4.0, 5.0])
    cold, warm = _time_with_retry(lambda: next(seq))
    assert (cold, warm) == (3.0, 3.0)  # warm can never exceed cold

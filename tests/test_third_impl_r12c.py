"""Third-implementation checks, batch 35 — the stream-maintained
ledger/partial entries (round-11 verdict, next-round item 5): growth
accounting from a per-user last-day state machine, rolling-7d KMV from
per-day k-min sets, drift moments, and histogram quantiles. The Spark
entries maintain this state through foreachBatch folds and the shared
oracles recompute it from raw rows in SQL; this walk states the same
quantities as plain Python folds over the parquet — per-user day lists,
explicit k-min heaps, cumulative bin scans — so all three statements
must agree.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from datetime import timedelta

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entry.queries()


def _r(x: float, dp: int) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"select event_id, ts, user_id, event_type, value"
        f" from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


# --------------------------------------------------------------------------
# user_growth_stream_ledger — per-user previous-active-day classification
# --------------------------------------------------------------------------


def test_growth_stream_ledger_vs_last_day_walk(spark, events):
    user_days: dict[int, set] = defaultdict(set)
    for _eid, ts, uid, _et, _v in events:
        user_days[uid].add(ts.date())
    daily: dict = defaultdict(lambda: [0, 0, 0, 0])  # active/new/ret/res
    for _uid, days in user_days.items():
        prev = None
        for d in sorted(days):
            rec = daily[d]
            rec[0] += 1
            if prev is None:
                rec[1] += 1
            elif prev == d - timedelta(days=1):
                rec[2] += 1
            else:
                rec[3] += 1
            prev = d
    expected = []
    prev_active = 0
    for d in sorted(daily):
        n_act, n_new, n_ret, n_res = daily[d]
        expected.append(
            (
                d.strftime("%Y-%m-%d"),
                n_act,
                n_new,
                n_ret,
                n_res,
                prev_active - n_ret,
            )
        )
        prev_active = n_act

    got = [
        (r.day, r.n_active, r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
        for r in _run("user_growth_stream_ledger", spark)
    ]
    assert got == expected
    # the additive identity the ledger is built on
    assert all(a == nw + rt + rs for _d, a, nw, rt, rs, _c in expected)


# --------------------------------------------------------------------------
# user_kmv_stream_partials — per-day k-min sets merged across a 7d window
# --------------------------------------------------------------------------

_RKMV_K = 32


def test_kmv_stream_partials_vs_kmin_walk(spark, events):
    day_users: dict = defaultdict(set)
    for _eid, ts, uid, _et, _v in events:
        day_users[ts.date()].add(uid)
    # window-end grid: every day extended 0..6 forward (the oracle's
    # cross join with range(7))
    wends = sorted({d + timedelta(days=off) for d in day_users for off in range(7)})
    expected = []
    for wend in wends:
        users = set()
        for off in range(7):
            users |= day_users.get(wend - timedelta(days=off), set())
        if not users:
            continue
        n_exact = len(users)
        if n_exact <= _RKMV_K:
            est = float(n_exact)
        else:
            hvs = sorted(
                ((int(_md5(f"kmv-{u}")[:6], 16) + 0.5) / 16777216.0, u)
                for u in users
            )
            est = _r((_RKMV_K - 1) / hvs[_RKMV_K - 1][0], 3)
        expected.append((wend.strftime("%Y-%m-%d"), n_exact, est))

    got = [
        (r.window_end, r.n_exact, r.kmv_estimate)
        for r in _run("user_kmv_stream_partials", spark)
    ]
    assert got == expected


# --------------------------------------------------------------------------
# event_drift_stream_moments — overall vs last-day mean in pooled-sigma units
# --------------------------------------------------------------------------


def test_drift_stream_moments_vs_float_folds(spark, events):
    by_type: dict = defaultdict(list)
    last_day = max(ts.date() for _e, ts, _u, _t, _v in events)
    last_by_type: dict = defaultdict(list)
    for _eid, ts, _uid, et, v in events:
        if v is not None:
            by_type[et].append(float(v))
        if ts.date() == last_day:
            # the last-day aggregate counts rows (count(*)) and averages
            # value — mirror NULL handling of avg
            last_by_type[et].append(None if v is None else float(v))
    expected = []
    for et in sorted(by_type):
        if et not in last_by_type:
            continue
        vals = by_type[et]
        n = len(vals)
        mean = math.fsum(vals) / n
        var = math.fsum((x - mean) ** 2 for x in vals) / (n - 1)
        lvals = [x for x in last_by_type[et] if x is not None]
        mean_last = math.fsum(lvals) / len(lvals)
        expected.append(
            (
                et,
                n,
                _r(mean, 4),
                _r(var, 4),
                len(last_by_type[et]),
                _r(mean_last, 4),
                _r((mean_last - mean) / math.sqrt(var), 4),
            )
        )

    got = [
        (
            r.event_type,
            r.n,
            r.mean_overall,
            r.var_overall,
            r.n_last,
            r.mean_last,
            r.shift_sigma,
        )
        for r in _run("event_drift_stream_moments", spark)
    ]
    assert got == expected


# --------------------------------------------------------------------------
# event_hist_stream_quantiles — equi-width bins, cumulative interpolation
# --------------------------------------------------------------------------

_HQ_LO, _HQ_HI, _HQ_BINS = 0.0, 500.0, 50
_HQ_PROBS = [0.5, 0.9, 0.99]


def test_hist_stream_quantiles_vs_cumulative_bin_walk(spark, events):
    width = (_HQ_HI - _HQ_LO) / _HQ_BINS
    bins: dict = defaultdict(lambda: defaultdict(int))
    for _eid, _ts, _uid, et, v in events:
        b = min(_HQ_BINS - 1, max(0, int(math.floor((float(v) - _HQ_LO) / width))))
        bins[et][b] += 1
    expected = []
    for et in sorted(bins):
        n = sum(bins[et].values())
        for p in _HQ_PROBS:
            cum = 0
            for b in sorted(bins[et]):
                cnt = bins[et][b]
                cum += cnt
                if cum >= p * n:
                    q = _HQ_LO + width * (b + (p * n - (cum - cnt)) / cnt)
                    expected.append((et, p, _r(q, 6), n))
                    break

    got = [
        (r.event_type, r.p, r.quantile, r.n)
        for r in _run("event_hist_stream_quantiles", spark)
    ]
    assert got == expected

"""Third-implementation checks, batch 42 — sequence and time-frame
semantics: the Markov transition matrix from explicit per-user ordered
walks, the 7-day RANGE-frame rolling sum as a nested interval scan (the
walk states the frame INCLUSIVELY on both ends, which is what both
engines' `range between interval 7 day preceding and current row`
means), dense timeline gap-fill, deterministic dedup-by-key, and the
incremental rollup's merge ≡ recompute identity folded by hand.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entry.queries()

_FMT = "%Y-%m-%d %H:%M:%S"


def _r(x: float, dp: int) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"select event_id, ts, user_id, event_type"
        f" from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


@pytest.fixture(scope="module")
def orders():
    con = duckdb.connect()
    rows = con.execute(
        f"select o_orderkey, o_custkey, o_totalprice, o_orderdate,"
        f" o_orderpriority from '{SF_DIR}/orders.parquet'"
    ).fetchall()
    con.close()
    return rows


def test_markov_transitions_vs_ordered_walk(spark, events):
    by_user: dict = defaultdict(list)
    for eid, ts, uid, et in events:
        by_user[uid].append((ts, eid, et))
    pairs: dict = defaultdict(int)
    for uid, evs in by_user.items():
        evs.sort()
        for (_t1, _e1, a), (_t2, _e2, b) in zip(evs, evs[1:]):
            pairs[(a, b)] += 1
    tot: dict = defaultdict(int)
    for (a, _b), n in pairs.items():
        tot[a] += n
    expected = sorted(
        (a, b, n, _r(n / tot[a], 6)) for (a, b), n in pairs.items()
    )

    got = [
        (r.prev_type, r.event_type, r.n, r.p)
        for r in _run("event_type_transitions", spark)
    ]
    assert got == expected
    # rows of the matrix sum to 1 (up to the 6dp rounding)
    rowsum: dict = defaultdict(float)
    for a, _b, _n, p in expected:
        rowsum[a] += p
    assert all(abs(s - 1.0) < 1e-4 for s in rowsum.values())


def test_rolling_7d_sum_vs_interval_scan(spark, orders):
    by_cust: dict = defaultdict(list)
    for ok, ck, price, dt, _pr in orders:
        by_cust[ck].append((dt, ok, float(price)))
    expected = []
    for ck in sorted(by_cust):
        rows = sorted(by_cust[ck])
        for dt, ok, _p in rows:
            s = sum(
                p2
                for dt2, _ok2, p2 in rows
                if dt - timedelta(days=7) <= dt2 <= dt
            )
            expected.append((ck, ok, _r(s, 2)))
    expected.sort()

    got = [
        (r.o_custkey, r.o_orderkey, r.sum_7d)
        for r in _run("customer_7d_order_sum", spark)
    ]
    assert sorted(got) == expected


def test_dense_timeline_vs_gap_fill_walk(spark, events):
    lo = min(r[1] for r in events).replace(minute=0, second=0, microsecond=0)
    hi = max(r[1] for r in events).replace(minute=0, second=0, microsecond=0)
    counts: dict = defaultdict(int)
    for _eid, ts, _uid, _et in events:
        counts[ts.replace(minute=0, second=0, microsecond=0)] += 1
    expected, h = [], lo
    while h <= hi:
        expected.append((h.strftime(_FMT), counts.get(h, 0)))
        h += timedelta(hours=1)

    got = [(r.hour_start, r.n_events) for r in _run("hourly_timeline_dense", spark)]
    assert got == expected
    # the spine really is dense and the observed total is conserved
    assert len(got) == int((hi - lo).total_seconds()) // 3600 + 1
    assert sum(n for _h, n in got) == len(events)


def test_latest_order_vs_explicit_winner_walk(spark, orders):
    best: dict = {}
    for ok, ck, price, dt, _pr in orders:
        key = (dt, ok)
        if ck not in best or key > best[ck][0]:
            best[ck] = (key, ok, float(price), dt)
    expected = [
        (ck, ok, p, dt.strftime("%Y-%m-%d"))
        for ck, (_k, ok, p, dt) in sorted(best.items())
    ]

    got = [
        (r.o_custkey, r.o_orderkey, r.o_totalprice, r.orderdate_str)
        for r in _run("latest_order_per_customer", spark)
    ]
    assert got == expected


def test_incremental_rollup_vs_hand_merge(spark, orders):
    base: dict = defaultdict(lambda: [0, 0.0])
    delta: dict = defaultdict(lambda: [0, 0.0])
    for ok, _ck, price, _dt, prio in orders:
        base[prio][0] += 1
        base[prio][1] += float(price)
        if ok % 5 == 0:
            delta[prio][0] += 1
            delta[prio][1] += float(price) + 10
    expected = []
    for prio in sorted(base):
        n = base[prio][0] + delta[prio][0]
        rev = base[prio][1] + delta[prio][1]
        expected.append((prio, n, _r(rev, 2)))

    got = [
        (r.o_orderpriority, r.n_orders, r.revenue)
        for r in _run("incremental_daily_rollup", spark)
    ]
    assert got == expected

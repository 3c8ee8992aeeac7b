"""Third-implementation checks, batch 8: pure-Python imperative
references (duckdb used only as a reader) for the temporal-join and
period-report families — the ordered conversion funnel, the as-of
attribution join, the ±30-minute range-join density, time-decay
multi-touch attribution, gap-filled month-over-month growth, and the
cohort cumulative-LTV curve (exact integer cents + floor division).
"""

from __future__ import annotations

import calendar
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


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"select event_id, user_id, event_type, value, ts"
        f" from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def _epoch(ts):
    return calendar.timegm(ts.timetuple())


def test_funnel_vs_pure_stage_walk(spark, events):
    """min signup → first later click → first later purchase."""
    s1: dict = {}
    for _e, u, t, _v, ts in events:
        if t == "signup" and (u not in s1 or ts < s1[u]):
            s1[u] = ts
    s2: dict = {}
    for _e, u, t, _v, ts in events:
        if t == "click" and u in s1 and ts > s1[u]:
            if u not in s2 or ts < s2[u]:
                s2[u] = ts
    s3: dict = {}
    for _e, u, t, _v, ts in events:
        if t == "purchase" and u in s2 and ts > s2[u]:
            if u not in s3 or ts < s3[u]:
                s3[u] = ts
    got = _run("signup_click_purchase_funnel", spark)
    assert [(r.stage, r.n_users) for r in got] == [
        ("1_signup", len(s1)),
        ("2_click", len(s2)),
        ("3_purchase", len(s3)),
    ]
    assert len(s1) >= len(s2) >= len(s3)


def test_asof_attribution_vs_pure_carry(spark, events):
    """Every click matched to the user's latest view at-or-before it;
    the match timestamp must be UNIQUE per pick (asserted), so the
    picked view_id is well-defined in all three implementations."""
    views: dict = defaultdict(list)
    clicks = []
    for eid, u, t, _v, ts in events:
        if t == "view":
            views[u].append((ts, eid))
        elif t == "click":
            clicks.append((eid, u, ts))
    for vs in views.values():
        vs.sort()
    want = {}
    for cid, u, cts in clicks:
        best = None
        ties = 0
        for vts, vid in views.get(u, ()):
            if vts <= cts:
                if best is None or vts > best[0]:
                    best, ties = (vts, vid), 1
                elif vts == best[0]:
                    ties += 1
        assert ties <= 1, "ambiguous as-of pick (duplicate view ts)"
        want[cid] = (
            u,
            cts.strftime("%Y-%m-%d %H:%M:%S"),
            best[1] if best else None,
            (_epoch(cts) - _epoch(best[0])) if best else None,
        )
    got = _run("click_view_attribution", spark)
    assert [r.click_id for r in got] == sorted(want)
    for r in got:
        u, cts_s, vid, gap = want[r.click_id]
        assert (r.user_id, r.click_ts, r.view_id, r.gap_s) == (
            u, cts_s, vid, gap,
        )


def test_window_density_vs_pure_interval_count(spark, events):
    """Top-20 by (value desc, event_id) anchors; [ts−30m, ts+30m)
    membership counted directly."""
    top = sorted(events, key=lambda e: (-e[3], e[0]))[:20]
    ts_all = [ts for _e, _u, _t, _v, ts in events]
    want = {}
    for eid, _u, _t, _v, ts in top:
        lo = ts - timedelta(minutes=30)
        hi = ts + timedelta(minutes=30)
        want[eid] = sum(1 for t2 in ts_all if lo <= t2 < hi)
    got = _run("event_window_density", spark)
    assert [r.window_id for r in got] == sorted(want)
    for r in got:
        assert r.n_events == want[r.window_id]
        assert r.n_events >= 1  # the anchor itself is inside its window


def test_multitouch_attribution_vs_pure_decay(spark, events):
    """10-minute-half-life weights over the 30-minute lookback; credit
    normalized per purchase (floor-epoch deltas → identical exps)."""
    purchases = [
        (eid, u, ts) for eid, u, t, _v, ts in events if t == "purchase"
    ]
    clicks: dict = defaultdict(list)
    for eid, u, t, _v, ts in events:
        if t == "click":
            clicks[u].append((ts, eid))
    want = {}
    for pid, u, pts in purchases:
        touches = [
            (cid, math.exp(
                -math.log(2) * (_epoch(pts) - _epoch(cts)) / 600.0
            ))
            for cts, cid in clicks.get(u, ())
            if cts <= pts and cts >= pts - timedelta(minutes=30)
        ]
        if not touches:
            continue
        tot = math.fsum(w for _c, w in touches)
        for cid, w in touches:
            want[(pid, cid)] = _r(w / tot, 4)
    got = _run("purchase_multitouch_attribution", spark)
    assert [(r.purchase_id, r.click_id) for r in got] == sorted(want)
    per_p: dict = defaultdict(float)
    for r in got:
        assert r.credit == pytest.approx(
            want[(r.purchase_id, r.click_id)], abs=1e-9
        )
        per_p[r.purchase_id] += r.credit
    for pid, s in per_p.items():
        assert s == pytest.approx(1.0, abs=5e-4)  # rounding residue only


def _month(d):
    return d.year * 12 + (d.month - 1)


def test_mom_growth_vs_pure_spine_walk(spark):
    """Gap-filled nation × month spine from exact integer cents."""
    con = duckdb.connect()
    rows = con.execute(
        f"select n_name, cast(o_orderdate as date), o_totalprice"
        f" from '{SF_DIR}/orders.parquet' o"
        f" join '{SF_DIR}/customer.parquet' c on o.o_custkey = c.c_custkey"
        f" join '{SF_DIR}/nation.parquet' n on c.c_nationkey = n.n_nationkey"
    ).fetchall()
    nations = [x for (x,) in con.execute(
        f"select n_name from '{SF_DIR}/nation.parquet'"
    ).fetchall()]
    con.close()
    cents: dict = defaultdict(int)
    months = [_month(d) for _n, d, _p in rows]
    lo, hi = min(months), max(months)
    for nat, d, px in rows:
        cents[(nat, _month(d))] += int(math.floor(px * 100))
    want = []
    for nat in sorted(nations):
        prev = None
        for m in range(lo, hi + 1):
            c = cents.get((nat, m), 0)
            growth = (
                None if prev is None or prev == 0
                else _r((c - prev) / float(prev), 6)
            )
            want.append(
                (nat, f"{m // 12:04d}-{m % 12 + 1:02d}", _r(c / 100.0, 2), growth)
            )
            prev = c
    got = _run("nation_month_revenue_growth", spark)
    assert len(got) == len(want)
    for r, (nat, mon, rev, growth) in zip(got, want):
        assert (r.nation, r.month) == (nat, mon)
        assert r.revenue == pytest.approx(rev, abs=1e-9)
        if growth is None:
            assert r.mom_growth is None
        else:
            assert r.mom_growth == pytest.approx(growth, abs=1e-9)


def test_cohort_ltv_vs_pure_cents_walk(spark):
    """First-order-month cohorts, age-dense running cents, exact floor
    division per user — every output value is an exact integer."""
    con = duckdb.connect()
    rows = con.execute(
        f"select o_custkey, cast(o_orderdate as date), o_totalprice"
        f" from '{SF_DIR}/orders.parquet'"
    ).fetchall()
    con.close()
    first: dict = {}
    for ck, d, _p in rows:
        m = _month(d)
        if ck not in first or m < first[ck]:
            first[ck] = m
    sizes: dict = defaultdict(int)
    for ck in first:
        sizes[first[ck]] += 1
    mx = max(_month(d) for _c, d, _p in rows)
    rev: dict = defaultdict(int)
    for ck, d, px in rows:
        rev[(first[ck], _month(d) - first[ck])] += int(math.floor(px * 100))
    want = []
    for cohort in sorted(sizes):
        cum = 0
        for age in range(0, mx - cohort + 1):
            cum += rev.get((cohort, age), 0)
            want.append(
                (
                    f"{cohort // 12:04d}-{cohort % 12 + 1:02d}",
                    age,
                    sizes[cohort],
                    cum // sizes[cohort],
                )
            )
    got = _run("cohort_cumulative_ltv", spark)
    assert len(got) == len(want)
    for r, (cohort, age, users, ltv) in zip(got, want):
        assert (r.cohort, r.age, r.cohort_users) == (cohort, age, users)
        assert r.cum_ltv_cents_per_user == ltv

"""Third-implementation checks, batch 26 — lakehouse-lineage and cohort
walks: the snapshot diff, the point-in-time SCD2 lookup, RFM quintile
segmentation (with hand-rolled quantile_cont fences), the day-over-day
rank-shift leaderboard, sessionized bounce rate, and the weekly cohort
retention matrix. Pure imperative Python from the parquet.
"""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import datetime, timedelta

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
def orders():
    con = duckdb.connect()
    rows = con.execute(
        f"""select o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderpriority, o_orderdate
            from '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    con.close()
    return rows


def test_snapshot_diff_vs_pure_set_walk(spark, orders):
    """Version A drops every 13th key, version B drops every 17th and
    bumps every 10th price: added/removed from set membership, changed
    from the price rule directly — the fingerprint machinery must reduce
    to exactly this classification."""
    keys = {int(k) for k, *_rest in orders}
    a = {k for k in keys if k % 13 != 0}
    b = {k for k in keys if k % 17 != 0}
    want = {}
    for k in b - a:
        want[k] = "added"
    for k in a - b:
        want[k] = "removed"
    for k in a & b:
        if k % 10 == 0:  # the only field the B version mutates
            want[k] = "changed"
    got = {r.o_orderkey: r.change_type for r in _run("snapshot_diff", spark)}
    assert got == want


def test_pit_segment_vs_pure_validity_walk(spark, orders):
    """Each order takes the segment valid ON its date: 'UPGRADED' for
    every 10th customer iff the order date is on/after 1995-07-01, else
    the base segment — the as-of join's answer re-derived row by row."""
    con = duckdb.connect()
    seg = {
        int(k): s
        for k, s in con.execute(
            f"select c_custkey, c_mktsegment from '{SF_DIR}/customer.parquet'"
        ).fetchall()
    }
    con.close()
    cut = datetime(1995, 7, 1)
    want = []
    for k, ck, _st, _pr, _pri, od in orders:
        odt = datetime(od.year, od.month, od.day)
        if ck % 10 == 0 and odt >= cut:
            want.append((int(k), int(ck), "UPGRADED"))
        else:
            want.append((int(k), int(ck), seg[int(ck)]))
    want.sort()
    got = sorted(
        (r.o_orderkey, r.custkey, r.segment)
        for r in _run("orders_pit_segment", spark)
    )
    assert got == want


def _quantile_cont(xs, q):
    xs = sorted(xs)
    h = (len(xs) - 1) * q
    lo = math.floor(h)
    if lo + 1 >= len(xs):
        return float(xs[-1])
    return xs[lo] + (h - lo) * (xs[lo + 1] - xs[lo])


def test_rfm_segments_vs_pure_quintiles(spark, orders):
    """Per customer (recency, frequency, cents); quintile fences by a
    hand-rolled quantile_cont; codes 5−|>x| (recency reversed) and
    |>x|+1; segment rollup in exact integer cents."""
    maxd = max(od for *_x, od in orders)
    base = {}
    for k, ck, _st, pr, _pri, od in orders:
        r = base.setdefault(int(ck), [None, 0, 0])
        r[0] = od if r[0] is None or od > r[0] else r[0]
        r[1] += 1
        r[2] += int(_r(float(pr) * 100, 0))
    recs = {
        ck: ((maxd - last).days, freq, cents)
        for ck, (last, freq, cents) in base.items()
    }
    qs = [0.2, 0.4, 0.6, 0.8]
    rf = [_quantile_cont([r for r, _f, _m in recs.values()], q) for q in qs]
    ff = [_quantile_cont([f for _r2, f, _m in recs.values()], q) for q in qs]
    mf = [_quantile_cont([m for _r2, _f, m in recs.values()], q) for q in qs]
    segs: dict[str, list] = defaultdict(lambda: [0, 0, 0])
    for _ck, (rec, freq, cents) in recs.items():
        r_s = 5 - sum(1 for x in rf if rec > x)
        f_s = sum(1 for x in ff if freq > x) + 1
        m_s = sum(1 for x in mf if cents > x) + 1
        row = segs[f"{r_s}-{f_s}-{m_s}"]
        row[0] += 1
        row[1] += cents
        row[2] += rec
    got = {r.segment: r for r in _run("customer_rfm_segments", spark)}
    assert sorted(got) == sorted(segs)
    def _rq(num: int, den: int) -> float:
        # the entries round with the floor-device floor(|x|·100+0.5)/100
        # ON THE DOUBLE (operators.rounding.expr_round_half_up) — integer
        # cents generate true half-quanta whose IEEE representation can
        # sit a hair below .5, so the reference replicates the device
        # bit-for-bit rather than rounding the exact rational
        x = num / den
        mag = math.floor(abs(x) * 100.0 + 0.5) / 100.0
        return -mag if x < 0 else mag

    for seg, (n, cents, recd) in segs.items():
        r = got[seg]
        assert r.n_customers == n
        assert r.avg_monetary == pytest.approx(_rq(cents, 100 * n), abs=1e-9)
        assert r.avg_recency_d == pytest.approx(_rq(recd, n), abs=1e-9)


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"""select user_id, event_id, event_type, ts
            from '{SF_DIR}/events.parquet' order by user_id, ts, event_id"""
    ).fetchall()
    con.close()
    return rows


def test_rank_shift_vs_pure_leaderboard(spark, events):
    """Daily type leaderboards (count desc, type asc) and the
    day-over-day rank gain against the previous OBSERVED day (first day
    defaults to zero gain)."""
    daily: dict = defaultdict(lambda: defaultdict(int))
    for _u, _e, et, ts in events:
        daily[ts.date()][et] += 1
    want = []
    prev_rank: dict[str, int] = {}
    for day in sorted(daily):
        board = sorted(daily[day].items(), key=lambda kv: (-kv[1], kv[0]))
        for rk, (et, n) in enumerate(board, 1):
            gain = prev_rank.get(et, rk) - rk
            want.append((day.strftime("%Y-%m-%d"), et, n, rk, gain))
        for rk, (et, _n) in enumerate(board, 1):
            prev_rank[et] = rk
    got = [
        (r.day, r.event_type, r.n, r.rnk, r.rank_gain)
        for r in _run("daily_type_rank_shift", spark)
    ]
    assert sorted(got) == sorted(want)


def test_session_bounce_vs_pure_walk(spark, events):
    """Strict-gap 30-minute sessions; entry type = the first event in
    walk order; bounce ⟺ single-event session. Bounce rate re-derived;
    n_bounced ≤ n_sessions trivially asserted."""
    gap = timedelta(minutes=30)
    sess: dict[str, list[int]] = defaultdict(lambda: [0, 0])  # entry → [n, bounced]
    per_user: dict[int, list] = defaultdict(list)
    for uid, eid, et, ts in events:
        per_user[uid].append((ts, eid, et))
    for _uid, evs in per_user.items():
        cur_entry, cur_n, prev = None, 0, None
        for ts, _eid, et in evs:
            if prev is None or ts - prev > gap:
                if cur_entry is not None:
                    sess[cur_entry][0] += 1
                    sess[cur_entry][1] += cur_n == 1
                cur_entry, cur_n = et, 0
            cur_n += 1
            prev = ts
        sess[cur_entry][0] += 1
        sess[cur_entry][1] += cur_n == 1
    got = {r.entry_type: r for r in _run("event_session_bounce", spark)}
    assert sorted(got) == sorted(sess)
    for et, (n, bounced) in sess.items():
        r = got[et]
        assert (r.n_sessions, r.n_bounced) == (n, bounced)
        assert r.bounce_rate == pytest.approx(_r(bounced / n, 4), abs=1e-9)
        assert r.n_bounced <= r.n_sessions


def test_cohort_retention_vs_pure_week_walk(spark, events):
    """Monday-truncated weeks; cohort = each user's first active week;
    the (cohort, offset) matrix counts distinct active user-weeks. Plus
    the diagonal identity: offset-0 actives equal the cohort size."""
    user_weeks: dict[int, set] = defaultdict(set)
    for uid, _e, _t, ts in events:
        wk = ts.date() - timedelta(days=ts.weekday())
        user_weeks[uid].add(wk)
    cells: dict[tuple, int] = defaultdict(int)
    cohort_size: dict = defaultdict(int)
    for _uid, wks in user_weeks.items():
        cohort = min(wks)
        cohort_size[cohort] += 1
        for wk in wks:
            cells[(cohort, (wk - cohort).days // 7)] += 1
    want = sorted(
        (c.strftime("%Y-%m-%d"), off, n) for (c, off), n in cells.items()
    )
    got = sorted(
        (r.cohort_week, r.week_offset, r.active_users)
        for r in _run("weekly_cohort_retention", spark)
    )
    assert got == want
    for c, size in cohort_size.items():
        assert cells[(c, 0)] == size

"""Third-implementation checks, batch 37 — the session/temporal
algorithm entries (round-11 verdict, next-round item 5): capped
sessionization (a genuinely sequential per-user fold), the sweep-line
concurrency peak, interval-overlap pairs, dense-spine linear
interpolation, lagged cross-correlation, and temporal BFS reach. The
Spark plans state these as windows/joins and the oracles as recursive
or unrolled CTEs; this walk states them as what they are — per-user
event folds, an explicit sweep over +1/−1 boundaries, nested interval
scans, hop-by-hop frontier expansion.
"""

from __future__ import annotations

import math
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
        f"select event_id, ts, user_id, event_type, value"
        f" from '{SF_DIR}/events.parquet' order by user_id, ts, event_id"
    ).fetchall()
    con.close()
    return rows


def _sessionize(rows, gap_minutes=30):
    """Per-user gap sessionization → list of (user_id, start, end)."""
    by_user = defaultdict(list)
    for _eid, ts, uid, _et, _v in rows:
        by_user[uid].append(ts)
    sessions = []
    for uid, tss in by_user.items():
        tss.sort()
        start = prev = tss[0]
        for t in tss[1:]:
            if (t - prev) > timedelta(minutes=gap_minutes):
                sessions.append((uid, start, prev))
                start = t
            prev = t
        sessions.append((uid, start, prev))
    return sessions


# --------------------------------------------------------------------------
# user_sessions_capped — gap OR span-cap break, sequential per-user fold
# --------------------------------------------------------------------------

_SESS_GAP, _SESS_CAP, _SESS_MAXE = 30_000, 86_400, 500


def test_capped_sessions_vs_sequential_fold(spark, events):
    by_user = defaultdict(list)
    for eid, ts, uid, _et, _v in events:
        by_user[uid].append((ts, eid))
    expected = []
    for uid in sorted(by_user):
        evs = sorted(by_user[uid])[:_SESS_MAXE]
        start = last = int(math.floor(evs[0][0].timestamp()))
        ns, ngap, ncap = 1, 0, 0
        for ts, _eid in evs[1:]:
            t = int(math.floor(ts.timestamp()))
            gap_brk = (t - last) > _SESS_GAP
            cap_brk = not gap_brk and (t - start) > _SESS_CAP
            if gap_brk or cap_brk:
                ns += 1
                start = t
            ngap += gap_brk
            ncap += cap_brk
            last = t
        expected.append((uid, len(evs), ns, ngap, ncap))

    got = [
        (r.user, r.n_events, r.n_sessions, r.n_gap_breaks, r.n_cap_breaks)
        for r in _run("user_sessions_capped", spark)
    ]
    assert got == expected


# --------------------------------------------------------------------------
# peak_concurrent_sessions — explicit sweep over +1/−1 boundaries
# --------------------------------------------------------------------------


def test_peak_concurrency_vs_boundary_sweep(spark, events):
    sessions = _sessionize(events)
    bounds = [(st, 1) for _u, st, _en in sessions] + [
        (en, -1) for _u, _st, en in sessions
    ]
    # starts before ends at equal ts; tied (ts, delta) groups are atomic
    bounds.sort(key=lambda b: (b[0], -b[1]))
    conc_rows, cum, i = [], 0, 0
    while i < len(bounds):
        j = i
        while j < len(bounds) and bounds[j][:2] == bounds[i][:2]:
            j += 1
        cum += sum(d for _t, d in bounds[i:j])
        conc_rows.extend((t, cum) for t, _d in bounds[i:j])
        i = j
    peak = max(c for _t, c in conc_rows)
    peak_ts = min(t for t, c in conc_rows if c == peak)

    [row] = _run("peak_concurrent_sessions", spark)
    assert (row.n_sessions, row.peak_concurrent, row.peak_ts) == (
        len(sessions),
        peak,
        peak_ts.strftime(_FMT),
    )


# --------------------------------------------------------------------------
# session_overlap_pairs — padded-interval overlap scan on sampled users
# --------------------------------------------------------------------------


def test_session_overlaps_vs_interval_scan(spark, events):
    sampled = [r for r in events if r[2] % 5 < 2]
    ivs = []
    for uid, st, en in _sessionize(sampled):
        ivs.append((None, uid, st, en + timedelta(minutes=5)))
    # interval_id = user_id * 100000 + seq (seq restarts at 1 per user)
    per_user = defaultdict(list)
    for _x, uid, st, en in ivs:
        per_user[uid].append((st, en))
    labelled = []
    for uid, spans in per_user.items():
        for seq, (st, en) in enumerate(sorted(spans), start=1):
            labelled.append((uid * 100000 + seq, st, en))
    labelled.sort()
    expected = []
    for x, (ia, sa, ea) in enumerate(labelled):
        for ib, sb, eb in labelled[x + 1 :]:
            if sa < eb and sb < ea:
                expected.append(
                    (
                        ia,
                        ib,
                        max(sa, sb).strftime(_FMT),
                        min(ea, eb).strftime(_FMT),
                    )
                )
    expected.sort()

    got = [
        (r.id_a, r.id_b, r.overlap_start, r.overlap_end)
        for r in _run("session_overlap_pairs", spark)
    ]
    assert got == expected


# --------------------------------------------------------------------------
# event_value_interpolated — dense spine, anchor scan, linear fill
# --------------------------------------------------------------------------


def _fr(x: float, dp: int) -> float:
    """Bit-exact mirror of operators.rounding.expr_round_half_up (floor
    arithmetic on doubles), which is NOT the Decimal-repr rounding `_r`
    uses — they diverge at representation boundaries."""
    scale = 10.0**dp
    mag = math.floor(abs(x) * scale + 0.5) / scale
    return -mag if x < 0 else mag


def test_interpolation_vs_anchor_scan(spark, events):
    lo = min(r[1] for r in events).replace(minute=0, second=0, microsecond=0)
    hi = max(r[1] for r in events).replace(minute=0, second=0, microsecond=0)
    hours = []
    h = lo
    while h <= hi:
        hours.append(h)
        h += timedelta(hours=1)
    obs: dict = defaultdict(list)
    types = set()
    for _eid, ts, _uid, et, v in events:
        types.add(et)
        obs[(et, ts.replace(minute=0, second=0, microsecond=0))].append(float(v))
    expected = []
    for et in sorted(types):
        series = [
            (_fr(math.fsum(obs[(et, h)]) / len(obs[(et, h)]), 4)
             if (et, h) in obs else None)
            for h in hours
        ]
        for idx, h in enumerate(hours):
            v = series[idx]
            prev_i = next(
                (i for i in range(idx, -1, -1) if series[i] is not None), None
            )
            next_i = next(
                (i for i in range(idx, len(hours)) if series[i] is not None),
                None,
            )
            if v is not None:
                kind, filled = "observed", v
            elif prev_i is None and next_i is None:
                kind, filled = "empty", None
            elif prev_i is None:
                kind, filled = "bfill", series[next_i]
            elif next_i is None:
                kind, filled = "ffill", series[prev_i]
            else:
                kind = "interp"
                pv, nv = series[prev_i], series[next_i]
                pt = hours[prev_i].timestamp()
                nt = hours[next_i].timestamp()
                filled = pv + (nv - pv) * (
                    (h.timestamp() - pt) / (nt - pt)
                )
            expected.append(
                (
                    et,
                    h.strftime(_FMT),
                    None if filled is None else _fr(filled, 4),
                    kind,
                )
            )

    got = [
        (r.event_type, r.hour_start, r.v_filled, r.fill_kind)
        for r in _run("event_value_interpolated", spark)
    ]
    assert got == expected


# --------------------------------------------------------------------------
# view_click_crosscorr — lagged Pearson over the dense hourly grid
# --------------------------------------------------------------------------


def test_crosscorr_vs_lagged_pearson(spark, events):
    lo = min(r[1] for r in events).replace(minute=0, second=0, microsecond=0)
    hi = max(r[1] for r in events).replace(minute=0, second=0, microsecond=0)
    hours = []
    h = lo
    while h <= hi:
        hours.append(h)
        h += timedelta(hours=1)
    vc: dict = defaultdict(int)
    cc: dict = defaultdict(int)
    for _eid, ts, _uid, et, _v in events:
        hh = ts.replace(minute=0, second=0, microsecond=0)
        if et == "view":
            vc[hh] += 1
        elif et == "click":
            cc[hh] += 1
    x = [float(vc[h]) for h in hours]
    y = [float(cc[h]) for h in hours]

    def pearson(a, b):
        n = len(a)
        ma, mb = math.fsum(a) / n, math.fsum(b) / n
        cov = math.fsum((u - ma) * (v - mb) for u, v in zip(a, b))
        sa = math.sqrt(math.fsum((u - ma) ** 2 for u in a))
        sb = math.sqrt(math.fsum((v - mb) ** 2 for v in b))
        return cov / (sa * sb)

    expected = []
    for lag in range(4):
        xs = x[: len(x) - lag] if lag else x
        ys = y[lag:]
        expected.append((lag, len(ys), _r(pearson(xs, ys), 4)))

    got = [(r.lag, r.n_pairs, r.ccf) for r in _run("view_click_crosscorr", spark)]
    assert got == expected


# --------------------------------------------------------------------------
# entity_reach_temporal — hop-by-hop time-respecting frontier expansion
# --------------------------------------------------------------------------

_TR_SEEDS = 25
_TR_T0 = "1996-06-01"


def test_temporal_reach_vs_frontier_walk(spark):
    con = duckdb.connect()
    pairs = con.execute(
        f"""select distinct 'c' || o_custkey, 's' || l_suppkey, o_orderdate
            from '{SF_DIR}/lineitem.parquet' l
            join '{SF_DIR}/orders.parquet' o on l_orderkey = o_orderkey"""
    ).fetchall()
    custkeys = [
        r[0]
        for r in con.execute(
            f"select c_custkey from '{SF_DIR}/customer.parquet'"
            f" where c_custkey <= {_TR_SEEDS}"
        ).fetchall()
    ]
    con.close()
    from datetime import datetime

    adj = defaultdict(list)  # undirected temporal edges
    for a, b, ts in pairs:
        adj[a].append((b, ts))
        adj[b].append((a, ts))
    t0 = datetime.strptime(_TR_T0, "%Y-%m-%d")
    hops = [{f"c{k}": t0 for k in custkeys}]
    seen = set(hops[0])
    for _hop in range(1, 4):
        frontier: dict = {}
        for src, arr in hops[-1].items():
            for dst, ts in adj.get(src, ()):
                if dst in seen or ts < arr:
                    continue
                if dst not in frontier or ts < frontier[dst]:
                    frontier[dst] = ts
        hops.append(frontier)
        seen |= set(frontier)
    expected = []
    for hop, nodes in enumerate(hops):
        for node in sorted(nodes):
            expected.append((node, hop, nodes[node].strftime("%Y-%m-%d")))
    expected.sort(key=lambda r: (r[1], r[0]))

    got = [
        (r.node, r.hop, r.arrival)
        for r in _run("entity_reach_temporal", spark)
    ]
    assert got == expected

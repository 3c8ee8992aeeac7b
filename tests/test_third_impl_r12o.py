"""Third-implementation checks, batch 47 — streaming operator semantics
as imperative walks: the watermark-bounded stream-stream inner join as
a per-user interval scan, both sessionizer finalization rules (emit all
but the trailing open session vs global-watermark closure), tumbling
hourly aggregation, streaming exact dedup as a set, the complete-mode
leaderboard, and the left-outer stream join's null-emission rule (a row
outputs either on match or when its window provably expired).
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
        f"select event_id, ts, user_id, event_type, value"
        f" from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def _sessions(events, gap_minutes=30):
    """user -> ordered [(start, end, n_events)] under gap sessionization."""
    by_user: dict = defaultdict(list)
    for _eid, ts, uid, _et, _v in events:
        by_user[uid].append(ts)
    out: dict = {}
    for uid, tss in by_user.items():
        tss.sort()
        sess, start, prev, n = [], tss[0], tss[0], 1
        for t in tss[1:]:
            if (t - prev) > timedelta(minutes=gap_minutes):
                sess.append((start, prev, n))
                start, n = t, 0
            prev = t
            n += 1
        sess.append((start, prev, n))
        out[uid] = sess
    return out


def test_stream_inner_join_vs_interval_scan(spark, events):
    views: dict = defaultdict(list)
    clicks: dict = defaultdict(list)
    for eid, ts, uid, et, _v in events:
        if et == "view":
            views[uid].append((eid, ts))
        elif et == "click":
            clicks[uid].append((eid, ts))
    expected = []
    for uid, cs in clicks.items():
        for cid, cts in cs:
            for vid, vts in views.get(uid, ()):
                if cts - timedelta(minutes=30) <= vts <= cts:
                    expected.append((cid, vid, uid, cts.strftime(_FMT)))
    expected.sort()

    got = [
        (r.click_id, r.view_id, r.user_id, r.click_ts)
        for r in _run("click_view_pairs_stream", spark)
    ]
    assert got == expected


def test_stateful_sessionizer_vs_all_but_trailing(spark, events):
    expected = []
    for uid, sess in _sessions(events).items():
        for start, end, n in sess[:-1]:  # the trailing open session is held
            expected.append(
                (uid, start.strftime(_FMT), end.strftime(_FMT), n)
            )
    expected.sort()

    got = [
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in _run("closed_sessions_stream", spark)
    ]
    assert got == expected


def test_native_sessionizer_vs_watermark_closure(spark, events):
    final_wm = max(r[1] for r in events)
    expected = []
    for uid, sess in _sessions(events).items():
        for start, end, n in sess:
            # native finalization: closed iff end + gap <= final watermark
            if end + timedelta(minutes=30) <= final_wm:
                expected.append(
                    (uid, start.strftime(_FMT), end.strftime(_FMT), n)
                )
    expected.sort()

    got = [
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in _run("closed_sessions_stream_native", spark)
    ]
    assert got == expected
    # the two finalization rules really differ: the stateful operator
    # withholds trailing sessions the watermark rule may close
    other = {
        (r.user_id, r.session_start)
        for r in _run("closed_sessions_stream", spark)
    }
    assert {(u, s) for u, s, _e, _n in expected} >= other


def test_tumbling_hourly_stream_vs_dict_fold(spark, events):
    agg: dict = defaultdict(lambda: [0, 0.0])
    for _eid, ts, _uid, et, v in events:
        key = (ts.replace(minute=0, second=0, microsecond=0), et)
        agg[key][0] += 1
        agg[key][1] += float(v)
    expected = [
        (h.strftime(_FMT), et, n, _r(s, 2))
        for (h, et), (n, s) in sorted(agg.items())
    ]

    got = [
        (r.hour_start, r.event_type, r.event_count, r.value_sum)
        for r in _run("hourly_event_counts_stream", spark)
    ]
    assert got == expected


def test_stream_dedup_vs_set(spark, events):
    expected = sorted({(uid, et) for _e, _t, uid, et, _v in events})
    got = [
        (r.user_id, r.event_type)
        for r in _run("distinct_user_event_types_stream", spark)
    ]
    assert got == expected


def test_complete_mode_leaderboard_vs_ranked_fold(spark, events):
    acc: dict = defaultdict(lambda: [0, 0.0])
    for _eid, _ts, uid, _et, v in events:
        acc[uid][0] += 1
        acc[uid][1] += float(v)
    ranked = sorted(
        ((uid, n, _r(s, 2)) for uid, (n, s) in acc.items()),
        key=lambda r: (-r[2], r[0]),
    )[:5]

    got = [
        (r.user_id, r.n_events, r.value_sum)
        for r in _run("top_users_stream", spark)
    ]
    assert got == ranked


def test_stream_left_outer_vs_expiry_rule(spark, events):
    views: dict = defaultdict(list)
    clicks: dict = defaultdict(list)
    for eid, ts, uid, et, _v in events:
        if et == "view":
            views[uid].append((eid, ts))
        elif et == "click":
            clicks[uid].append((eid, ts))
    wm = min(
        max(ts for vs in views.values() for _e, ts in vs),
        max(ts for cs in clicks.values() for _e, ts in cs),
    )
    expected = []
    for uid, vs in views.items():
        for vid, vts in vs:
            matched = False
            for cid, cts in clicks.get(uid, ()):
                if vts <= cts <= vts + timedelta(minutes=30):
                    expected.append((vid, cid, uid, vts.strftime(_FMT)))
                    matched = True
            # null row emits ONLY once the join window provably expired
            if not matched and vts + timedelta(minutes=30) < wm:
                expected.append((vid, None, uid, vts.strftime(_FMT)))
    expected.sort(key=lambda r: (r[0], r[1] is None, r[1]))

    got = [
        (r.view_id, r.click_id, r.user_id, r.view_ts)
        for r in _run("view_click_left_outer_stream", spark)
    ]
    assert sorted(got, key=lambda r: (r[0], r[1] is None, r[1])) == expected

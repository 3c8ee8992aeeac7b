"""Third-implementation checks, batch 43 — multidimensional grouping and
engine devices: the bloom bitmap REBUILT bit by bit (word/mask walk,
plus the no-false-negative device property), the second-digit Benford
screen with expectations DERIVED from the law (not copied literals),
CUBE expanded by hand into its four grouping combinations, explicit
GROUPING SETS into its three, the pivot→unpivot round trip against the
direct long aggregate, and the grouped-agg pandas UDAF against a plain
weighted-mean fold.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

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
def orders():
    con = duckdb.connect()
    rows = con.execute(
        f"select o_orderkey, o_custkey, o_orderstatus, o_totalprice,"
        f" o_orderdate, o_orderpriority from '{SF_DIR}/orders.parquet'"
    ).fetchall()
    con.close()
    return rows


# --------------------------------------------------------------------------
# orders_bloom_semi_join — rebuild the 4096-bit bitmap, prove the device
# --------------------------------------------------------------------------

_BLOOM_BITS = 4096


def test_bloom_semi_join_vs_bitmap_walk(spark, orders):
    con = duckdb.connect()
    keys = [
        int(r[0])
        for r in con.execute(
            f"select c_custkey from '{SF_DIR}/customer.parquet'"
            f" where c_mktsegment = 'BUILDING'"
        ).fetchall()
    ]
    con.close()
    words = [0] * (_BLOOM_BITS // 64)
    build = set(keys)
    for k in keys:
        pos = int(_md5(str(k))[:12], 16) % _BLOOM_BITS
        words[pos // 64] |= 1 << (pos % 64)

    agg: dict = defaultdict(lambda: [0, 0])
    for _ok, ck, _st, price, _dt, prio in orders:
        pos = int(_md5(str(ck))[:12], 16) % _BLOOM_BITS
        passes_filter = bool(words[pos // 64] & (1 << (pos % 64)))
        is_match = ck in build
        # the device property: the bitmap admits NO false negatives
        assert passes_filter or not is_match
        if passes_filter and is_match:
            agg[prio][0] += 1
            agg[prio][1] += int(_r(float(price) * 100, 0))
    expected = [(p, n, c) for p, (n, c) in sorted(agg.items())]

    got = [
        (r.o_orderpriority, r.n_orders, r.cents)
        for r in _run("orders_bloom_semi_join", spark)
    ]
    assert got == expected


# --------------------------------------------------------------------------
# lineitem_benford_second_digit — expectations derived from the law itself
# --------------------------------------------------------------------------


def test_benford_second_digit_vs_derived_law(spark):
    con = duckdb.connect()
    prices = [
        float(r[0])
        for r in con.execute(
            f"select l_extendedprice from '{SF_DIR}/lineitem.parquet'"
        ).fetchall()
    ]
    con.close()
    # P(d2 = d) = sum over first digits d1 of log10(1 + 1/(10*d1 + d)) —
    # derived here, NOT copied from the entry's literals
    exp = {
        d: math.fsum(math.log10(1 + 1 / (10 * d1 + d)) for d1 in range(1, 10))
        for d in range(10)
    }
    obs: dict = defaultdict(int)
    for p in prices:
        cents = int(math.floor(p * 100))
        if cents >= 10:
            obs[int(str(cents)[1])] += 1
    total = float(sum(obs.values()))
    expected = [
        (
            d,
            n,
            _r(n / total, 6),
            _r(exp[d], 6),
            _r((n - total * exp[d]) ** 2 / (total * exp[d]), 4),
        )
        for d, n in sorted(obs.items())
    ]

    got = [
        (r.digit, r.n_obs, r.obs_freq, r.exp_freq, r.chi2_term)
        for r in _run("lineitem_benford_second_digit", spark)
    ]
    assert got == expected
    # the derived expectation really is a distribution
    assert abs(math.fsum(exp.values()) - 1.0) < 1e-12


# --------------------------------------------------------------------------
# order_status_cube / status_month_grouping_sets — hand-expanded sets
# --------------------------------------------------------------------------


def test_cube_vs_hand_expanded_combinations(spark, orders):
    combos = [(True, True), (True, False), (False, True), (False, False)]
    agg: dict = defaultdict(lambda: [0, set(), 0.0])
    for _ok, ck, st, price, _dt, prio in orders:
        for use_s, use_p in combos:
            key = (st if use_s else "ALL", prio if use_p else "ALL")
            agg[key][0] += 1
            agg[key][1].add(ck)
            agg[key][2] += float(price)
    expected = [
        (s, p, n, len(cs), _r(rev, 2))
        for (s, p), (n, cs, rev) in sorted(agg.items())
    ]

    got = [
        (r.status, r.priority, r.n_orders, r.n_customers, r.revenue)
        for r in _run("order_status_cube", spark)
    ]
    assert got == expected


def test_grouping_sets_vs_hand_expanded_sets(spark, orders):
    agg: dict = defaultdict(lambda: [0, 0.0])
    for _ok, _ck, st, price, dt, _prio in orders:
        month = dt.strftime("%Y-%m")
        for key in ((st, month), (st, "ALL"), ("ALL", "ALL")):
            agg[key][0] += 1
            agg[key][1] += float(price)
    expected = [
        (s, m, n, _r(rev, 2)) for (s, m), (n, rev) in sorted(agg.items())
    ]

    got = [
        (r.status, r.month, r.n_orders, r.revenue)
        for r in _run("status_month_grouping_sets", spark)
    ]
    assert got == expected
    # the set list deliberately EXCLUDES the month-only slice a cube
    # would add: no ('ALL', <month>) rows exist
    assert not [r for r in got if r[0] == "ALL" and r[1] != "ALL"]


# --------------------------------------------------------------------------
# user_event_type_unpivot — melt(pivot(x)) = x against the direct aggregate
# --------------------------------------------------------------------------


def test_unpivot_round_trip_vs_direct_aggregate(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select user_id, event_type from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    types = sorted({et for _u, et in rows})
    agg: dict = defaultdict(int)
    for u, et in rows:
        agg[(u, et)] += 1
    expected = [(u, et, n) for (u, et), n in sorted(agg.items())]

    got = [
        (r.user_id, r.event_type, r.n_events)
        for r in _run("user_event_type_unpivot", spark)
    ]
    assert got == expected
    assert {et for _u, et, _n in got} <= set(types)


# --------------------------------------------------------------------------
# customer_weighted_price_udaf — plain weighted-mean fold
# --------------------------------------------------------------------------


def test_weighted_udaf_vs_plain_fold(spark, orders):
    acc: dict = defaultdict(lambda: [0.0, 0.0])
    for ok, ck, _st, price, _dt, _prio in orders:
        if ck % 16 == 0:
            w = float(7 - ok % 7)
            acc[ck][0] += float(price) * w
            acc[ck][1] += w
    expected = [
        (ck, _r(num / den, 2)) for ck, (num, den) in sorted(acc.items())
    ][:100]

    got = [
        (r.o_custkey, r.weighted_avg_price)
        for r in _run("customer_weighted_price_udaf", spark)
    ]
    assert got == expected

"""Third-implementation checks, batch 31 — the incremental-view-
maintenance family and relational set algebra: the signed-delta
aggregate view, the bilinear join-view delta rule, the rollup
restatement diff, set INTERSECT/EXCEPT with multiset-vs-set semantics,
the degree-gap argmax, and per-user z anomalies. Each reference is a
plain dict/set walk that re-proves the maintenance identity the entry's
plan relies on.
"""

from __future__ import annotations

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


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def orders():
    con = duckdb.connect()
    rows = con.execute(
        f"""select o_orderkey, o_custkey, o_totalprice, o_orderpriority,
                   o_orderstatus from '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    con.close()
    return [(int(k), int(c), float(p), pr, st) for k, c, p, pr, st in rows]


def test_aggregate_view_ivm_vs_pure_signed_deltas(spark, orders):
    """The IVM identity walked both ways: (a) full recompute over the
    upserted table, (b) base partials ⊎ (−1)·old-at-delta-keys ⊎
    (+1)·new — the two folds must agree exactly, and the entry must
    equal both."""
    con = duckdb.connect()
    nat = {
        int(ck): nm
        for ck, nm in con.execute(
            f"""select c_custkey, n_name
                from '{SF_DIR}/customer.parquet' c
                join '{SF_DIR}/nation.parquet' n
                  on n.n_nationkey = c.c_nationkey"""
        ).fetchall()
    }
    con.close()
    full: dict[str, list] = defaultdict(lambda: [0.0, 0])
    signed: dict[str, list] = defaultdict(lambda: [0.0, 0])
    for k, ck, p, _pr, _st in orders:
        nation = nat[ck]
        upserted = p + 1000 if k % 10 == 0 else p
        full[nation][0] += upserted
        full[nation][1] += 1
        # signed-delta path
        signed[nation][0] += p
        signed[nation][1] += 1
        if k % 10 == 0:
            signed[nation][0] += -p + (p + 1000)
    for nation in full:
        assert full[nation][1] == signed[nation][1]
        assert full[nation][0] == pytest.approx(signed[nation][0], rel=1e-12)
    got = {r.nation: (r.revenue, r.n_orders) for r in _run("nation_revenue_view_ivm", spark)}
    assert sorted(got) == sorted(full)
    for nation, (rev, n) in full.items():
        assert got[nation][1] == n
        assert got[nation][0] == pytest.approx(_r(rev, 2), abs=2e-2)


def test_join_view_ivm_vs_pure_delta_rule(spark, orders):
    """ΔV = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB re-proved on row multisets: the
    four-way decomposition's union must equal the full join exactly
    (disjointness asserted), and the entry equals both."""
    con = duckdb.connect()
    li = [
        (int(ok), int(ln), float(ep))
        for ok, ln, ep in con.execute(
            f"""select l_orderkey, l_linenumber, l_extendedprice
                from '{SF_DIR}/lineitem.parquet'"""
        ).fetchall()
    ]
    con.close()
    omap = {k: ck for k, ck, _p, _pr, _st in orders}
    full = sorted(
        (ok, ln, omap[ok], _r(ep, 2)) for ok, ln, ep in li if ok in omap
    )
    parts = []
    for ok, ln, ep in li:
        if ok not in omap:
            continue
        a_delta = ok % 9 == 0
        b_delta = ok % 7 == 0
        quadrant = (a_delta, b_delta)
        parts.append((quadrant, (ok, ln, omap[ok], _r(ep, 2))))
    # the four quadrants partition the full join (disjoint + exhaustive)
    assert sorted(row for _q, row in parts) == full
    got = sorted(
        (r.o_orderkey, r.l_linenumber, r.o_custkey, r.price)
        for r in _run("orders_lineitem_join_ivm", spark)
    )
    assert got == full


def test_rollup_restatement_vs_pure_merge(spark, orders):
    """Stored rollup (keys %11 != 0) vs restated (merge with the late
    slice, rounded-parts arithmetic); changed groups = count or rounded
    revenue differs; 'added' iff a group exists only in the late
    slice."""
    base: dict[str, list] = defaultdict(lambda: [0, 0.0])
    late: dict[str, list] = defaultdict(lambda: [0, 0.0])
    for k, _c, p, pr, _st in orders:
        (late if k % 11 == 0 else base)[pr][0] += 1
        (late if k % 11 == 0 else base)[pr][1] += p
    want = {}
    groups = set(base) | set(late)
    for g in groups:
        bn, brv = base.get(g, [0, 0.0])
        ln_, lrv = late.get(g, [0, 0.0])
        fn = bn + ln_
        frv = _r(_r(brv, 2) + _r(lrv, 2), 2)
        if g not in base:
            want[g] = "added"
        elif bn != fn or _r(brv, 2) != frv:
            want[g] = "changed"
    got = {r.o_orderpriority: r.change_type for r in _run("rollup_restatement_diff", spark)}
    assert got == want


def test_segment_set_ops_vs_pure_sets(spark, orders):
    """INTERSECT/EXCEPT walked with Python sets (both operators are
    SET-semantic — duplicates collapse), membership re-derived from the
    three predicates."""
    con = duckdb.connect()
    building = {
        int(k)
        for (k,) in con.execute(
            f"""select c_custkey from '{SF_DIR}/customer.parquet'
                where c_mktsegment = 'BUILDING'"""
        ).fetchall()
    }
    con.close()
    big = {c for _k, c, p, _pr, _st in orders if p > 150000}
    finished_big = {
        c for _k, c, p, _pr, st in orders if st == "F" and p > 400000
    }
    want = sorted((building & big) - finished_big)
    got = [r.c_custkey for r in _run("segment_set_ops", spark)]
    assert got == want


def test_click_view_gap_vs_pure_degree_argmax(spark):
    """Per-user click/view degree counts, inner-join semantics (users
    with both), top-5 by (gap desc, user asc)."""
    con = duckdb.connect()
    rows = con.execute(
        f"""select user_id, event_type, count(*)
            from '{SF_DIR}/events.parquet'
            where event_type in ('click', 'view') group by 1, 2"""
    ).fetchall()
    con.close()
    deg: dict[int, dict[str, int]] = defaultdict(dict)
    for u, et, c in rows:
        deg[int(u)][et] = c
    cands = [
        (u, d["click"], d["view"], abs(d["click"] - d["view"]))
        for u, d in deg.items()
        if "click" in d and "view" in d
    ]
    cands.sort(key=lambda t: (-t[3], t[0]))
    want = cands[:5]
    got = [
        (r.user_id, r.click_count, r.view_count, r.gap)
        for r in _run("user_click_view_gap", spark)
    ]
    assert got == want


def test_value_anomalies_vs_pure_zscores(spark):
    """Per-user sample mean/std; flag |z| > 3 where n ≥ 10 and sd > 0;
    z at 2dp. Every flagged row re-checked against the definition."""
    con = duckdb.connect()
    rows = con.execute(
        f"select user_id, event_id, value from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    per: dict[int, list] = defaultdict(list)
    for u, e, v in rows:
        per[int(u)].append((int(e), float(v)))
    want = {}
    for u, evs in per.items():
        n = len(evs)
        if n < 10:
            continue
        mu = math.fsum(v for _e, v in evs) / n
        sd = math.sqrt(math.fsum((v - mu) ** 2 for _e, v in evs) / (n - 1))
        if sd <= 0:
            continue
        for e, v in evs:
            z = (v - mu) / sd
            if abs(z) > 3:
                want[e] = (u, _r(z, 2))
    got = {r.event_id: (r.user_id, r.z) for r in _run("event_value_anomalies", spark)}
    assert sorted(got) == sorted(want)
    for e, (u, z) in want.items():
        assert got[e][0] == u
        assert got[e][1] == pytest.approx(z, abs=2e-2)
        assert abs(got[e][1]) > 2.9

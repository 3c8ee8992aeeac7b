"""Third-implementation checks, batch 46 — window builtins and the join
surface: hopping-window replication stated as a 2-offset loop, the full
window-builtin family (first/last/nth value, percent_rank, cume_dist,
ntile) computed from first principles over sorted per-customer
histories, per-group z-scores, the global argmax, the left-enrich with
coalesce fallback, and the anti-join as a set difference.
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


def test_hopping_windows_vs_offset_loop(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select ts, event_type from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    agg: dict = defaultdict(int)
    for ts, et in rows:
        hour = ts.replace(minute=0, second=0, microsecond=0)
        # a 2h window hopping by 1h: the event belongs to the windows
        # starting at its hour and the hour before
        for off in (0, 1):
            agg[((hour - timedelta(hours=off)).strftime(_FMT), et)] += 1
    expected = [(w, et, n) for (w, et), n in sorted(agg.items())]

    got = [
        (r.window_start, r.event_type, r.event_count)
        for r in _run("hopping_event_counts", spark)
    ]
    assert got == expected


_WB_MOD = 17


def test_window_builtins_vs_first_principles(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""select o_custkey, o_orderkey, o_orderdate
            from '{SF_DIR}/orders.parquet' where o_custkey % {_WB_MOD} = 0"""
    ).fetchall()
    con.close()
    by_cust: dict = defaultdict(list)
    for ck, ok, dt in rows:
        by_cust[ck].append((dt, ok))
    expected = []
    for ck in sorted(by_cust):
        hist = sorted(by_cust[ck])
        n = len(hist)
        oks = [ok for _dt, ok in hist]
        for idx, (_dt, ok) in enumerate(hist):
            rank = idx + 1  # fully tiebroken ordering: rank == row_number
            pr = 0.0 if n == 1 else (rank - 1) / (n - 1)
            cd = rank / n
            # ntile(4): first (n mod 4) tiles get ceil(n/4) rows
            big, rem = n // 4, n % 4
            boundary = rem * (big + 1)
            quartile = (
                idx // (big + 1) + 1
                if idx < boundary
                else rem + (idx - boundary) // big + 1
                if big
                else idx + 1
            )
            expected.append(
                (
                    ck,
                    ok,
                    oks[0],
                    oks[-1],
                    oks[1] if n >= 2 else None,
                    _r(pr, 8),
                    _r(cd, 8),
                    quartile,
                )
            )
    expected.sort()

    got = sorted(
        (r.o_custkey, r.o_orderkey, r.first_ok, r.last_ok, r.second_ok,
         r.pr, r.cd, r.quartile)
        for r in _run("orders_window_builtins", spark)
    )
    assert got == expected


def test_zscore_vs_population_moments(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select event_id, event_type, value from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    by_type: dict = defaultdict(list)
    for _eid, et, v in rows:
        by_type[et].append(float(v))
    mu = {et: math.fsum(vs) / len(vs) for et, vs in by_type.items()}
    sig = {
        et: math.sqrt(math.fsum((v - mu[et]) ** 2 for v in vs) / len(vs))
        for et, vs in by_type.items()
    }
    expected = [
        (eid, et, _r((float(v) - mu[et]) / sig[et], 4))
        for eid, et, v in sorted(rows)
    ]

    got = [
        (r.event_id, r.event_type, r.z) for r in _run("event_value_zscore", spark)
    ]
    assert got == expected


def test_global_argmax_vs_linear_scan(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""select o_orderkey, o_custkey, o_totalprice, o_orderpriority
            from '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    con.close()
    best = min(rows, key=lambda r: (-float(r[2]), r[0]))

    [row] = _run("most_valuable_order", spark)
    assert (row.o_orderkey, row.o_custkey, row.o_totalprice,
            row.o_orderpriority) == best


def test_left_enrich_vs_dict_lookup(spark):
    con = duckdb.connect()
    sups = con.execute(
        f"select s_suppkey, s_name, s_nationkey from '{SF_DIR}/supplier.parquet'"
    ).fetchall()
    nations = {
        nk: (name, rk)
        for nk, name, rk in con.execute(
            f"select n_nationkey, n_name, n_regionkey from '{SF_DIR}/nation.parquet'"
        ).fetchall()
    }
    regions = dict(
        con.execute(
            f"select r_regionkey, r_name from '{SF_DIR}/region.parquet'"
        ).fetchall()
    )
    con.close()
    expected = []
    for sk, sname, nk in sorted(sups):
        nname, rk = nations.get(nk, (None, None))
        expected.append((sk, sname, nname, regions.get(rk, "Unknown")))

    got = [
        (r.s_suppkey, r.s_name, r.nation_name, r.region_name)
        for r in _run("supplier_nation_enrich", spark)
    ]
    assert got == expected


def test_anti_join_vs_set_difference(spark):
    con = duckdb.connect()
    custs = con.execute(
        f"select c_custkey, c_name from '{SF_DIR}/customer.parquet'"
    ).fetchall()
    with_orders = {
        r[0]
        for r in con.execute(
            f"select distinct o_custkey from '{SF_DIR}/orders.parquet'"
        ).fetchall()
    }
    con.close()
    expected = sorted((ck, nm) for ck, nm in custs if ck not in with_orders)

    got = [
        (r.c_custkey, r.c_name) for r in _run("customers_without_orders", spark)
    ]
    assert got == expected

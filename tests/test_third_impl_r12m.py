"""Third-implementation checks, batch 45 — retrieval scoring, robust
statistics, and the relational core: Okapi BM25 with the formula
restated term by term, median/MAD robust z-scores with explicit
continuous medians, ROLLUP hand-expanded into its three levels, the
flagship TPC-H-Q1-shaped pricing summary as one dict fold, per-customer
running totals as ordered prefix sums, and the haversine column
expression re-derived with plain math.
"""

from __future__ import annotations

import math
import re
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


# --------------------------------------------------------------------------
# doc_bm25_query — the scoring formula restated term by term
# --------------------------------------------------------------------------

_BM25_TERMS = ("spark", "shuffle", "broadcast")
_K1, _B = 1.2, 0.75


def test_bm25_vs_formula_walk(spark):
    con = duckdb.connect()
    docs = {
        int(i): t
        for i, t in con.execute(
            f"select doc_id, text from '{SF_DIR}/documents.parquet'"
        ).fetchall()
    }
    con.close()
    toks = {i: re.split(r"\s+", t.strip()) for i, t in docs.items()}
    nn = len(docs)
    avgdl = math.fsum(len(ts) for ts in toks.values()) / nn
    ndocs = {
        q: sum(1 for ts in toks.values() if q in ts) for q in _BM25_TERMS
    }
    expected = []
    for i in sorted(docs):
        score = 0.0
        hit = False
        for q in _BM25_TERMS:
            tf = toks[i].count(q)
            if tf == 0:
                continue
            hit = True
            idf = math.log((nn - ndocs[q] + 0.5) / (ndocs[q] + 0.5) + 1.0)
            score += (
                idf
                * tf
                * (_K1 + 1.0)
                / (tf + _K1 * (1.0 - _B + _B * len(toks[i]) / avgdl))
            )
        if hit and _r(score, 4) > 0:
            expected.append((i, _r(score, 4)))

    got = [(r.doc_id, r.score) for r in _run("doc_bm25_query", spark)]
    assert got == expected
    # BM25 sanity the formula guarantees: every surviving score positive
    assert all(s > 0 for _i, s in expected)


# --------------------------------------------------------------------------
# event_value_mad_outliers — explicit continuous medians, robust z
# --------------------------------------------------------------------------

_MAD_SCALE, _MAD_THRESH = 1.4826, 2.0


def _median_cont(vals):
    vs = sorted(vals)
    h = 0.5 * (len(vs) - 1)
    lo = int(math.floor(h))
    if lo + 1 >= len(vs):
        return float(vs[-1])
    return vs[lo] + (h - lo) * (vs[lo + 1] - vs[lo])


def test_mad_outliers_vs_median_walk(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select event_id, event_type, value from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    by_type: dict = defaultdict(list)
    for eid, et, v in rows:
        by_type[et].append(float(v))
    med = {et: _median_cont(vs) for et, vs in by_type.items()}
    mad = {
        et: _median_cont([abs(v - med[et]) for v in vs])
        for et, vs in by_type.items()
    }
    expected = []
    for eid, et, v in sorted(rows):
        if mad[et] <= 0:
            continue
        z = (float(v) - med[et]) / (_MAD_SCALE * mad[et])
        if abs(z) > _MAD_THRESH:
            expected.append((eid, et, _r(z, 4)))

    got = [
        (r.event_id, r.event_type, r.robust_z)
        for r in _run("event_value_mad_outliers", spark)
    ]
    assert got == expected


# --------------------------------------------------------------------------
# region_nation_rollup — the three rollup levels by hand
# --------------------------------------------------------------------------


def test_rollup_vs_hand_expanded_levels(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""select r_name, n_name, c_acctbal
            from '{SF_DIR}/customer.parquet' c
            join '{SF_DIR}/nation.parquet' n on c_nationkey = n_nationkey
            join '{SF_DIR}/region.parquet' r on n_regionkey = r_regionkey"""
    ).fetchall()
    con.close()
    agg: dict = defaultdict(lambda: [0, 0.0])
    for rn, nn, bal in rows:
        for key in ((rn, nn), (rn, "ALL"), ("ALL", "ALL")):
            agg[key][0] += 1
            agg[key][1] += float(bal)
    expected = [
        (rn, nn, c, _r(s, 2)) for (rn, nn), (c, s) in sorted(agg.items())
    ]

    got = [
        (r.region_name, r.nation_name, r.customer_count, r.acctbal_sum)
        for r in _run("region_nation_rollup", spark)
    ]
    assert got == expected
    # rollup (not cube): no ('ALL', <nation>) slice
    assert not [g for g in got if g[0] == "ALL" and g[1] != "ALL"]


# --------------------------------------------------------------------------
# pricing_summary — the flagship Q1 shape as one dict fold
# --------------------------------------------------------------------------


def test_pricing_summary_vs_dict_fold(spark):
    from datetime import datetime

    con = duckdb.connect()
    rows = con.execute(
        f"""select l_returnflag, l_linestatus, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_shipdate
            from '{SF_DIR}/lineitem.parquet'"""
    ).fetchall()
    con.close()
    cut = datetime(1998, 9, 2)
    acc: dict = defaultdict(lambda: [0.0, 0.0, 0.0, 0.0, 0.0, 0])
    for rf, ls, qty, px, disc, tax, sd in rows:
        if sd > cut:
            continue
        a = acc[(rf, ls)]
        a[0] += float(qty)
        a[1] += float(px)
        a[2] += float(px) * (1 - float(disc))
        a[3] += float(px) * (1 - float(disc)) * (1 + float(tax))
        a[4] += float(disc)
        a[5] += 1
    expected = [
        (
            rf,
            ls,
            _r(q, 2),
            _r(bp, 2),
            _r(dp, 2),
            _r(ch, 2),
            _r(q / n, 2),
            _r(bp / n, 2),
            _r(d / n, 4),
            n,
        )
        for (rf, ls), (q, bp, dp, ch, d, n) in sorted(acc.items())
    ]

    got = [tuple(r) for r in _run("pricing_summary", spark)]
    assert got == expected


# --------------------------------------------------------------------------
# customer_running_total — ordered prefix sums per customer
# --------------------------------------------------------------------------


def test_running_total_vs_prefix_fold(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""select o_custkey, o_orderkey, o_orderdate, o_totalprice
            from '{SF_DIR}/orders.parquet' where o_custkey <= 100"""
    ).fetchall()
    con.close()
    by_cust: dict = defaultdict(list)
    for ck, ok, dt, p in rows:
        by_cust[ck].append((dt, ok, float(p)))
    expected = []
    for ck in sorted(by_cust):
        run = 0.0
        for _dt, ok, p in sorted(by_cust[ck]):
            run += p
            expected.append((ck, ok, _r(run, 2)))
    expected.sort()

    got = sorted(
        (r.o_custkey, r.o_orderkey, r.running_total)
        for r in _run("customer_running_total", spark)
    )
    assert got == expected


# --------------------------------------------------------------------------
# customer_haversine — the distance expression re-derived with plain math
# --------------------------------------------------------------------------


def test_haversine_vs_plain_math(spark):
    con = duckdb.connect()
    keys = [
        int(r[0])
        for r in con.execute(
            f"select c_custkey from '{SF_DIR}/customer.parquet'"
            f" where c_custkey <= 500"
        ).fetchall()
    ]
    con.close()
    expected = []
    for k in sorted(keys):
        lat1, lon1 = float(k % 100 - 50), float(k % 250 - 125)
        lat2, lon2 = float(k % 120 - 60), float(k % 300 - 150)
        d = (
            2
            * 6371
            * math.asin(
                math.sqrt(
                    math.sin((math.radians(lat2) - math.radians(lat1)) / 2)
                    ** 2
                    + math.cos(math.radians(lat1))
                    * math.cos(math.radians(lat2))
                    * math.sin((math.radians(lon2) - math.radians(lon1)) / 2)
                    ** 2
                )
            )
        )
        expected.append((k, _r(d, 2)))

    got = [(r.c_custkey, r.distance_km) for r in _run("customer_haversine", spark)]
    assert got == expected

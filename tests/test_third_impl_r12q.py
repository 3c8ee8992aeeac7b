"""Third-implementation checks, batch 49 — mining, layout strategies,
and profile aggregates: basket co-occurrence (support/confidence/lift
from basket sets), exact equi-depth deciles with interpolated
boundaries, the salted join against the PLAIN join fold (salt is
physical strategy only), the data-quality report's six constraints
evaluated imperatively, per-dimension embedding moments, and exact
content dedup over a corpus with constructed duplicates.
"""

from __future__ import annotations

import hashlib
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


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


def test_brand_cooccurrence_vs_basket_sets(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""select distinct l_orderkey, p_brand
            from '{SF_DIR}/lineitem.parquet' l
            join '{SF_DIR}/part.parquet' p on l_partkey = p_partkey"""
    ).fetchall()
    con.close()
    baskets: dict = defaultdict(set)
    brand_n: dict = defaultdict(int)
    for ok, brand in rows:
        baskets[ok].add(brand)
        brand_n[brand] += 1
    n_baskets = float(len(baskets))
    pair_n: dict = defaultdict(int)
    for items in baskets.values():
        its = sorted(items)
        for x, a in enumerate(its):
            for b in its[x + 1 :]:
                pair_n[(a, b)] += 1
    expected = [
        (
            a,
            b,
            n,
            _r(n / n_baskets, 6),
            _r(n / brand_n[a], 4),
            _r(n * n_baskets / (brand_n[a] * brand_n[b]), 4),
        )
        for (a, b), n in sorted(pair_n.items())
    ]

    got = [
        (r.brand_a, r.brand_b, r.n_both, r.support, r.conf_a_to_b, r.lift)
        for r in _run("part_brand_cooccurrence", spark)
    ]
    assert got == expected


def test_price_deciles_vs_interpolated_bounds(spark):
    con = duckdb.connect()
    prices = sorted(
        float(r[0])
        for r in con.execute(
            f"select o_totalprice from '{SF_DIR}/orders.parquet'"
        ).fetchall()
    )
    con.close()

    def qcont(p):
        h = p * (len(prices) - 1)
        lo = int(math.floor(h))
        if lo + 1 >= len(prices):
            return prices[-1]
        return prices[lo] + (h - lo) * (prices[lo + 1] - prices[lo])

    bounds = [qcont(i / 10) for i in range(1, 10)]
    agg: dict = defaultdict(lambda: [0, float("inf"), float("-inf"), 0.0])
    for p in prices:
        d = sum(1 for b in bounds if p > b) + 1
        a = agg[d]
        a[0] += 1
        a[1] = min(a[1], p)
        a[2] = max(a[2], p)
        a[3] += p
    expected = [
        (d, n, _r(lo, 2), _r(hi, 2), _r(tot, 2))
        for d, (n, lo, hi, tot) in sorted(agg.items())
    ]

    got = [
        (r.decile, r.n, r.lo, r.hi, r.total)
        for r in _run("order_price_deciles", spark)
    ]
    assert got == expected
    # equi-depth within interpolation slack: every decile holds ~n/10
    n = len(prices)
    assert all(abs(cnt - n / 10) <= n / 50 for _d, cnt, *_x in expected)


def test_salted_join_vs_plain_join_fold(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""select c_mktsegment, o_totalprice
            from '{SF_DIR}/orders.parquet' o
            join '{SF_DIR}/customer.parquet' c on o_custkey = c_custkey"""
    ).fetchall()
    con.close()
    agg: dict = defaultdict(lambda: [0, 0.0])
    for seg, p in rows:
        agg[seg][0] += 1
        agg[seg][1] += float(p)
    expected = [(s, n, _r(rev, 2)) for s, (n, rev) in sorted(agg.items())]

    got = [
        (r.c_mktsegment, r.n_orders, r.revenue)
        for r in _run("segment_revenue_salted_join", spark)
    ]
    assert got == expected


def test_quality_report_vs_constraint_walk(spark):
    from datetime import datetime

    con = duckdb.connect()
    rows = con.execute(
        f"""select o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate from '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    con.close()
    c = len(rows)
    d = len({r[0] for r in rows})
    nn = sum(1 for r in rows if r[1] is not None)
    pos = sum(1 for r in rows if float(r[3]) >= 0)
    dom = sum(1 for r in rows if r[2] in ("O", "F", "P"))
    lo, hi = datetime(1995, 1, 1), datetime(2002, 1, 1)
    dr = sum(1 for r in rows if lo <= r[4] < hi)
    expected = sorted(
        [
            ("row_count", _r(float(c), 2), c > 0),
            ("orderkey_unique", _r(d / c, 6), d == c),
            ("custkey_complete", _r(nn / c, 6), nn == c),
            ("totalprice_nonneg", _r(pos / c, 6), pos == c),
            ("status_in_domain", _r(dom / c, 6), dom == c),
            ("orderdate_in_range", _r(dr / c, 6), dr == c),
        ]
    )

    got = [
        (r.constraint_name, r.metric, r.passed)
        for r in _run("table_quality_report", spark)
    ]
    assert got == expected


def test_dim_stats_vs_moment_folds(spark):
    con = duckdb.connect()
    vecs = [
        [float(x) for x in r[0]]
        for r in con.execute(
            f"select embedding from '{SF_DIR}/embeddings.parquet'"
        ).fetchall()
    ]
    con.close()
    n = len(vecs)
    expected = []
    for d in range(64):
        xs = [v[d] for v in vecs]
        mu = math.fsum(xs) / n
        std = math.sqrt(math.fsum((x - mu) ** 2 for x in xs) / n)
        expected.append((d, _r(mu, 6), _r(std, 6)))

    got = [(r.dim, r.mean, r.std) for r in _run("embedding_dim_stats", spark)]
    assert got == expected


def test_exact_dedup_vs_fingerprint_dict(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"select doc_id, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    corpus = [(int(i), t) for i, t in docs] + [
        (int(i) + 100000, t) for i, t in docs
    ]
    groups: dict = defaultdict(list)
    for i, t in corpus:
        groups[_md5(re.sub(r"\s+", " ", t.strip().lower()))].append(i)
    expected = sorted((min(ids), len(ids)) for ids in groups.values())

    got = [(r.doc_id, r.dup_count) for r in _run("doc_exact_dedup", spark)]
    assert got == expected
    # every group contains the constructed shifted twin
    assert all(n >= 2 for _i, n in expected)

"""Third-implementation checks, batch 41 — spatial grid candidates,
composed dedup decisions, and the operational audits: the 120 km
proximity self-join and radius-bounded nearest neighbor walked with
plain-math haversine over ALL pairs (the recall yardstick for the 2°
grid), the keep/drop decision table composed from an exact-fingerprint
keep rule + union-find over the MinHash pair graph, the join-key skew
report with explicit continuous-quantile interpolation, and the GDPR
erasure dry-run from a last-seen dict.
"""

from __future__ import annotations

import hashlib
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


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


# --------------------------------------------------------------------------
# customer_geo_cell_pairs / customer_nearest_neighbor — all-pairs haversine
# --------------------------------------------------------------------------

_RADIUS_KM = 120.0


def _hav(lat1, lon1, lat2, lon2):
    r1, r2 = math.radians(lat1), math.radians(lat2)
    dlat = (r2 - r1) / 2
    dlon = (math.radians(lon2) - math.radians(lon1)) / 2
    return (
        2
        * 6371
        * math.asin(
            math.sqrt(
                math.sin(dlat) ** 2
                + math.cos(r1) * math.cos(r2) * math.sin(dlon) ** 2
            )
        )
    )


@pytest.fixture(scope="module")
def geo_points():
    con = duckdb.connect()
    keys = [
        int(r[0])
        for r in con.execute(
            f"select c_custkey from '{SF_DIR}/customer.parquet'"
        ).fetchall()
    ]
    con.close()
    pts = {}
    for k in keys:
        lat = int(_md5(f"lat-{k}")[:12], 16) % 900 / 10.0 - 45.0
        lon = int(_md5(f"lon-{k}")[:12], 16) % 600 / 10.0 - 30.0
        pts[k] = (lat, lon)
    return pts


def test_geo_cell_pairs_vs_all_pairs_haversine(spark, geo_points):
    ks = sorted(geo_points)
    expected = []
    for x, a in enumerate(ks):
        for b in ks[x + 1 :]:
            d = _hav(*geo_points[a], *geo_points[b])
            if d <= _RADIUS_KM:
                expected.append((a, b, _r(d, 2)))

    got = sorted(
        (r.id_a, r.id_b, r.distance_km)
        for r in _run("customer_geo_cell_pairs", spark)
    )
    assert got == expected


def test_nearest_neighbor_vs_all_pairs_argmin(spark, geo_points):
    ks = sorted(geo_points)
    expected = []
    for a in ks:
        best = None
        for b in ks:
            if b == a:
                continue
            d = _r(_hav(*geo_points[a], *geo_points[b]), 6)
            if d <= _RADIUS_KM and (best is None or (d, b) < best):
                best = (d, b)
        if best is not None:
            expected.append((a, best[1], _r(best[0], 2)))

    got = [
        (r.id, r.nn_id, r.nn_km)
        for r in _run("customer_nearest_neighbor", spark)
    ]
    assert got == expected


# --------------------------------------------------------------------------
# doc_dedup_decisions — exact keep rule + union-find over MinHash edges
# --------------------------------------------------------------------------

_K, _NH, _NB = 8, 16, 4
_THRESH = 0.35
_P = 2_147_483_647
_MIX_A, _MIX_B = 0x9E3779B1, 0x85EBCA6B


def _minhash_edges(texts):
    shingle_sets, sigs = {}, {}
    for i, t in texts.items():
        sh = {t[p : p + _K] for p in range(max(len(t) - (_K - 1), 1))}
        shingle_sets[i] = sh
        hs = [int(_md5(s)[:7], 16) for s in sh]
        sigs[i] = [
            min(
                ((_MIX_A * (s + 1)) % _P * h + (_MIX_B * (s + 1)) % _P) % _P
                for h in hs
            )
            for s in range(_NH)
        ]
    buckets: dict = defaultdict(list)
    for i, sig in sigs.items():
        for band in range(_NB):
            key = _md5("|".join(str(v) for v in sig[band * 4 : band * 4 + 4]))
            buckets[(band, key)].append(i)
    edges = set()
    for members in buckets.values():
        ms = sorted(members)
        for x, a in enumerate(ms):
            for b in ms[x + 1 :]:
                inter = len(shingle_sets[a] & shingle_sets[b])
                jac = inter / (
                    len(shingle_sets[a]) + len(shingle_sets[b]) - inter
                )
                if _r(jac, 4) >= _THRESH:
                    edges.add((a, b))
    return edges


def test_dedup_decisions_vs_keep_rule_and_union_find(spark):
    import re

    con = duckdb.connect()
    docs = dict(
        con.execute(
            f"select doc_id, text from '{SF_DIR}/documents.parquet'"
        ).fetchall()
    )
    con.close()
    docs = {int(i): t for i, t in docs.items()}

    # exact keep rule: min doc_id per canonical fingerprint
    keeper: dict = {}
    fp_of = {}
    for i in sorted(docs):
        fp = _md5(re.sub(r"\s+", " ", docs[i].strip().lower()))
        fp_of[i] = fp
        keeper.setdefault(fp, i)

    # near-dup clusters: union-find over the MinHash pair graph,
    # cluster id = min member (matching the oracle's min-reachable)
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = _minhash_edges(docs)
    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    members: dict = defaultdict(set)
    for n in parent:
        members[find(n)].add(n)
    cluster_of = {}
    for root, ns in members.items():
        cid = min(ns)
        for n in ns:
            cluster_of[n] = cid

    expected = []
    for i in sorted(docs):
        is_exact_keeper = keeper[fp_of[i]] == i
        cid = cluster_of.get(i)
        keep = is_exact_keeper and (cid is None or cid == i)
        if not is_exact_keeper:
            reason = "exact_dup"
        elif cid is not None and cid != i:
            reason = "near_dup"
        else:
            reason = "kept"
        expected.append((i, keep, reason))

    got = [
        (r.doc_id, r.keep, r.reason)
        for r in _run("doc_dedup_decisions", spark)
    ]
    assert got == expected
    # funnel invariant: exactly one keeper per exact-fingerprint class
    # that is not itself a near-dup loser
    kept = {i for i, k, _re in expected if k}
    assert kept and all(keeper[fp_of[i]] == i for i in kept)


# --------------------------------------------------------------------------
# event_key_skew_report — counts dict + continuous-quantile interpolation
# --------------------------------------------------------------------------


def test_skew_report_vs_counts_walk(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select user_id from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    cnt: dict = defaultdict(int)
    for (u,) in rows:
        cnt[u] += 1
    vals = sorted(cnt.values())
    n_rows = len(rows)

    def qcont(p):
        h = p * (len(vals) - 1)
        lo = int(math.floor(h))
        if lo + 1 >= len(vals):
            return float(vals[-1])
        return vals[lo] + (h - lo) * (vals[lo + 1] - vals[lo])

    expected = sorted(
        [
            ("max_count", _r(float(max(vals)), 6)),
            ("max_share", _r(max(vals) / n_rows, 6)),
            ("n_keys", _r(float(len(vals)), 6)),
            ("p50_count", _r(qcont(0.5), 6)),
            ("p99_count", _r(qcont(0.99), 6)),
        ]
    )

    got = [(r.metric, r.value) for r in _run("event_key_skew_report", spark)]
    assert got == expected


# --------------------------------------------------------------------------
# user_erasure_audit — last-seen dict, membership scan over both tables
# --------------------------------------------------------------------------


def test_erasure_audit_vs_last_seen_walk(spark):
    con = duckdb.connect()
    ev = con.execute(
        f"select user_id, ts from '{SF_DIR}/events.parquet'"
    ).fetchall()
    orders = con.execute(
        f"select o_custkey from '{SF_DIR}/orders.parquet'"
    ).fetchall()
    con.close()
    last: dict = {}
    for u, ts in ev:
        if u not in last or ts > last[u]:
            last[u] = ts
    cutoff = max(last.values()) - timedelta(days=1)
    tomb = {u for u, ts in last.items() if ts < cutoff}
    expected = [
        (
            "events",
            len(ev),
            sum(1 for u, _ts in ev if u in tomb),
            len(tomb),
        ),
        (
            "orders",
            len(orders),
            sum(1 for (c,) in orders if c in tomb),
            len(tomb),
        ),
    ]

    got = [
        (r.table_name, r.rows_total, r.rows_to_delete, r.n_users)
        for r in _run("user_erasure_audit", spark)
    ]
    assert got == expected

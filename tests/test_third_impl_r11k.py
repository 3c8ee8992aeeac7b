"""Third-implementation checks, batch 23 — layout, lineage, and ranking
walks: 30-minute sessionization (inclusive-gap merge), the SCD2 apply,
Morton (Z-order) keys by explicit bit interleave, nDCG of the LSH list
against exact gains, Efraimidis–Spirakis weighted sampling, and int8
scalar-quantization error. Pure imperative Python from the parquet.
"""

from __future__ import annotations

import hashlib
import math
import re
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


def test_user_sessions_vs_pure_gap_walk(spark):
    """Per-user (ts, event_id)-ordered walk breaking on gap > 30 min
    STRICTLY (events exactly 30 min apart merge — the session_window
    inclusive-merge semantics): session ids, starts, and sizes all from
    the same loop; plus the invariant that consecutive events inside a
    session are ≤ 30 min apart."""
    con = duckdb.connect()
    rows = con.execute(
        f"""select user_id, ts, event_id from '{SF_DIR}/events.parquet'
            order by user_id, ts, event_id"""
    ).fetchall()
    con.close()
    per_user: dict[int, list] = defaultdict(list)
    for uid, ts, _eid in rows:
        per_user[uid].append(ts)
    want = []
    gap = timedelta(minutes=30)
    for uid, tss in per_user.items():
        sid = -1
        prev = None
        start, n = None, 0
        for ts in tss:
            if prev is None or ts - prev > gap:
                if start is not None:
                    want.append((uid, sid, start.strftime("%Y-%m-%d %H:%M:%S"), n))
                sid += 1
                start, n = ts, 0
            n += 1
            prev = ts
        want.append((uid, sid, start.strftime("%Y-%m-%d %H:%M:%S"), n))
    got = [
        (r.user_id, r.session_id, r.session_start, r.n_events)
        for r in _run("user_sessions", spark)
    ]
    assert sorted(got) == sorted(want)


def test_scd2_history_vs_pure_apply(spark):
    """The SCD2 walk: every 10th key's current row closes at the
    effective timestamp and a fresh open row appends. Interval sanity:
    per key, validity intervals do not overlap and exactly one row is
    current."""
    con = duckdb.connect()
    rows = con.execute(
        f"""select o_orderkey, o_totalprice, o_orderdate
            from '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    con.close()
    eff = "2002-01-01 00:00:00"
    openv = "9999-12-31 00:00:00"
    want = []
    for k, price, od in rows:
        vf = od.strftime("%Y-%m-%d %H:%M:%S")
        if k % 10 == 0:
            want.append((k, _r(float(price), 2), vf, eff, False))
            want.append((k, _r(float(price) + 1000, 2), eff, openv, True))
        else:
            want.append((k, _r(float(price), 2), vf, openv, True))
    want.sort()
    got = sorted(
        (r.o_orderkey, r.price, r.valid_from, r.valid_to, r.is_current)
        for r in _run("orders_scd2_history", spark)
    )
    assert got == want
    by_key: dict[int, list] = defaultdict(list)
    for k, _p, vf, vt, cur in got:
        by_key[k].append((vf, vt, cur))
    for k, ivs in by_key.items():
        assert sum(1 for _f, _t, c in ivs if c) == 1
        ivs.sort()
        for (f1, t1, _c1), (f2, _t2, _c2) in zip(ivs, ivs[1:]):
            assert t1 <= f2  # non-overlapping validity


def test_zorder_keys_vs_pure_bit_interleave(spark):
    """8-bit quantization of (user_id, value) over fixed domains, then
    explicit bit interleave — zkey bit (i·2 + c) carries column c's
    quantized bit i. Plus the locality property the key exists for:
    equal quantized tuples ⟺ equal keys."""
    con = duckdb.connect()
    rows = con.execute(
        f"select event_id, user_id, value from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    doms = ((0.0, 1500.0), (0.0, 1000.0))

    def quant(x, lo, hi):
        v = x if x is not None else lo
        return max(min(int((v - lo) / (hi - lo) * 256), 255), 0)

    want = {}
    qtup = {}
    for eid, uid, val in rows:
        qs = [quant(float(uid), *doms[0]), quant(float(val), *doms[1])]
        z = 0
        for i in range(8):
            for c, q in enumerate(qs):
                z += ((q >> i) & 1) << (i * 2 + c)
        want[eid] = z
        qtup[eid] = tuple(qs)
    got = {r.event_id: r.zkey for r in _run("event_zorder_keys", spark)}
    assert got == want
    for a in list(want)[:200]:
        for b in list(want)[:50]:
            if qtup[a] == qtup[b]:
                assert want[a] == want[b]


def test_ann_ndcg_vs_pure_fold(spark):
    """Single-table 6-plane sign-LSH bucket list vs the exact list;
    DCG = Σ max(cos,0)/log₂(rank+1) folded by hand; plus the metric's
    bounds 0 ≤ nDCG ≤ 1 (gains clamped, ideal list is optimal)."""
    con = duckdb.connect()
    rows = con.execute(
        f"select vec_id, embedding::DOUBLE[] from '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    con.close()
    vecs = {int(i): [float(x) for x in v] for i, v in rows}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    planes = [
        [int(_md5(f"{p}-{d}")[0], 16) - 7.5 for d in range(64)]
        for p in range(6)
    ]
    sig = {
        i: "".join("1" if dot(v, pl) > 0 else "0" for pl in planes)
        for i, v in vecs.items()
    }

    def cos(a, b):
        return _r(dot(vecs[a], vecs[b]) / (
            math.sqrt(dot(vecs[a], vecs[a])) * math.sqrt(dot(vecs[b], vecs[b]))
        ), 6)

    got = {r.query_id: r for r in _run("embedding_ann_ndcg", spark)}
    assert sorted(got) == list(range(8))
    for q in range(8):
        bucket = [n for n in vecs if n != q and sig[n] == sig[q]]
        lsh = sorted(((cos(q, n), n) for n in bucket), key=lambda t: (-t[0], t[1]))[:10]
        exact = sorted(
            ((cos(q, n), n) for n in vecs if n != q), key=lambda t: (-t[0], t[1])
        )[:10]
        dcg = _r(math.fsum(
            max(c, 0.0) / (math.log(rk + 2) / math.log(2.0))
            for rk, (c, _n) in enumerate(lsh)
        ), 6)
        idcg = _r(math.fsum(
            max(c, 0.0) / (math.log(rk + 2) / math.log(2.0))
            for rk, (c, _n) in enumerate(exact)
        ), 6)
        r = got[q]
        assert r.n_retrieved == len(lsh)
        assert r.dcg == pytest.approx(dcg, abs=2e-6)
        assert r.idcg == pytest.approx(idcg, abs=2e-6)
        assert r.ndcg == pytest.approx(_r(dcg / idcg, 4), abs=2e-4)
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9


def test_weighted_sample_vs_pure_ares(spark):
    """A-Res keys −ln(u)/w with the md5 unit hash and token-count
    weights; top 60 by (key, doc_id). Plus the direction invariant:
    the sampled docs' mean weight exceeds the corpus mean (longer docs
    win proportionally more slots)."""
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, lang, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    recs = []
    for i, lang, t in rows:
        n = len(re.split(r"\s+", t.strip()))
        u = (int(_md5(f"wsample-{i}")[:6], 16) + 0.5) / 16777216.0
        recs.append((_r(-math.log(u) / n, 8), int(i), lang, n))
    recs.sort(key=lambda t: (t[0], t[1]))
    want = [(i, lang, n, k) for k, i, lang, n in recs[:60]]
    got = [
        (r.doc_id, r.lang, r.n_tokens, r.sample_key)
        for r in _run("doc_weighted_sample", spark)
    ]
    assert got == want
    mean_all = math.fsum(n for _k, _i, _l, n in recs) / len(recs)
    mean_sample = math.fsum(n for _i, _l, n, _k in want) / len(want)
    assert mean_sample > mean_all


def test_int8_quant_vs_pure_grid(spark):
    """Per-dim corpus min/max, floor-plus-half quantize to [-128, 127],
    dequantize, per-vector MSE at 10dp — plus the scalar-quantization
    error bound: every per-dim squared error ≤ (step/2 + step)² with
    step = range/255 (clamping can push one step past the midpoint)."""
    con = duckdb.connect()
    rows = con.execute(
        f"select vec_id, embedding::DOUBLE[] from '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    con.close()
    vecs = {int(i): [float(x) for x in v] for i, v in rows}
    mn = [min(v[d] for v in vecs.values()) for d in range(64)]
    mx = [max(v[d] for v in vecs.values()) for d in range(64)]
    got = {r.vec_id: r.mse for r in _run("embedding_int8_quant", spark)}
    assert sorted(got) == sorted(vecs)
    for i, v in vecs.items():
        terms = []
        for d in range(64):
            if mx[d] == mn[d]:
                terms.append(0.0)
                continue
            rng = mx[d] - mn[d]
            q = min(max(math.floor((v[d] - mn[d]) / rng * 255 + 0.5) - 128, -128), 127)
            deq = mn[d] + (q + 128) / 255.0 * rng
            err = (v[d] - deq) ** 2
            assert err <= (1.5 * rng / 255.0) ** 2 + 1e-12
            terms.append(err)
        assert got[i] == pytest.approx(
            _r(math.fsum(terms) / 64, 10), abs=1e-9
        ), i

"""Third-implementation checks, batch 48 — statistical decision surfaces
and the BPE consumer: the Welch two-sample z per metric from plain
moments, the Simpson's-paradox decomposition (per-group vs pooled OLS
slopes with the sign-reversal count), the full-outer stream join's
two-sided null-emission rule, and tokenizer fertility per language from
a from-scratch BPE train + encode walk (wrapped-symbol string replace,
exactly the operator's greedy fusion).
"""

from __future__ import annotations

import math
import re
from collections import defaultdict
from datetime import timedelta
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entry.queries()

_FMT = "%Y-%m-%d %H:%M:%S"


def _r(x: float, dp: int) -> float:
    from decimal import ROUND_HALF_UP

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


def test_ab_test_vs_welch_moments(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select user_id, event_type, value from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    arms: dict = defaultdict(lambda: {"A": [], "B": []})
    for uid, et, v in rows:
        arms[et]["A" if uid % 2 == 0 else "B"].append(float(v))
    expected = []
    for et in sorted(arms):
        a, b = arms[et]["A"], arms[et]["B"]
        na, nb = len(a), len(b)
        ma, mb = math.fsum(a) / na, math.fsum(b) / nb
        va = math.fsum((x - ma) ** 2 for x in a) / (na - 1)
        vb = math.fsum((x - mb) ** 2 for x in b) / (nb - 1)
        z = (mb - ma) / math.sqrt(va / na + vb / nb)
        expected.append(
            (et, na, nb, _r(ma, 4), _r(mb, 4), _r(z, 4), int(abs(z) > 1.96))
        )

    got = [
        (r.event_type, r.n_a, r.n_b, r.mean_a, r.mean_b, r.zstat,
         r.significant_95)
        for r in _run("ab_test_event_value", spark)
    ]
    assert got == expected


def test_simpson_check_vs_slope_decomposition(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""select p_brand, l_discount, l_quantity
            from '{SF_DIR}/lineitem.parquet' l
            join '{SF_DIR}/part.parquet' p on l_partkey = p_partkey"""
    ).fetchall()
    con.close()
    q6 = Decimal("0.000001")
    acc: dict = defaultdict(
        lambda: [0, Decimal(0), Decimal(0), Decimal(0), Decimal(0)]
    )
    for brand, x, y in rows:
        xd = Decimal(repr(float(x))).quantize(q6)
        yd = Decimal(repr(float(y))).quantize(q6)
        a = acc[brand]
        a[0] += 1
        a[1] += xd
        a[2] += yd
        a[3] += xd * xd
        a[4] += xd * yd
    slopes = {}
    tn, tsx, tsy, tsxx, tsxy = 0, 0.0, 0.0, 0.0, 0.0
    for brand, (n, sxd, syd, sxxd, sxyd) in acc.items():
        sx, sy, sxx, sxy = map(float, (sxd, syd, sxxd, sxyd))
        slopes[brand] = _r((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        tn += n
        tsx += sx
        tsy += sy
        tsxx += sxx
        tsxy += sxy
    pooled = _r((tn * tsxy - tsx * tsy) / (tn * tsxx - tsx * tsx), 6)
    n_pos = sum(1 for s in slopes.values() if s > 0)
    n_neg = sum(1 for s in slopes.values() if s < 0)
    n_rev = sum(1 for s in slopes.values() if (s > 0) != (pooled > 0))

    [row] = _run("brand_simpson_check", spark)
    assert (
        row.pooled_slope,
        row.n_brands,
        row.n_positive,
        row.n_negative,
        row.n_sign_reversed,
    ) == (pooled, len(slopes), n_pos, n_neg, n_rev)


def test_full_outer_stream_vs_two_sided_expiry(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select event_id, ts, user_id, event_type"
        f" from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    views: dict = defaultdict(list)
    clicks: dict = defaultdict(list)
    for eid, ts, uid, et in rows:
        if et == "view":
            views[uid].append((eid, ts))
        elif et == "click":
            clicks[uid].append((eid, ts))
    wm = min(
        max(ts for vs in views.values() for _e, ts in vs),
        max(ts for cs in clicks.values() for _e, ts in cs),
    )
    expected = []
    matched_clicks = set()
    for uid, vs in views.items():
        for vid, vts in vs:
            hit = False
            for cid, cts in clicks.get(uid, ()):
                if vts <= cts <= vts + timedelta(minutes=30):
                    expected.append(
                        (vid, cid, uid, vts.strftime(_FMT), cts.strftime(_FMT))
                    )
                    matched_clicks.add(cid)
                    hit = True
            if not hit and vts + timedelta(minutes=30) < wm:
                expected.append((vid, None, uid, vts.strftime(_FMT), ""))
    for uid, cs in clicks.items():
        for cid, cts in cs:
            joins_some_view = any(
                vts <= cts <= vts + timedelta(minutes=30)
                for _vid, vts in views.get(uid, ())
            )
            if not joins_some_view and cts < wm:
                expected.append((None, cid, uid, "", cts.strftime(_FMT)))

    def key(r):
        return (r[0] is None, r[0], r[1] is None, r[1])

    got = [
        (r.view_id, r.click_id, r.user_id, r.view_ts, r.click_ts)
        for r in _run("view_click_full_outer_stream", spark)
    ]
    assert sorted(got, key=key) == sorted(expected, key=key)


# --------------------------------------------------------------------------
# doc_bpe_fertility — from-scratch BPE train + encode + per-lang rollup
# --------------------------------------------------------------------------

_BPE_N = 3
_SYM = re.compile(r"\(([^)]+)\)")


def test_bpe_fertility_vs_from_scratch_walk(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"select doc_id, lang, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()

    vocab: dict = defaultdict(int)
    for _i, _lang, t in docs:
        for w in re.split(r"\s+", t.strip()):
            vocab[w] += 1
    seq = {w: "".join(f"({c})" for c in w) for w in vocab}
    merges = []
    for _rank in range(_BPE_N):
        pairs: dict = defaultdict(int)
        for w, f in vocab.items():
            syms = _SYM.findall(seq[w])
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (lhs, rhs), _n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((lhs, rhs))
        for w in seq:
            seq[w] = seq[w].replace(f"({lhs})({rhs})", f"({lhs}{rhs})")
    n_sym = {w: len(_SYM.findall(s)) for w, s in seq.items()}

    agg: dict = defaultdict(lambda: [set(), 0, 0])
    for i, lang, t in docs:
        a = agg[lang]
        for w in re.split(r"\s+", t.strip()):
            a[0].add(i)
            a[1] += 1
            a[2] += n_sym[w]
    expected = [
        (lang, len(ds), nw, ns, _r(ns / nw, 4))
        for lang, (ds, nw, ns) in sorted(agg.items())
    ]

    got = [
        (r.lang, r.n_docs, r.n_words, r.n_subwords, r.fertility)
        for r in _run("doc_bpe_fertility", spark)
    ]
    assert got == expected
    # fertility is by definition >= 1 with a trained-merge tokenizer
    assert all(f >= 1.0 for *_x, f in expected)

"""Third-implementation checks, batch 21 — ops-audit and linkage walks:
the lower weighted median, the clamped (non-linear) running balance, the
commutative table checksum, daily growth accounting, Soundex blocking
with an edit-distance verify, and exact Misra–Gries heavy hitters. Pure
imperative Python (explicit DP for Levenshtein, a hand-rolled Soundex,
dict folds) beside the Spark plans and SQL oracles.
"""

from __future__ import annotations

import hashlib
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


def test_weighted_median_vs_pure_crossing(spark):
    """Distinct-price grid per return flag, cumulative quantity weights,
    the smallest price whose running weight reaches half the total —
    plus the defining property: weight strictly below the median is
    < half, weight up to and including it is ≥ half."""
    con = duckdb.connect()
    rows = con.execute(
        f"""select l_returnflag, l_extendedprice, l_quantity
            from '{SF_DIR}/lineitem.parquet'"""
    ).fetchall()
    con.close()
    grid: dict[str, dict[float, float]] = defaultdict(lambda: defaultdict(float))
    for fl, price, qty in rows:
        grid[fl][float(price)] += float(qty)
    got = {r.returnflag: r for r in _run("lineitem_weighted_median", spark)}
    assert sorted(got) == sorted(grid)
    for fl, prices in grid.items():
        tot = sum(prices.values())
        cw, med = 0.0, None
        below = 0.0
        for p in sorted(prices):
            cw += prices[p]
            if cw >= tot / 2:
                med = p
                below = cw - prices[p]
                break
        r = got[fl]
        assert r.weighted_median_price == pytest.approx(_r(med, 2), abs=1e-9)
        assert r.total_weight == pytest.approx(_r(tot, 2), abs=1e-6)
        assert below < tot / 2 <= below + prices[med]


def test_balance_clamped_vs_pure_fold(spark):
    """bal′ = max(0, bal + value − 50) folded per user over the first 60
    (ts, event_id)-ordered events, counting floor engagements — the
    non-linear recursion no window rewrite can express, walked as a
    plain loop."""
    con = duckdb.connect()
    rows = con.execute(
        f"""select user_id, ts, event_id, value
            from '{SF_DIR}/events.parquet' order by user_id, ts, event_id"""
    ).fetchall()
    con.close()
    per_user: dict[int, list[float]] = defaultdict(list)
    for uid, _ts, _eid, v in rows:
        if len(per_user[uid]) < 60:
            per_user[uid].append(float(v))
    got = {r.user_id: r for r in _run("user_balance_clamped", spark)}
    assert sorted(got) == sorted(per_user)
    for uid, vals in per_user.items():
        bal, clamps = 0.0, 0
        for v in vals:
            raw = bal + v - 50.0
            if raw < 0:
                clamps += 1
            bal = max(0.0, raw)
        r = got[uid]
        assert (r.n_points, r.n_clamps) == (len(vals), clamps)
        assert r.final_balance == pytest.approx(_r(bal, 4), abs=1e-9)
        assert r.final_balance >= 0.0


def test_table_checksum_vs_pure_commutative_sum(spark):
    """md5 row hashes over the canonical rendering, bucketed by key mod
    32, summed with exact Python ints mod 2^62 — order-independence is
    free in the reference (dict accumulation order is arbitrary)."""
    con = duckdb.connect()
    rows = con.execute(
        f"""select o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderpriority from '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    con.close()
    n = defaultdict(int)
    s = defaultdict(int)
    for k, ck, st, price, pri in rows:
        cents = int(_r(float(price) * 100, 0))
        rh = int(
            hashlib.md5(f"{k}|{ck}|{st}|{cents}|{pri}".encode()).hexdigest()[:15],
            16,
        )
        n[k % 32] += 1
        s[k % 32] += rh
    got = {r.bucket: (r.n_rows, r.checksum) for r in _run("orders_table_checksum", spark)}
    assert got == {b: (n[b], s[b] % 4611686018427387904) for b in n}


def test_growth_accounting_vs_pure_user_walk(spark):
    """Per-user sorted active-day walk classifying new/retained/
    resurrected; churned = the PREVIOUS OBSERVED day's actives minus
    today's retained (the lag semantics, not calendar yesterday). Plus
    the additive identity active = new + retained + resurrected."""
    con = duckdb.connect()
    rows = con.execute(
        f"select distinct user_id, cast(ts as date) from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    days_of: dict[int, list] = defaultdict(list)
    for uid, d in rows:
        days_of[uid].append(d)
    daily = defaultdict(lambda: [0, 0, 0, 0])  # active, new, ret, res
    for _uid, ds in days_of.items():
        ds.sort()
        prev = None
        for d in ds:
            row = daily[d]
            row[0] += 1
            if prev is None:
                row[1] += 1
            elif (d - prev).days == 1:
                row[2] += 1
            else:
                row[3] += 1
            prev = d
    got = {r.day: r for r in _run("user_growth_accounting", spark)}
    days = sorted(daily)
    assert sorted(got) == [d.strftime("%Y-%m-%d") for d in days]
    prev_active = 0
    for d in days:
        active, new, ret, res = daily[d]
        r = got[d.strftime("%Y-%m-%d")]
        assert (r.n_active, r.n_new, r.n_retained, r.n_resurrected) == (
            active, new, ret, res,
        )
        assert r.n_churned == prev_active - ret
        assert active == new + ret + res  # the accounting identity
        prev_active = active


_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_DIGITS = "01230120022455012623010202"


def _soundex(word: str) -> str | None:
    s = re.sub("[^A-Za-z]", "", word.upper())
    if not s:
        return None
    coded = s.translate(str.maketrans(_ALPHA, _DIGITS))
    for d in "0123456":
        coded = re.sub(d + "+", d, coded)
    rest = coded[1:].replace("0", "")
    return s[0] + rest[:3].ljust(3, "0")


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_soundex_blocks_vs_pure_phonetic_walk(spark):
    """Hand-rolled simplified Soundex (translate, per-digit run
    collapse, vowel drop after the lead letter) + textbook Levenshtein
    DP over the within-block pairs — plus the blocking soundness check
    that every emitted pair really shares its code."""
    con = duckdb.connect()
    names = [
        t for (t,) in con.execute(
            f"select lower(p_name) from '{SF_DIR}/part.parquet'"
        ).fetchall()
    ]
    con.close()
    counts: dict[str, int] = defaultdict(int)
    for nm in names:
        for w in nm.split(" "):
            counts[w] += 1
    blocks: dict[str, list[str]] = defaultdict(list)
    for w in counts:
        code = _soundex(w)
        if code is not None:
            blocks[code].append(w)
    want = []
    for code, ws in blocks.items():
        ws = sorted(ws)
        for x, a in enumerate(ws):
            for b in ws[x + 1 :]:
                d = _lev(a, b)
                if d <= 2:
                    want.append((code, a, b, d, counts[a], counts[b]))
    want.sort()
    got = sorted(
        (r.code, r.word_1, r.word_2, r.lev, r.n_occ_1, r.n_occ_2)
        for r in _run("part_soundex_blocks", spark)
    )
    assert got == want
    for code, a, b, _d, _n1, _n2 in want:
        assert _soundex(a) == _soundex(b) == code


def test_heavy_hitters_vs_pure_counting(spark):
    """Exact counting over the whitespace token stream; heavy hitters =
    terms with count·(k+1) > total — the two-pass Misra–Gries output is
    provably exactly this set, so the reference just counts."""
    con = duckdb.connect()
    texts = [
        t for (t,) in con.execute(
            f"select text from '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]
    con.close()
    counts: dict[str, int] = defaultdict(int)
    total = 0
    for t in texts:
        for tok in re.split(r"\s+", t.strip()):
            counts[tok] += 1
            total += 1
    want = sorted(
        ((term, n, total) for term, n in counts.items() if n * 31 > total),
        key=lambda t: (-t[1], t[0]),
    )
    got = [
        (r.term, r.n_occ, r.n_total) for r in _run("doc_heavy_hitters", spark)
    ]
    assert got == want
    # the Misra-Gries guarantee: nothing below the threshold appears
    assert all(n * 31 > total for _t, n, _tot in got)

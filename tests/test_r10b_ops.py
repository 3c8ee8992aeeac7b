"""Third-implementation checks for the round-10b entries: pure-Python
references of a deliberately different shape from BOTH engine
restatements (duckdb used only as a reader).

- CART stump: brute-force every candidate threshold with EXACT
  `fractions.Fraction` scores (the engines compare correctly-rounded
  doubles of exact integers; the test also proves the double ordering
  cannot have blurred a strict exact ordering at this data).
- Isotonic fit: the minimax identity iso[i] = max_{j≤i} min_{k≥i}
  mean(j..k) evaluated over exact Fractions — the Spark side runs a
  stack-based PAVA walk, the DuckDB oracle the double-valued minimax;
  this reference is the exact-rational third leg.
"""

from __future__ import annotations

import math
from collections import defaultdict
from fractions import Fraction

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


def test_stump_vs_pure_exact_fraction_sweep(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select o_totalprice, o_orderstatus"
        f" from '{SF_DIR}/orders.parquet'"
    ).fetchall()
    con.close()
    grid: dict = defaultdict(lambda: [0, 0])
    for px, st in rows:
        grid[px][0] += 1
        grid[px][1] += 1 if st == "F" else 0
    n = sum(c for c, _p in grid.values())
    p = sum(pp for _c, pp in grid.values())
    nl = pl = 0
    best = None  # (exact score, -thr) maximized; payload carried
    second = None
    for thr in sorted(grid):
        cnt, pos = grid[thr]
        nl += cnt
        pl += pos
        if nl == n:
            break
        nr, pr = n - nl, p - pl
        score = Fraction(pl * pl + (nl - pl) ** 2, nl) + Fraction(
            pr * pr + (nr - pr) ** 2, nr
        )
        key = (score, -thr)
        cand = (key, thr, nl, pl, nr, pr)
        if best is None or key > best[0]:
            second = best
            best = cand
        elif second is None or key > second[0]:
            second = cand
    # the engines order by the DOUBLE score; prove the double ordering
    # can't have blurred the exact winner at this data (strict gap in
    # doubles too, or exact tie — in which case -thr breaks it both ways)
    def dbl(c):
        _key, _thr, nl_, pl_, nr_, pr_ = c
        return float(pl_ * pl_ + (nl_ - pl_) ** 2) / float(nl_) + float(
            pr_ * pr_ + (nr_ - pr_) ** 2
        ) / float(nr_)

    if second is not None and best[0][0] != second[0][0]:
        assert dbl(best) > dbl(second), (
            "double scores tie where exact scores differ — the engine "
            "argmax is ambiguous at this data; widen the score type"
        )
    _key, thr, nl, pl, nr, pr = best
    score_d = dbl(best)
    parent = 1 - float(p * p + (n - p) ** 2) / float(n * n)
    split = 1 - score_d / float(n)
    got = _run("order_price_stump_split", spark)
    assert len(got) == 1
    row = got[0]
    assert row.threshold == pytest.approx(_r(thr, 6), abs=1e-9)
    assert (row.n_left, row.pos_left) == (nl, pl)
    assert (row.n_right, row.pos_right) == (nr, pr)
    assert row.gini_parent == pytest.approx(_r(parent, 6), abs=1e-9)
    assert row.gini_split == pytest.approx(_r(split, 6), abs=1e-9)
    assert row.gini_gain == pytest.approx(_r(parent - split, 6), abs=1e-9)
    # sanity: the winning split strictly beats splitting nowhere
    assert row.gini_gain >= 0


def _sigmoid_score(v):
    return _r(1 / (1 + math.exp(-((v - 100.0) / 50.0))), 9)


def test_isotonic_vs_pure_minimax_fractions(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select event_type, value from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    bins: dict = defaultdict(lambda: [0, 0])
    preds: dict = defaultdict(list)
    for etype, v in rows:
        sc = _sigmoid_score(v)
        b = min(int(math.floor(sc * 20)), 19)
        bins[b][0] += 1
        bins[b][1] += 1 if etype == "purchase" else 0
        preds[b].append(sc)
    order = sorted(bins)
    cp = {}
    cn = {}
    acc_p = acc_n = 0
    for b in order:
        acc_n += bins[b][0]
        acc_p += bins[b][1]
        cn[b] = acc_n
        cp[b] = acc_p
    def pooled(jb, kb):
        pos = cp[kb] - cp[jb] + bins[jb][1]
        nn = cn[kb] - cn[jb] + bins[jb][0]
        return Fraction(pos, nn)

    iso = {}
    for i, bi in enumerate(order):
        iso[bi] = max(
            min(pooled(jb, kb) for kb in order[i:])
            for jb in order[: i + 1]
        )
    # monotone by construction — assert the invariant anyway
    seq = [iso[b] for b in order]
    assert all(a <= b for a, b in zip(seq, seq[1:]))
    got = _run("event_score_isotonic_fit", spark)
    assert [r.bin for r in got] == order
    for r in got:
        n_b, pos_b = bins[r.bin]
        assert (r.n, r.pos) == (n_b, pos_b)
        f = iso[r.bin]
        assert r.iso_prob == pytest.approx(
            _r(float(f.numerator) / float(f.denominator), 6), abs=1e-9
        )
        assert r.frac_pos == pytest.approx(
            _r(float(pos_b) / float(n_b), 6), abs=1e-9
        )
        assert r.mean_pred == pytest.approx(
            _r(math.fsum(preds[r.bin]) / n_b, 6), abs=1e-9
        )
    # the fit must actually pool somewhere at this data, or the test is
    # vacuous (the raw rates are non-monotone by measurement)
    raw = [Fraction(bins[b][1], bins[b][0]) for b in order]
    assert any(a > b for a, b in zip(raw, raw[1:]))
    assert seq != raw

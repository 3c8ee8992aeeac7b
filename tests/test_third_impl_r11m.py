"""Third-implementation checks, batch 25 — temporal-statistics walks:
trailing-window EWMA, Holt double-exponential smoothing, the degree
power-law fit, histogram-CDF quantile normalization, pairwise KS drift,
and the seasonal-naive backtest. Pure imperative Python folds (explicit
per-user recursions, dense CDF arrays) beside the Spark plans and their
self-join / recursive-CTE oracles.
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
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"""select user_id, event_id, event_type, ts, value
            from '{SF_DIR}/events.parquet' order by user_id, ts, event_id"""
    ).fetchall()
    con.close()
    return rows


def test_ewma_vs_pure_trailing_fold(spark, events):
    """Per-row (num, den) fold over the trailing ≤20-value frame —
    num' = num(1−α)+v, den' = den(1−α)+1 — replicating the adjust=True
    EWMA; plus the convexity invariant: every EWMA lies within the
    frame's [min, max]."""
    alpha = 0.3
    frames: dict[int, tuple] = {}
    hist: dict[int, list[float]] = defaultdict(list)
    for uid, eid, _et, _ts, v in events:
        hist[uid].append(float(v))
        frames[eid] = tuple(hist[uid][-20:])
    got = {r.event_id: r.ewma for r in _run("user_value_ewma", spark)}
    assert sorted(got) == sorted(frames)
    for eid, frame in frames.items():
        num = den = 0.0
        for v in frame:
            num = num * (1 - alpha) + v
            den = den * (1 - alpha) + 1.0
        assert got[eid] == pytest.approx(_r(num / den, 4), abs=1e-9), eid
        assert min(frame) - 1e-4 <= got[eid] <= max(frame) + 1e-4


def test_holt_vs_pure_recursion(spark, events):
    """l₂ = x₂, b₂ = x₂ − x₁; lₜ = αxₜ + (1−α)(l+b),
    bₜ = β(lₜ − l) + (1−β)b over the first 40 observations — users with
    one event have no fit (init needs two)."""
    a, b_ = 0.5, 0.3
    per_user: dict[int, list[float]] = defaultdict(list)
    for uid, _eid, _et, _ts, v in events:
        if len(per_user[uid]) < 40:
            per_user[uid].append(float(v))
    got = {r.user_id: r for r in _run("user_value_holt", spark)}
    want_users = sorted(u for u, xs in per_user.items() if len(xs) >= 2)
    assert sorted(got) == want_users
    for u in want_users:
        xs = per_user[u]
        lev, tr = xs[1], xs[1] - xs[0]
        for x in xs[2:]:
            new_l = a * x + (1 - a) * (lev + tr)
            tr = b_ * (new_l - lev) + (1 - b_) * tr
            lev = new_l
        r = got[u]
        assert r.n_points == len(xs)
        assert r.level == pytest.approx(_r(lev, 4), abs=1e-9)
        assert r.trend == pytest.approx(_r(tr, 4), abs=1e-9)
        assert r.forecast_1 == pytest.approx(_r(lev + tr, 4), abs=1e-9)


def test_degree_powerlaw_vs_pure_ols(spark, events):
    """Degree histogram → (ln d, ln count) OLS by the closed form;
    α = −slope; r² from the same sums."""
    deg: dict[int, int] = defaultdict(int)
    for uid, _eid, _et, _ts, _v in events:
        deg[uid] += 1
    hist: dict[int, int] = defaultdict(int)
    for _u, d in deg.items():
        hist[d] += 1
    pts = [(math.log(d), math.log(c)) for d, c in hist.items() if d >= 1]
    n = len(pts)
    sx = math.fsum(x for x, _y in pts)
    sy = math.fsum(y for _x, y in pts)
    sxx = math.fsum(x * x for x, _y in pts)
    sxy = math.fsum(x * y for x, y in pts)
    syy = math.fsum(y * y for _x, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    [row] = _run("user_degree_powerlaw", spark)
    assert row.n_points == n
    assert row.alpha == pytest.approx(_r(-slope, 6), abs=2e-6)
    assert row.intercept == pytest.approx(_r((sy - slope * sx) / n, 6), abs=2e-6)
    assert row.r2 == pytest.approx(_r(r2, 6), abs=2e-6)
    assert 0.0 <= row.r2 <= 1.0


@pytest.fixture(scope="module")
def hist_cdf(events):
    """Dense per-type 50-bin histogram over [0, 500] with cumulative
    counts — shared by the CDF-normalization and KS tests."""
    w = 10.0
    counts: dict[str, list[int]] = defaultdict(lambda: [0] * 50)
    for _u, _e, et, _ts, v in events:
        b = min(49, max(0, math.floor(float(v) / w)))
        counts[et][b] += 1
    cum = {}
    for et, cs in counts.items():
        acc, out = 0, []
        for c in cs:
            acc += c
            out.append(acc)
        cum[et] = (cs, out, acc)
    return cum


def test_cdf_norm_vs_pure_interpolation(spark, events, hist_cdf):
    """Every event's percentile from its type's histogram CDF with
    in-bin linear interpolation — plus the monotonicity invariant
    within a type: larger value ⇒ percentile not smaller."""
    w = 10.0
    got = {r.event_id: r.pct for r in _run("event_value_cdf_norm", spark)}
    by_type: dict[str, list] = defaultdict(list)
    for _u, eid, et, _ts, v in events:
        cs, cum, n = hist_cdf[et]
        b = min(49, max(0, math.floor(float(v) / w)))
        frac = min(1.0, max(0.0, (float(v) - b * w) / w))
        pct = _r((cum[b] - cs[b] + frac * cs[b]) / n, 6)
        assert got[eid] == pytest.approx(pct, abs=1e-9), eid
        by_type[et].append((float(v), got[eid]))
    for et, pairs in by_type.items():
        pairs.sort()
        for (v1, p1), (v2, p2) in zip(pairs, pairs[1:]):
            if v2 > v1:
                assert p2 >= p1 - 1e-9


def test_ks_drift_vs_pure_cdf_gaps(spark, hist_cdf):
    """Pairwise max |CDF_a − CDF_b| over the dense 50-bucket grid."""
    types = sorted(hist_cdf)
    want = {}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            _ca, cuma, na = hist_cdf[ta]
            _cb, cumb, nb = hist_cdf[tb]
            ks = max(abs(cuma[b] / na - cumb[b] / nb) for b in range(50))
            want[(ta, tb)] = (_r(ks, 6), na, nb)
    got = {
        (r.type_a, r.type_b): (r.ks_stat, r.n_a, r.n_b)
        for r in _run("event_type_ks_drift", spark)
    }
    assert sorted(got) == sorted(want)
    for k in want:
        assert got[k][1:] == want[k][1:]
        assert got[k][0] == pytest.approx(want[k][0], abs=2e-6)
        assert 0.0 <= got[k][0] <= 1.0


def test_seasonal_baseline_vs_pure_profile(spark, events):
    """Hour-of-day mean profile fit strictly before the split, MAE and
    signed bias on the holdout — the temporal-leakage-safe split walked
    with dicts; |bias| ≤ MAE by construction."""
    from datetime import datetime

    split = datetime(2024, 1, 22)
    tr: dict[tuple, list[float]] = defaultdict(list)
    te: dict[tuple, list[float]] = defaultdict(list)
    for _u, _e, et, ts, v in events:
        (tr if ts < split else te)[(et, ts.hour)].append(float(v))
    prof = {k: math.fsum(vs) / len(vs) for k, vs in tr.items()}
    per_type: dict[str, list] = defaultdict(list)
    for (et, h), vs in te.items():
        if (et, h) in prof:
            for v in vs:
                per_type[et].append(v - prof[(et, h)])
    got = {r.event_type: r for r in _run("event_seasonal_baseline", spark)}
    assert sorted(got) == sorted(per_type)
    for et, resid in per_type.items():
        r = got[et]
        assert r.n_test == len(resid)
        mae = math.fsum(abs(x) for x in resid) / len(resid)
        bias = math.fsum(resid) / len(resid)
        assert r.mae == pytest.approx(_r(mae, 4), abs=2e-4)
        assert r.bias == pytest.approx(_r(bias, 4), abs=2e-4)
        assert abs(r.bias) <= r.mae + 1e-9

"""Third-implementation checks for the highest shared-restatement-risk
families (round-9 verdict directive 3): each test recomputes the answer
in PLAIN IMPERATIVE PYTHON from the parquet (duckdb used only as a
reader) and asserts the Spark entry matches. The DuckDB oracles restate
the same relational math as the Spark plans; these references are
deliberately different shapes (loops, dict folds, closed-form walks), so
a formula bug shared by both engine restatements cannot hide here.

Families covered: exact Wasserstein-1 (batch + streaming-ledger faces),
CUSUM (stream ledger's micro-exact means + batch), PSI (batch
reference-decile bins + stream fixed-width bins), KS score separation,
probability calibration, and the two iterative trainers (IRLS logistic,
pinball-loss quantile GD) walked step-for-step with the engines'
6dp-aggregate / 8dp-weight rounding contract.
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


def _r(x: float, dp: int) -> float:
    """Half-up rounding of the double's shortest decimal repr — what
    Spark's F.round (BigDecimal.valueOf) and DuckDB's round do."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"select event_type, value, ts, cast(ts as date) as day,"
        f" hour(ts) as hr from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


def _period_split(events):
    """ref ⟺ 2·(day − lo) < (hi − lo) — the shared batch split rule."""
    days = [d for _t, _v, _ts, d, _h in events]
    lo, hi = min(days), max(days)
    span = (hi - lo).days
    return lo, hi, span


def test_wasserstein_both_faces_vs_pure_integration(spark, events):
    """W₁ = Σ|F_ref−F_cur|·Δv over the merged distinct-value grid,
    folded imperatively over sorted (value → count) dicts; the stream
    ledger must equal the batch entry row-for-row (its state is the
    same pre-aggregate by construction)."""
    lo, _hi, span = _period_split(events)
    cr: dict = defaultdict(int)
    cc: dict = defaultdict(int)
    for _t, v, _ts, d, _h in events:
        if (d - lo).days * 2 < span:
            cr[v] += 1
        else:
            cc[v] += 1
    nr, nc = sum(cr.values()), sum(cc.values())
    vals = sorted(set(cr) | set(cc))
    crt = cct = 0
    terms = []
    for v, nxt in zip(vals, vals[1:]):
        crt += cr.get(v, 0)
        cct += cc.get(v, 0)
        terms.append(abs(crt * nc - cct * nr) * (nxt - v))
    w1 = _r(math.fsum(terms) / (nr * 1.0 * nc), 6)
    batch = _run("event_value_wasserstein_drift", spark)
    assert len(batch) == 1
    b = batch[0]
    assert (b.n_ref, b.n_cur) == (nr, nc)
    assert b.wasserstein_1 == pytest.approx(w1, abs=1e-9)
    stream = _run("event_wasserstein_stream_ledger", spark)
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]


def _cusum_walk(series_by_type):
    """Retrospective CUSUM over a per-type {day: x} map: S_t fold,
    argmax |S| with earliest-day tie, z = max|S|/(σ√n)."""
    out = {}
    for etype, days in series_by_type.items():
        ds = sorted(days)
        xs = [days[d] for d in ds]
        n = len(xs)
        xbar = _r(math.fsum(xs) / n, 6)
        m = math.fsum(xs) / n
        sd = math.sqrt(math.fsum((x - m) ** 2 for x in xs) / n)
        s = 0.0
        best = None  # (|S|, day) with max-|S| then earliest-day
        for d, x in zip(ds, xs):
            s += x - xbar
            if best is None or abs(s) > best[0]:
                best = (abs(s), d)
        out[etype] = (n, best[1], _r(best[0], 6), _r(best[0] / (sd * math.sqrt(n)), 4))
    return out


def test_cusum_stream_ledger_vs_pure_walk(spark, events):
    """The stream ledger's daily means are integer-micro EXACT, so the
    whole reference is airtight: same division order, same fold."""
    sums: dict = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for etype, v, _ts, d, _h in events:
        cell = sums[etype][d]
        cell[0] += round(v * 1_000_000)
        cell[1] += 1
    series = {
        etype: {d: _r(s / 1_000_000.0 / n, 6) for d, (s, n) in days.items()}
        for etype, days in sums.items()
    }
    want = _cusum_walk(series)
    got = {r.event_type: r for r in _run("event_cusum_stream_ledger", spark)}
    assert set(got) == set(want)
    for etype, (n, day, peak, z) in want.items():
        r = got[etype]
        assert r.n_points == n
        assert r.change_day == day.strftime("%Y-%m-%d")
        assert r.cusum_peak == pytest.approx(peak, abs=1e-9)
        assert r.cusum_z == pytest.approx(z, abs=1e-9)


def test_cusum_batch_vs_pure_walk(spark, events):
    """Batch face: daily mean is round(avg(value), 6) — fsum stands in
    for the engines' partial sums (the 6dp round absorbs the ulp)."""
    acc: dict = defaultdict(lambda: defaultdict(list))
    for etype, v, _ts, d, _h in events:
        acc[etype][d].append(v)
    series = {
        etype: {d: _r(math.fsum(vs) / len(vs), 6) for d, vs in days.items()}
        for etype, days in acc.items()
    }
    want = _cusum_walk(series)
    got = {
        r.event_type: r
        for r in _run("event_value_cusum_changepoint", spark)
    }
    assert set(got) == set(want)
    for etype, (n, day, peak, z) in want.items():
        r = got[etype]
        assert r.n_points == n
        assert r.change_day == day.strftime("%Y-%m-%d")
        assert r.cusum_peak == pytest.approx(peak, abs=1e-9)
        assert r.cusum_z == pytest.approx(z, abs=1e-9)


def _quantile_cont(sorted_vals, p):
    """DuckDB quantile_cont ≡ Spark percentile: linear interpolation at
    h = (n−1)p."""
    h = (len(sorted_vals) - 1) * p
    f = math.floor(h)
    frac = h - f
    if frac == 0:
        return sorted_vals[f]
    return sorted_vals[f] + frac * (sorted_vals[f + 1] - sorted_vals[f])


def _psi_terms(n_ref, n_cur, nbins):
    tr, tc = sum(n_ref.values()), sum(n_cur.values())
    rows = []
    for b in range(nbins):
        r = n_ref.get(b, 0)
        c = n_cur.get(b, 0)
        p_ref = (r + 1) / (tr + float(nbins))
        p_cur = (c + 1) / (tc + float(nbins))
        rows.append(
            (
                r,
                c,
                _r(p_ref, 6),
                _r(p_cur, 6),
                _r((p_cur - p_ref) * math.log(p_cur / p_ref), 6),
            )
        )
    return rows


def test_psi_batch_vs_pure(spark, events):
    """Reference-decile bins: pure-Python linear-interpolated quantiles
    + add-one smoothing + ln terms."""
    lo, _hi, span = _period_split(events)
    ref_vals, rows = [], []
    for _t, v, _ts, d, _h in events:
        is_ref = (d - lo).days * 2 < span
        rows.append((v, is_ref))
        if is_ref:
            ref_vals.append(v)
    ref_vals.sort()
    bounds = [_quantile_cont(ref_vals, i / 10.0) for i in range(1, 10)]
    n_ref: dict = defaultdict(int)
    n_cur: dict = defaultdict(int)
    for v, is_ref in rows:
        b = sum(1 for x in bounds if v > x)  # bin index 0..9 (1-based −1)
        (n_ref if is_ref else n_cur)[b] += 1
    want = _psi_terms(n_ref, n_cur, 10)
    got = sorted(_run("event_value_psi_drift", spark), key=lambda r: r.bin)
    assert [r.bin for r in got] == list(range(1, 11))
    for r, (nr, nc, p_ref, p_cur, term) in zip(got, want):
        assert (r.n_ref, r.n_cur) == (nr, nc)
        assert r.p_ref == pytest.approx(p_ref, abs=1e-9)
        assert r.p_cur == pytest.approx(p_cur, abs=1e-9)
        assert r.psi_term == pytest.approx(term, abs=1e-9)


def test_psi_stream_vs_pure(spark, events):
    """Stream face: fixed-width bins min(⌊v/50⌋, 9), period split at
    mid = lo + (span+1)//2 days — the ledger harness's cut."""
    lo, _hi, span = _period_split(events)
    mid = lo + timedelta(days=(span + 1) // 2)
    n_ref: dict = defaultdict(int)
    n_cur: dict = defaultdict(int)
    for _t, v, _ts, d, _h in events:
        b = min(int(math.floor(v / 50.0)), 9)
        (n_ref if d < mid else n_cur)[b] += 1
    want = _psi_terms(n_ref, n_cur, 10)
    got = sorted(_run("event_psi_stream_ledger", spark), key=lambda r: r.bin)
    assert [r.bin for r in got] == list(range(10))
    for r, (nr, nc, p_ref, p_cur, term) in zip(got, want):
        assert (r.n_ref, r.n_cur) == (nr, nc)
        assert r.p_ref == pytest.approx(p_ref, abs=1e-9)
        assert r.p_cur == pytest.approx(p_cur, abs=1e-9)
        assert r.psi_term == pytest.approx(term, abs=1e-9)


def _sigmoid_score(v):
    return _r(1 / (1 + math.exp(-((v - 100.0) / 50.0))), 9)


def test_ks_separation_vs_pure(spark, events):
    """Two-sample KS over the 9dp-score grid: imperative cumulative
    fold, argmax with smallest-score tie."""
    cg: dict = defaultdict(int)
    cb: dict = defaultdict(int)
    for etype, v, _ts, _d, _h in events:
        sc = _sigmoid_score(v)
        if etype == "purchase":
            cg[sc] += 1
        else:
            cb[sc] += 1
    ng, nb = sum(cg.values()), sum(cb.values())
    cgt = cbt = 0
    best = None  # (dnum, sc): max dnum then smallest sc
    for sc in sorted(set(cg) | set(cb)):
        cgt += cg.get(sc, 0)
        cbt += cb.get(sc, 0)
        dnum = abs(cgt * nb - cbt * ng)
        if best is None or dnum > best[0]:
            best = (dnum, sc)
    got = _run("event_score_ks_separation", spark)
    assert len(got) == 1
    r = got[0]
    assert (r.n_good, r.n_bad) == (ng, nb)
    assert r.ks == pytest.approx(_r(best[0] / (1.0 * ng * nb), 6), abs=1e-9)
    assert r.at_score == pytest.approx(_r(best[1], 6), abs=1e-9)


def test_calibration_vs_pure(spark, events):
    """Reliability diagram: 9dp scores, clamp, 10 equal-width bins,
    per-bin means/gap/Brier recomputed imperatively."""
    bins: dict = defaultdict(list)
    for etype, v, _ts, _d, _h in events:
        s2 = min(max(_sigmoid_score(v), 0.0), 1.0)
        y = 1.0 if etype == "purchase" else 0.0
        b = min(int(math.floor(s2 * 10)), 9)
        bins[b].append((s2, y))
    got = {r.bin: r for r in _run("event_score_calibration", spark)}
    assert set(got) == set(bins)
    for b, pairs in bins.items():
        n = len(pairs)
        mp = math.fsum(s for s, _ in pairs) / n
        fp = math.fsum(y for _, y in pairs) / n
        br = math.fsum((s - y) ** 2 for s, y in pairs) / n
        r = got[b]
        assert r.n == n
        assert r.mean_pred == pytest.approx(_r(mp, 6), abs=1e-9)
        assert r.frac_pos == pytest.approx(_r(fp, 6), abs=1e-9)
        assert r.gap == pytest.approx(_r(mp - fp, 6), abs=1e-9)
        assert r.brier_term == pytest.approx(_r(br, 6), abs=1e-9)


def test_irls_logistic_vs_pure_walk(spark, events):
    """3 Newton steps walked imperatively: 6dp-rounded 5-sum aggregates,
    closed-form 2×2 ridge solve, 8dp-rounded weights — the engines'
    exact trajectory contract."""
    ridge = 1e-8
    ys, vs = [], []
    for etype, v, _ts, _d, _h in events:
        ys.append(1.0 if etype == "purchase" else 0.0)
        vs.append(v)
    n = len(vs)
    m = math.fsum(vs) / n
    s = math.sqrt(math.fsum((v - m) ** 2 for v in vs) / n)
    zs = [_r((v - m) / s, 6) for v in vs]
    a = b = 0.0
    for _step in range(3):
        ps = [1 / (1 + math.exp(-(a + b * z))) for z in zs]
        g0 = _r(math.fsum(y - p for y, p in zip(ys, ps)), 6)
        g1 = _r(math.fsum((y - p) * z for y, p, z in zip(ys, ps, zs)), 6)
        h00 = _r(math.fsum(p * (1 - p) for p in ps), 6)
        h01 = _r(math.fsum(p * (1 - p) * z for p, z in zip(ps, zs)), 6)
        h11 = _r(math.fsum(p * (1 - p) * z * z for p, z in zip(ps, zs)), 6)
        det = (h00 + ridge) * (h11 + ridge) - h01 * h01
        a = _r(a + ((h11 + ridge) * g0 - h01 * g1) / det, 8)
        b = _r(b + ((h00 + ridge) * g1 - h01 * g0) / det, 8)
    ll = _r(
        math.fsum(
            y * math.log(max(1 / (1 + math.exp(-(a + b * z))), 1e-12))
            + (1 - y)
            * math.log(max(1 - 1 / (1 + math.exp(-(a + b * z))), 1e-12))
            for y, z in zip(ys, zs)
        )
        / n,
        6,
    )
    got = _run("event_value_irls_logistic", spark)
    assert len(got) == 1
    r = got[0]
    assert r.n_events == n
    assert r.w_bias == pytest.approx(a, abs=1e-12)
    assert r.w_value == pytest.approx(b, abs=1e-12)
    assert r.train_loglik == pytest.approx(ll, abs=1e-9)


def test_pinball_gd_vs_pure_walk(spark, events):
    """12 subgradient steps of the τ=0.9 pinball regression walked
    imperatively under the same rounding contract."""
    tau, lr, steps = 0.9, 1.0, 12
    lvs, hrs = [], []
    for _etype, v, _ts, _d, h in events:
        lvs.append(_r(math.log(1 + v), 6))
        hrs.append(float(h))
    n = len(lvs)
    m = math.fsum(hrs) / n
    s = math.sqrt(math.fsum((h - m) ** 2 for h in hrs) / n)
    zs = [_r((h - m) / s, 6) for h in hrs]
    a = b = 0.0
    for _step in range(steps):
        below = [1.0 if lv < a + b * z else 0.0 for lv, z in zip(lvs, zs)]
        g0 = _r(math.fsum(tau - bl for bl in below) / n, 6)
        g1 = _r(math.fsum(z * (tau - bl) for z, bl in zip(zs, below)) / n, 6)
        a = _r(a + lr * g0, 8)
        b = _r(b + lr * g1, 8)
    pin = _r(
        math.fsum(
            (tau if lv - (a + b * z) >= 0 else tau - 1.0)
            * (lv - (a + b * z))
            for lv, z in zip(lvs, zs)
        )
        / n,
        6,
    )
    got = _run("event_hour_pinball_p90", spark)
    assert len(got) == 1
    r = got[0]
    assert r.n_events == n
    assert r.w_bias == pytest.approx(a, abs=1e-12)
    assert r.w_hour == pytest.approx(b, abs=1e-12)
    assert r.pinball == pytest.approx(pin, abs=1e-9)

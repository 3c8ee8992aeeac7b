"""Third-implementation checks, batch 4: pure-Python imperative
references for the statistics-heavy families whose Spark plan and
DuckDB oracle restate the SAME closed forms (duckdb used only as a
reader) — CUPED variance reduction, Benjamini–Hochberg step-up,
Theil–Sen pairwise-slope median, mutual information, chi-square +
Cramér's V, Spearman tie-averaged rank correlation, and WOE/IV decile
binning. Where a cross-row double sum is summation-order-sensitive the
entry's own round (4–8 dp) absorbs the ulp — the established battery
contract; everything rank- or count-shaped is replicated exactly.
"""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import datetime

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
        f"select event_id, user_id, event_type, value, ts,"
        f" cast(ts as date) as day, hour(ts) as hr"
        f" from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def test_cuped_vs_pure_moment_walk(spark, events):
    """Per-user pre/post means, θ = cov/var over both-sides users, and
    the adjusted per-arm moments — all via fsum (4dp absorbs)."""
    split = datetime(2024, 1, 22)
    pre: dict = defaultdict(list)
    post: dict = defaultdict(list)
    for _e, u, _t, v, ts, _d, _h in events:
        (pre if ts < split else post)[u].append(v)
    users = sorted(set(pre) & set(post))
    x = {u: math.fsum(pre[u]) / len(pre[u]) for u in users}
    y = {u: math.fsum(post[u]) / len(post[u]) for u in users}
    n = len(users)
    xbar = math.fsum(x.values()) / n
    ybar = math.fsum(y.values()) / n
    cov = math.fsum((x[u] - xbar) * (y[u] - ybar) for u in users) / (n - 1)
    var = math.fsum((x[u] - xbar) ** 2 for u in users) / (n - 1)
    theta = cov / var
    arms: dict = defaultdict(list)
    for u in users:
        arms["A" if u % 2 == 0 else "B"].append(
            (y[u], y[u] - theta * (x[u] - xbar))
        )
    got = {r.arm: r for r in _run("ab_cuped_event_value", spark)}
    assert set(got) == set(arms)
    for arm, pairs in arms.items():
        k = len(pairs)
        mp = math.fsum(p[0] for p in pairs) / k
        mc = math.fsum(p[1] for p in pairs) / k
        vp = math.fsum((p[0] - mp) ** 2 for p in pairs) / (k - 1)
        vc = math.fsum((p[1] - mc) ** 2 for p in pairs) / (k - 1)
        r = got[arm]
        assert r.n_users == k
        assert r.mean_post == pytest.approx(_r(mp, 4), abs=1e-9)
        assert r.mean_cuped == pytest.approx(_r(mc, 4), abs=1e-9)
        assert r.var_post == pytest.approx(_r(vp, 4), abs=1e-9)
        assert r.var_cuped == pytest.approx(_r(vc, 4), abs=1e-9)
        # NOTE: no var_cuped <= var_post invariant — theta minimizes the
        # POOLED adjusted variance; a small arm (8 users here) can see
        # its own variance rise


def test_bh_fdr_vs_pure_stepup(spark, events):
    """z per (type, hour) cell, logistic-approx p, then the step-up
    rule k = max{r : p_(r) <= alpha r/m} walked on the ROUNDED values
    the engines rank — the selection path is exact."""
    vals: dict = defaultdict(list)
    cells: dict = defaultdict(list)
    for _e, _u, t, v, _ts, _d, h in events:
        vals[t].append(v)
        cells[(t, h)].append(v)
    stats = {}
    for t, vs in vals.items():
        m = math.fsum(vs) / len(vs)
        stats[t] = (m, math.fsum((x - m) ** 2 for x in vs) / len(vs))
    tests = []
    for (t, h), vs in cells.items():
        mean_c = math.fsum(vs) / len(vs)
        z = _r((mean_c - stats[t][0]) / math.sqrt(stats[t][1] / len(vs)), 6)
        p = _r(2.0 * (1.0 - 1.0 / (1.0 + math.exp(-1.702 * abs(z)))), 8)
        tests.append((p, t, h))
    tests.sort()
    m = len(tests)
    k = 0
    for r, (p, _t, _h) in enumerate(tests, 1):
        if p <= 0.05 * r / m:
            k = r
    agg: dict = defaultdict(lambda: [0, 0, 0, 1.0])
    for r, (p, t, _h) in enumerate(tests, 1):
        a = agg[t]
        a[0] += 1
        a[1] += 1 if r <= k else 0
        a[2] += 1 if p <= 0.05 else 0
        a[3] = min(a[3], p)
    got = _run("event_type_bh_fdr", spark)
    assert [r.event_type for r in got] == sorted(agg)
    for r in got:
        n_tests, n_bh, n_raw, min_p = agg[r.event_type]
        assert (r.n_tests, r.n_rej_bh, r.n_rej_raw) == (n_tests, n_bh, n_raw)
        assert r.min_p == pytest.approx(min_p, abs=1e-9)


def _quantile_cont(sorted_vals, p):
    h = (len(sorted_vals) - 1) * p
    f = math.floor(h)
    frac = h - f
    if frac == 0:
        return sorted_vals[f]
    return sorted_vals[f] + frac * (sorted_vals[f + 1] - sorted_vals[f])


def test_theil_sen_vs_pure_pairwise_median(spark, events):
    """All day-pair slopes of the per-day mean, median by linear
    interpolation — the engines' percentile/quantile_cont contract."""
    daily: dict = defaultdict(lambda: defaultdict(list))
    for _e, _u, t, v, _ts, d, _h in events:
        daily[t][d].append(v)
    got = {r.event_type: r for r in _run("event_value_theil_sen", spark)}
    assert set(got) == set(daily)
    for t, days in daily.items():
        ds = sorted(days)
        mv = {d: math.fsum(days[d]) / len(days[d]) for d in ds}
        slopes = [
            (mv[b] - mv[a]) / (b - a).days
            for i, a in enumerate(ds)
            for b in ds[i + 1:]
        ]
        slopes.sort()
        r = got[t]
        assert r.n_pairs == len(slopes)
        assert r.slope_per_day == pytest.approx(
            _r(_quantile_cont(slopes, 0.5), 4), abs=1e-9
        )


def test_mutual_info_vs_pure_cell_walk(spark, events):
    """I(type; hour) = Σ (c/n)·ln(c·n/(cx·cy)) over the contingency
    cells (fsum; 6dp absorbs)."""
    j: dict = defaultdict(int)
    for _e, _u, t, _v, _ts, _d, h in events:
        j[(t, h)] += 1
    n = sum(j.values())
    cx: dict = defaultdict(int)
    cy: dict = defaultdict(int)
    for (t, h), c in j.items():
        cx[t] += c
        cy[h] += c
    mi = math.fsum(
        (c / n) * math.log(c * n / (cx[t] * cy[h]))
        for (t, h), c in j.items()
    )
    got = _run("event_type_hour_mutual_info", spark)
    assert len(got) == 1
    assert got[0].n_cells == len(j)
    assert got[0].mutual_info == pytest.approx(_r(mi, 6), abs=1e-9)
    assert got[0].mutual_info >= 0 or abs(got[0].mutual_info) < 1e-6


def test_chisq_cramers_vs_pure_cell_walk(spark):
    """χ² via the Σo²·n/(r·c) − n identity and Cramér's V (fsum; the
    4/6dp rounds absorb)."""
    con = duckdb.connect()
    rows = con.execute(
        f"select o_orderpriority, o_orderstatus"
        f" from '{SF_DIR}/orders.parquet'"
    ).fetchall()
    con.close()
    obs: dict = defaultdict(float)
    for pr, st in rows:
        obs[(pr, st)] += 1.0
    rt: dict = defaultdict(float)
    ct: dict = defaultdict(float)
    for (pr, st), o in obs.items():
        rt[pr] += o
        ct[st] += o
    n = sum(obs.values())
    nr, nc = len(rt), len(ct)
    s = math.fsum(
        o * o * n / (rt[pr] * ct[st]) for (pr, st), o in obs.items()
    )
    chi2 = s - n
    got = _run("order_priority_chisq", spark)
    assert len(got) == 1
    r = got[0]
    assert (r.n, r.dof) == (int(n), (nr - 1) * (nc - 1))
    assert r.chi2 == pytest.approx(_r(chi2, 4), abs=1e-9)
    assert r.cramers_v == pytest.approx(
        _r(math.sqrt(chi2 / (n * min(nr - 1, nc - 1))), 6), abs=1e-9
    )


def test_spearman_vs_pure_midrank_walk(spark, events):
    """Tie-averaged ranks are exact dyadic halves; the Pearson formula
    on the midrank sums is exact up to the final fixed-order doubles."""
    per_type: dict = defaultdict(list)
    for _e, _u, t, v, _ts, _d, h in events:
        per_type[t].append((h, v))
    got = {r.event_type: r for r in _run("event_value_spearman", spark)}
    assert set(got) == set(per_type)
    for t, pairs in per_type.items():
        n = len(pairs)

        def midranks(key_idx):
            cnt: dict = defaultdict(int)
            for p in pairs:
                cnt[p[key_idx]] += 1
            out = {}
            cum = 0
            for k in sorted(cnt):
                c = cnt[k]
                # rank() = count strictly below + 1; midrank adds (c-1)/2
                out[k] = cum + 1 + (c - 1) / 2.0
                cum += c
            return out

        rx_map, ry_map = midranks(0), midranks(1)
        rx = [rx_map[h] for h, _v in pairs]
        ry = [ry_map[v] for _h, v in pairs]
        sxy = math.fsum(a * b for a, b in zip(rx, ry))
        sx, sy = math.fsum(rx), math.fsum(ry)
        sxx = math.fsum(a * a for a in rx)
        syy = math.fsum(b * b for b in ry)
        rho = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        r = got[t]
        assert r.n == n
        assert r.spearman == pytest.approx(_r(rho, 4), abs=1e-9)
        assert -1.0 <= r.spearman <= 1.0


def test_woe_bins_vs_pure_decile_walk(spark, events):
    """Decile bounds by linear-interpolated quantiles, bin by
    count-of-bounds-below, then the ±0.5-smoothed WOE/IV closed form."""
    vals = sorted(v for _e, _u, _t, v, _ts, _d, _h in events)
    bounds = [_quantile_cont(vals, i / 10.0) for i in range(1, 10)]
    agg: dict = defaultdict(lambda: [0, 0])
    for _e, _u, t, v, _ts, _d, _h in events:
        b = sum(1 for x in bounds if v > x) + 1
        agg[b][0] += 1
        agg[b][1] += 1 if t == "purchase" else 0
    tg = sum(g for _n, g in agg.values())
    tb = sum(n - g for n, g in agg.values())
    got = _run("event_value_woe_bins", spark)
    assert [r.bin for r in got] == sorted(agg)
    for r in got:
        n_b, good = agg[r.bin]
        bad = n_b - good
        pg = (good + 0.5) / (tg + 0.5)
        pb = (bad + 0.5) / (tb + 0.5)
        assert (r.n, r.n_good, r.n_bad) == (n_b, good, bad)
        assert r.woe == pytest.approx(_r(math.log(pg / pb), 6), abs=1e-9)
        assert r.iv_contrib == pytest.approx(
            _r((pg - pb) * math.log(pg / pb), 6), abs=1e-9
        )

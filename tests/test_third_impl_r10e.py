"""Third-implementation checks, batch 5: pure-Python imperative
references (duckdb used only as a reader) for the time-series and
distribution-shape families — STL-lite seasonal decomposition (the
integer-micro pipeline walked literally), Fano burstiness, the Zipf
log-log OLS over the top-200 token grid, lag-k autocorrelation in
per-type (ts, event_id) order, the t-closeness release audit's
total-variation identity, and the Benford leading-digit screen's
integer-cents digit rule.
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


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"select event_id, event_type, value, ts"
        f" from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def test_stl_vs_pure_integer_micro_walk(spark, events):
    """The whole STL-lite pipeline on exact integers: hourly micro
    means, centered 25-hour moving sum (full windows only), detrended
    dmu = 25·vmu − tsum, per-hour-of-day seasonal sr8 = round(4·Σ/n),
    centering by c/24, and the mean-abs remainder."""
    hours: dict = defaultdict(list)
    for _e, _t, v, ts in events:
        hours[ts.replace(minute=0, second=0, microsecond=0)].append(v)
    hs = sorted(hours)
    vmu = {h: int(_r(math.fsum(hours[h]) / len(hours[h]) * 1e6, 0)) for h in hs}
    de = []  # (hod, dmu) where the 25-row centered window is full
    for i, h in enumerate(hs):
        if i - 12 < 0 or i + 12 >= len(hs):
            continue
        tsum = sum(vmu[hs[j]] for j in range(i - 12, i + 13))
        de.append((h.hour, 25 * vmu[h] - tsum))
    sraw: dict = defaultdict(lambda: [0, 0])
    for hod, dmu in de:
        sraw[hod][0] += dmu
        sraw[hod][1] += 1
    sr8 = {hod: int(_r(4.0 * s / n, 0)) for hod, (s, n) in sraw.items()}
    c_num = sum(sr8.values())
    got = _run("event_hourly_stl_decompose", spark)
    assert [r.hour_of_day for r in got] == sorted(sraw)
    for r in got:
        hod = r.hour_of_day
        s, n = sraw[hod]
        assert r.n_obs == n
        assert r.seasonal == pytest.approx(
            _r((sr8[hod] - c_num / 24.0) / 1e8, 6), abs=1e-9
        )
        rem = sum(
            abs(int(_r(4.0 * dmu - sr8[hod] + c_num / 24.0, 0)))
            for h2, dmu in de
            if h2 == hod
        )
        assert r.mean_abs_remainder == pytest.approx(
            _r(rem / (n * 1.0e8), 4), abs=1e-9
        )


def test_fano_vs_pure_dispersion_walk(spark, events):
    """Hourly arrival counts per type (PRESENT hours only — no
    zero-fill, the entry's documented grain), then var_samp/mean."""
    cnt: dict = defaultdict(int)
    for _e, t, _v, ts in events:
        cnt[(t, ts.replace(minute=0, second=0, microsecond=0))] += 1
    by_type: dict = defaultdict(list)
    for (t, _h), c in cnt.items():
        by_type[t].append(float(c))
    got = {r.event_type: r for r in _run("event_type_burstiness", spark)}
    assert set(got) == set(by_type)
    for t, cs in by_type.items():
        n = len(cs)
        m = math.fsum(cs) / n
        v = math.fsum((c - m) ** 2 for c in cs) / (n - 1)
        r = got[t]
        assert r.n_hours == n
        assert r.mean_per_hour == pytest.approx(_r(m, 4), abs=1e-9)
        assert r.fano == pytest.approx(_r(v / m, 4), abs=1e-9)


def test_zipf_vs_pure_loglog_ols(spark):
    """Token frequencies, top-200 under (f desc, token), OLS on
    (ln rank, ln f) with the closed-form slope/intercept/r²."""
    con = duckdb.connect()
    texts = [
        t for (t,) in con.execute(
            f"select text from '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]
    con.close()
    freq: dict = defaultdict(int)
    for txt in texts:
        for tok in re.split(r"\W+", txt.lower()):
            if tok:
                freq[tok] += 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    pts = [
        (math.log(i + 1), math.log(float(f))) for i, (_t, f) in enumerate(top)
    ]
    n = float(len(pts))
    sx = math.fsum(x for x, _y in pts)
    sy = math.fsum(y for _x, y in pts)
    sxx = math.fsum(x * x for x, _y in pts)
    syy = math.fsum(y * y for _x, y in pts)
    sxy = math.fsum(x * y for x, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    got = _run("corpus_zipf_fit", spark)
    assert len(got) == 1
    r = got[0]
    assert r.n_tokens == len(pts)
    assert r.slope == pytest.approx(_r(slope, 4), abs=1e-9)
    assert r.intercept == pytest.approx(_r((sy - sx * slope) / n, 4), abs=1e-9)
    assert r.r2 == pytest.approx(
        _r((n * sxy - sx * sy) ** 2
           / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4),
        abs=1e-9,
    )
    assert r.slope < 0  # a frequency-ranked curve must fall


def test_lag_autocorr_vs_pure_pearson(spark, events):
    """Per-type (ts, event_id)-ordered series; lag-1/lag-2 Pearson over
    the non-null pairs only (SQL corr's null semantics)."""
    per_type: dict = defaultdict(list)
    for eid, t, v, ts in events:
        per_type[t].append((ts, eid, v))

    def corr(pairs):
        n = len(pairs)
        mx = math.fsum(a for a, _b in pairs) / n
        my = math.fsum(b for _a, b in pairs) / n
        cov = math.fsum((a - mx) * (b - my) for a, b in pairs)
        vx = math.fsum((a - mx) ** 2 for a, _b in pairs)
        vy = math.fsum((b - my) ** 2 for _a, b in pairs)
        return cov / math.sqrt(vx * vy)

    got = {r.event_type: r for r in _run("event_value_lag_autocorr", spark)}
    assert set(got) == set(per_type)
    for t, rows in per_type.items():
        rows.sort(key=lambda x: (x[0], x[1]))
        vs = [v for _ts, _e, v in rows]
        p1 = list(zip(vs[1:], vs[:-1]))
        p2 = list(zip(vs[2:], vs[:-2]))
        r = got[t]
        assert r.n_events == len(vs)
        assert r.lag1_autocorr == pytest.approx(_r(corr(p1), 4), abs=1e-9)
        assert r.lag2_autocorr == pytest.approx(_r(corr(p2), 4), abs=1e-9)


def test_t_closeness_vs_pure_tv_identity(spark):
    """Per-QI-group total variation vs the global segment mix via the
    present-terms + absent-mass identity."""
    con = duckdb.connect()
    rows = con.execute(
        f"select c_nationkey, c_acctbal, c_mktsegment"
        f" from '{SF_DIR}/customer.parquet'"
    ).fetchall()
    con.close()
    n_all = len(rows)
    gshare: dict = defaultdict(int)
    groups: dict = defaultdict(lambda: defaultdict(int))
    for nk, bal, seg in rows:
        gshare[seg] += 1
        groups[(nk, int(math.floor(bal / 1000)))][seg] += 1
    gsh = {s: c / float(n_all) for s, c in gshare.items()}
    got = {(r.nation, r.bal_band): r for r in _run("customer_t_closeness", spark)}
    assert set(got) == set(groups)
    for key, segs in groups.items():
        n_g = sum(segs.values())
        present = math.fsum(
            abs(c / float(n_g) - gsh[s]) for s, c in segs.items()
        )
        absent = 1.0 - math.fsum(gsh[s] for s in segs)
        r = got[key]
        assert r.n_customers == n_g
        assert r.t_distance == pytest.approx(
            _r(0.5 * (present + absent), 4), abs=1e-9
        )
        assert 0.0 <= r.t_distance <= 1.0


def test_benford_vs_pure_digit_walk(spark):
    """Leading digit from integer cents (floor(x·100) string head, the
    cross-engine rule), frequencies and chi2 terms closed-form."""
    con = duckdb.connect()
    prices = [
        p for (p,) in con.execute(
            f"select o_totalprice from '{SF_DIR}/orders.parquet'"
        ).fetchall()
    ]
    con.close()
    digits: dict = defaultdict(int)
    total = 0
    for p in prices:
        cents = int(math.floor(p * 100))
        if cents >= 1:
            digits[int(str(cents)[0])] += 1
            total += 1
    got = _run("order_benford_digits", spark)
    assert [r.digit for r in got] == sorted(digits)
    for r in got:
        n_obs = digits[r.digit]
        ef = math.log10(1.0 + 1.0 / r.digit)
        assert r.n_obs == n_obs
        assert r.obs_freq == pytest.approx(_r(n_obs / float(total), 6), abs=1e-9)
        assert r.exp_freq == pytest.approx(_r(ef, 6), abs=1e-9)
        assert r.chi2_term == pytest.approx(
            _r((n_obs - total * ef) ** 2 / (total * ef), 4), abs=1e-9
        )

"""Third-implementation checks, batch 3: pure-Python imperative
references for the remaining high-restatement-risk batch families the
first two batches didn't reach (duckdb used only as a reader) —

- Poisson-bootstrap CI (the md5 inverse-CDF weight device replicated
  bit-for-bit; B=32 replicate means walked as dict folds),
- Haar energy (the exact integer pyramid computed as the LITERAL
  pairwise recursion — the engine runs the telescoped signed-sum fold,
  the oracle a recursive CTE; this walks the textbook cascade),
- first-harmonic diurnal fit (closed-form least squares recomputed
  from integer-micro hourly means),
- SPRT decision walk (sequential LLR fold in engine term order),
- HHI/CR4 market concentration (exact-decimal revenue, double shares),
- A/B power MDE (per-arm moments via fsum under the 6dp contract).
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entry.queries()


def _r(x: float, dp: int) -> float:
    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"select event_id, user_id, event_type, value, ts,"
        f" cast(ts as date) as day from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def _unit_hash(key, salt):
    h = hashlib.md5(f"{salt}-{key}".encode()).hexdigest()[:6]
    return (int(h, 16) + 0.5) / float(16**6)


_POIS_CUM = [
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253,
]


def test_bootstrap_ci_vs_pure_weight_walk(spark, events):
    """Every (event, replicate) weight re-drawn from the md5 uniform by
    the same inverse-CDF case cascade; replicate means fsum'd (the 6dp
    round absorbs partial-sum order); percentile interpolation at the
    engines' precomputed (index, fraction) literals."""
    B = 32
    wsum: dict = defaultdict(float)   # (etype, b) -> sum w*value
    wcnt: dict = defaultdict(int)     # (etype, b) -> sum w
    obs: dict = defaultdict(list)
    for eid, _u, etype, v, _ts, _d in events:
        obs[etype].append(v)
        for b in range(B):
            u = _unit_hash(f"{eid}-{b}", "boot")
            w = 8
            for k, c in enumerate(_POIS_CUM):
                if u < c:
                    w = k
                    break
            if w:
                wsum[(etype, b)] += w * v
                wcnt[(etype, b)] += w
    got = {r.event_type: r for r in _run("event_value_bootstrap_ci", spark)}
    assert set(got) == set(obs)
    lo1, f1 = 1, (B - 1) * 0.025 + 1 - 1
    lo2, f2 = 31, (B - 1) * 0.975 + 1 - 31
    for etype, vals in obs.items():
        ms = sorted(
            wsum[(etype, b)] / float(wcnt[(etype, b)]) for b in range(B)
        )
        ci_lo = ms[lo1 - 1] + f1 * (ms[lo1] - ms[lo1 - 1])
        ci_hi = ms[lo2 - 1] + f2 * (ms[lo2] - ms[lo2 - 1])
        r = got[etype]
        assert r.n == len(vals)
        assert r.mean_obs == pytest.approx(
            _r(math.fsum(vals) / len(vals), 6), abs=1e-9
        )
        assert r.ci_lo == pytest.approx(_r(ci_lo, 6), abs=1e-9)
        assert r.ci_hi == pytest.approx(_r(ci_hi, 6), abs=1e-9)
        assert r.ci_lo < r.mean_obs < r.ci_hi


def test_haar_energy_vs_pure_pairwise_cascade(spark, events):
    """The engine telescopes all 9 levels into one signed-sum fold;
    this reference runs the TEXTBOOK pairwise recursion (a_even ±
    a_odd, level by level) on exact integers — the identity the fold
    rewrite claimed is exercised end-to-end."""
    t0 = min(ts for _e, _u, _t, _v, ts, _d in events)
    import calendar

    def epoch(ts):
        return calendar.timegm(ts.timetuple())

    e0 = epoch(t0)
    counts = [0] * 512
    for _e, _u, _t, _v, ts, _d in events:
        h = (epoch(ts) - e0) // 3600
        if 0 <= h < 512:
            counts[h] += 1
    a = counts
    want = {}
    for lv in range(1, 10):
        d = [a[2 * i] - a[2 * i + 1] for i in range(len(a) // 2)]
        a = [a[2 * i] + a[2 * i + 1] for i in range(len(a) // 2)]
        want[lv] = (len(d), sum(x * x for x in d))
    got = _run("event_hourly_haar_energy", spark)
    assert [r.level for r in got] == list(range(1, 10))
    for r in got:
        n_coeffs, energy = want[r.level]
        assert (r.n_coeffs, r.energy) == (n_coeffs, energy)


def test_harmonic_fit_vs_pure_closed_form(spark, events):
    """Hourly integer-micro means → cos/sin regressors → the 6dp-sum /
    closed-form coefficient arithmetic replayed literally."""
    hourly: dict = defaultdict(list)
    for _e, _u, _t, v, ts, _d in events:
        hourly[ts.replace(minute=0, second=0, microsecond=0)].append(v)
    terms = []
    for h, vs in hourly.items():
        vmu = int(_r(math.fsum(vs) / len(vs) * 1e6, 0))
        v = vmu / 1e6
        ang = 2 * math.pi * h.hour / 24.0
        terms.append((v, math.cos(ang), math.sin(ang)))
    n = len(terms)
    sv = _r(math.fsum(t[0] for t in terms), 6)
    svc = _r(math.fsum(t[0] * t[1] for t in terms), 6)
    svs = _r(math.fsum(t[0] * t[2] for t in terms), 6)
    scc = _r(math.fsum(t[1] * t[1] for t in terms), 6)
    sss = _r(math.fsum(t[2] * t[2] for t in terms), 6)
    svv = _r(math.fsum(t[0] * t[0] for t in terms), 6)
    a = svc / scc
    b = svs / sss
    got = _run("event_hourly_harmonic_fit", spark)
    assert len(got) == 1
    r = got[0]
    assert r.n_hours == n
    assert r.mean_value == pytest.approx(_r(sv / n, 4), abs=1e-9)
    assert r.a_cos == pytest.approx(_r(a, 4), abs=1e-9)
    assert r.b_sin == pytest.approx(_r(b, 4), abs=1e-9)
    assert r.amplitude == pytest.approx(
        _r(math.sqrt(a * a + b * b), 4), abs=1e-9
    )
    assert r.r2 == pytest.approx(
        _r((a * a * scc + b * b * sss) / (svv - sv * sv / n), 4), abs=1e-9
    )


def test_sprt_walk_vs_pure_sequential_fold(spark, events):
    """The B arm's daily LLR walk folded in engine term order (each
    day's n_purch·ln(p1/p0) + (n−n_purch)·ln((1−p1)/(1−p0)) added
    sequentially — the cumulative window's exact op order)."""
    p0, p1 = 0.19, 0.21
    la = math.log(p1 / p0)
    lb = math.log((1 - p1) / (1 - p0))
    bound = math.log(19.0)
    days: dict = defaultdict(lambda: [0, 0])
    for _e, u, etype, _v, _ts, d in events:
        if _unit_hash(u, "sprt") >= 0.5:
            days[d][0] += 1
            days[d][1] += 1 if etype == "purchase" else 0
    got = _run("ab_sprt_daily_decision", spark)
    assert [r.day for r in got] == [
        d.strftime("%Y-%m-%d") for d in sorted(days)
    ]
    s = 0.0
    for r, d in zip(got, sorted(days)):
        ne, np_ = days[d]
        s += np_ * la + (ne - np_) * lb
        cum = _r(s, 6)
        assert (r.n_events, r.n_purchases) == (ne, np_)
        assert r.cum_llr == pytest.approx(cum, abs=1e-9)
        want_dec = (
            "accept_h1" if cum >= bound
            else ("accept_h0" if cum <= -bound else "continue")
        )
        assert r.decision == want_dec


def test_hhi_cr4_vs_pure_decimal_walk(spark):
    """Per-supplier revenue in exact decimal(19,4) products; shares as
    double casts of exact decimals; HHI fsum'd (6dp absorbs); CR4 rank
    on the exact decimal."""
    con = duckdb.connect()
    li = con.execute(
        f"select l_suppkey, l_extendedprice, l_discount"
        f" from '{SF_DIR}/lineitem.parquet'"
    ).fetchall()
    supnat = dict(
        con.execute(
            f"select s_suppkey, n_name from '{SF_DIR}/supplier.parquet' s"
            f" join '{SF_DIR}/nation.parquet' n"
            f" on s.s_nationkey = n.n_nationkey"
        ).fetchall()
    )
    con.close()
    q4 = Decimal(1).scaleb(-4)
    rev: dict = defaultdict(lambda: Decimal(0))
    for sk, px, disc in li:
        p = Decimal(repr(px)).quantize(q4, rounding=ROUND_HALF_UP)
        d = Decimal(repr(disc)).quantize(q4, rounding=ROUND_HALF_UP)
        rev[(supnat[sk], sk)] += p * (1 - d)
    by_nation: dict = defaultdict(list)
    for (nat, sk), r in rev.items():
        by_nation[nat].append((r, sk))
    got = {r.nation: r for r in _run("nation_supplier_concentration", spark)}
    assert set(got) == set(by_nation)
    for nat, rows in by_nation.items():
        tot = sum(r for r, _sk in rows)
        shares = [float(r) / float(tot) for r, _sk in rows]
        ranked = sorted(rows, key=lambda t: (-t[0], t[1]))
        cr4 = math.fsum(float(r) / float(tot) for r, _sk in ranked[:4])
        g = got[nat]
        assert g.n_suppliers == len(rows)
        assert g.hhi == pytest.approx(
            _r(math.fsum(s * s for s in shares), 6), abs=1e-9
        )
        assert g.cr4_share == pytest.approx(_r(cr4, 6), abs=1e-9)


def test_mde_vs_pure_moment_walk(spark, events):
    """Per-arm sample variances via fsum of squared deviations (the
    6dp round absorbs partial-sum order), then the closed-form MDE
    from the engines' shared z literals."""
    za, zp = 1.959963984540054, 0.8416212335729143
    arms: dict = defaultdict(list)
    for _e, u, _t, v, _ts, _d in events:
        arms["A" if u % 2 == 0 else "B"].append(v)
    na, nb = len(arms["A"]), len(arms["B"])
    mean_a = _r(math.fsum(arms["A"]) / na, 6)
    def var_samp(xs):
        m = math.fsum(xs) / len(xs)
        return _r(math.fsum((x - m) ** 2 for x in xs) / (len(xs) - 1), 6)
    va, vb = var_samp(arms["A"]), var_samp(arms["B"])
    mde = (za + zp) * math.sqrt(va / na + vb / nb)
    got = _run("ab_power_mde", spark)
    assert len(got) == 1
    r = got[0]
    assert (r.n_a, r.n_b) == (na, nb)
    assert r.mean_a == pytest.approx(mean_a, abs=1e-9)
    assert r.mde_abs == pytest.approx(_r(mde, 6), abs=1e-9)
    assert r.mde_rel == pytest.approx(_r(mde / mean_a, 6), abs=1e-9)

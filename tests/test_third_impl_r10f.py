"""Third-implementation checks, batch 6: pure-Python imperative
references (duckdb used only as a reader) for the remaining
arithmetic-dense utility families — interarrival exponential fit (gap
grid + KS vs the fitted CDF), conversion-latency exact lower quantiles
(integer cross-multiplication), the seeded-Laplace DP release (md5
uniform → inverse-CDF noise, bit-for-bit), the l-diversity audit, TWAP
holding-interval weighting, and market-basket lift over user-day
baskets.
"""

from __future__ import annotations

import calendar
import hashlib
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
        f"select event_id, user_id, event_type, value, ts,"
        f" cast(ts as date) as day from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def test_interarrival_fit_vs_pure_gap_walk(spark):
    """Per-customer day gaps, pooled MLE rate, KS at the integer-bin
    right edges (day+1) against 1 − e^{−t/mean}."""
    con = duckdb.connect()
    rows = con.execute(
        f"select o_custkey, o_orderkey, cast(o_orderdate as date)"
        f" from '{SF_DIR}/orders.parquet'"
    ).fetchall()
    con.close()
    per_c: dict = defaultdict(list)
    for ck, ok, d in rows:
        per_c[ck].append((d, ok))
    gaps = []
    for seq in per_c.values():
        seq.sort()
        gaps.extend((b[0] - a[0]).days for a, b in zip(seq, seq[1:]))
    n = len(gaps)
    mean_gap = _r(math.fsum(g * 1.0 for g in gaps) / n, 6)
    dist: dict = defaultdict(int)
    for g in gaps:
        dist[g] += 1
    cum = 0
    d_max = 0.0
    for g in sorted(dist):
        cum += dist[g]
        d_max = max(
            d_max, abs(cum / (n * 1.0) - (1 - math.exp(-(g + 1) / mean_gap)))
        )
    got = _run("order_interarrival_fit", spark)
    assert len(got) == 1
    r = got[0]
    assert r.n_gaps == n
    assert r.mean_gap_days == pytest.approx(mean_gap, abs=1e-9)
    assert r.lambda_per_day == pytest.approx(_r(1 / mean_gap, 6), abs=1e-9)
    assert r.ks_distance == pytest.approx(_r(d_max, 4), abs=1e-9)


def test_latency_quantiles_vs_pure_cross_mult(spark, events):
    """Signup → first purchase minutes; exact lower quantiles via the
    cum·k ≥ n·j integer inequalities — no interpolation, no floats."""
    signup: dict = {}
    for _e, u, t, _v, ts, _d in events:
        if t == "signup" and (u not in signup or ts < signup[u]):
            signup[u] = ts
    first_p: dict = {}
    for _e, u, t, _v, ts, _d in events:
        if t == "purchase" and u in signup and ts >= signup[u]:
            if u not in first_p or ts < first_p[u]:
                first_p[u] = ts
    lats = sorted(
        int((first_p[u] - signup[u]).total_seconds() // 60) for u in first_p
    )
    n = len(lats)

    def lower_q(num, den):
        cum = 0
        cnt: dict = defaultdict(int)
        for v in lats:
            cnt[v] += 1
        for v in sorted(cnt):
            cum += cnt[v]
            if cum * den >= n * num:
                return v
        return None

    got = _run("signup_purchase_latency_quantiles", spark)
    assert len(got) == 1
    r = got[0]
    assert r.n_converted == n
    assert r.p25_min == lower_q(1, 4)
    assert r.p50_min == lower_q(1, 2)
    assert r.p75_min == lower_q(3, 4)
    assert r.p90_min == lower_q(9, 10)
    assert r.p25_min <= r.p50_min <= r.p75_min <= r.p90_min


def _unit_hash(key, salt):
    h = hashlib.md5(f"{salt}-{key}".encode()).hexdigest()[:6]
    return (int(h, 16) + 0.5) / float(16**6)


def test_dp_laplace_vs_pure_inverse_cdf(spark):
    """Seeded Laplace: u from md5, noise = −(1/ε)·sign(u−.5)·
    ln(1−2|u−.5|) — every step replicated bit-for-bit."""
    con = duckdb.connect()
    rows = con.execute(
        f"select c_nationkey, count(*) from '{SF_DIR}/customer.parquet'"
        f" group by 1"
    ).fetchall()
    con.close()
    want = {}
    for nk, n in rows:
        u = _unit_hash(nk, "dp")
        noise = (-1.0 / 1.0) * math.copysign(1.0, u - 0.5) * math.log(
            1.0 - 2.0 * abs(u - 0.5)
        )
        want[nk] = (n, _r(n + noise, 4))
    got = _run("nation_dp_customer_counts", spark)
    assert [r.nationkey for r in got] == sorted(want)
    for r in got:
        n, dp_n = want[r.nationkey]
        assert r.n == n
        assert r.dp_n == pytest.approx(dp_n, abs=1e-9)


def test_l_diversity_vs_pure_group_walk(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select c_nationkey, c_acctbal, c_mktsegment"
        f" from '{SF_DIR}/customer.parquet'"
    ).fetchall()
    con.close()
    g: dict = defaultdict(lambda: defaultdict(int))
    for nk, bal, seg in rows:
        g[(nk, int(math.floor(bal / 1000)))][seg] += 1
    got = {(r.nation, r.bal_band): r for r in _run("customer_l_diversity", spark)}
    assert set(got) == set(g)
    for key, segs in g.items():
        n = sum(segs.values())
        r = got[key]
        assert r.n_customers == n
        assert r.l_distinct == len(segs)
        assert r.dominant_share == pytest.approx(
            _r(max(segs.values()) / float(n), 4), abs=1e-9
        )


def test_twap_vs_pure_holding_intervals(spark, events):
    """Each reading weighted by floor-seconds gap to the next event;
    zero-length holds and the open last reading excluded."""
    per_u: dict = defaultdict(list)
    for eid, u, _t, v, ts, _d in events:
        per_u[u].append((ts, eid, v))
    want = {}
    for u, rows in per_u.items():
        rows.sort(key=lambda x: (x[0], x[1]))
        ivs = []
        for (ts1, _e1, v1), (ts2, _e2, _v2) in zip(rows, rows[1:]):
            t1 = calendar.timegm(ts1.timetuple())
            t2 = calendar.timegm(ts2.timetuple())
            if t2 > t1:
                ivs.append((v1, t2 - t1))
        if not ivs:
            continue
        num = math.fsum(v * d for v, d in ivs)
        den = sum(d for _v, d in ivs)
        want[u] = (
            len(ivs),
            _r(num / den, 4),
            _r(math.fsum(v for v, _d in ivs) / len(ivs), 4),
        )
    got = {r.user_id: r for r in _run("user_value_twap", spark)}
    assert set(got) == set(want)
    for u, (k, twap, avg) in want.items():
        r = got[u]
        assert r.n_intervals == k
        assert r.twap == pytest.approx(twap, abs=1e-9)
        assert r.plain_avg == pytest.approx(avg, abs=1e-9)


def test_basket_lift_vs_pure_count_walk(spark, events):
    """User-day distinct-type baskets; lift = c_ab·n/(c_a·c_b) on exact
    integer counts."""
    baskets: dict = defaultdict(set)
    for _e, u, t, _v, _ts, d in events:
        baskets[(u, d)].add(t)
    n = len(baskets)
    item: dict = defaultdict(int)
    pair: dict = defaultdict(int)
    for types in baskets.values():
        ts_sorted = sorted(types)
        for t in ts_sorted:
            item[t] += 1
        for i, a in enumerate(ts_sorted):
            for b in ts_sorted[i + 1:]:
                pair[(a, b)] += 1
    got = _run("session_event_type_lift", spark)
    assert [(r.type_a, r.type_b) for r in got] == sorted(pair)
    for r in got:
        c_ab = pair[(r.type_a, r.type_b)]
        assert r.c_ab == c_ab
        assert r.lift == pytest.approx(
            _r(c_ab * n / (item[r.type_a] * item[r.type_b]), 4), abs=1e-9
        )

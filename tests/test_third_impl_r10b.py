"""Third-implementation checks for the entries whose PLANS were
rewritten in round 10 (the ranged prefix-sum refits and the exchange
compressions): each test recomputes the answer in PLAIN IMPERATIVE
PYTHON from the parquet (duckdb used only as a reader) and asserts the
Spark entry matches. The hash-identity checks proved the rewrites
didn't drift AT the rewrite moment; these references make that
protection permanent and independent of both relational engines.

Families covered: Mann–Whitney U / Kruskal–Wallis H (ranged midranks),
the blocked runs test (ranged median), Gini + top-decile share (ranged
global rank), ABC classification (ranged running revenue, exact cents),
split-conformal intervals (compressed count-grid plan; md5 unit-hash
split replicated bit-for-bit), the Markov stationary walk (compressed
driver-side power iteration), and the delete-one-nation jackknife
(compressed window form, exact integer cents).
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

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


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"select event_id, user_id, event_type, value, ts"
        f" from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def _midranks(counts):
    """Pooled tie-averaged ranks over a {value: cnt} dict → {value:
    (cnt, midrank)} — the cumulative identity cum − cnt + (cnt+1)/2,
    exact dyadic halves like both engines."""
    out = {}
    cum = 0
    for v in sorted(counts):
        cnt = counts[v]
        cum += cnt
        out[v] = (cnt, cum - cnt + (cnt + 1) / 2.0)
    return out


def test_mann_whitney_vs_pure_rank_walk(spark, events):
    """U, tie-corrected z and rank-biserial recomputed from an
    imperative pooled-midrank walk. Every sum term is an exact dyadic
    (half-integer × integer), so the aggregate is order-independent and
    the reference is airtight up to the final fixed-order double ops."""
    counts: dict = defaultdict(int)
    clicks: dict = defaultdict(int)
    for _eid, _u, etype, v, _ts in events:
        if etype in ("click", "view"):
            counts[v] += 1
            if etype == "click":
                clicks[v] += 1
    ranks = _midranks(counts)
    n1 = sum(clicks.values())
    n = sum(counts.values())
    r1 = math.fsum(ranks[v][1] * c1 for v, c1 in clicks.items())
    tsum = sum(c * c * c - c for c in counts.values())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    sigma = math.sqrt(
        n1 * (n - n1) / 12.0 * ((n + 1) - tsum / (n * (n - 1.0)))
    )
    got = _run("event_value_mann_whitney", spark)
    assert len(got) == 1
    row = got[0]
    assert (row.n_click, row.n_view) == (n1, n - n1)
    assert row.u_click == pytest.approx(_r(u1, 2), abs=1e-9)
    assert row.z == pytest.approx(
        _r((u1 - n1 * (n - n1) / 2.0) / sigma, 4), abs=1e-9
    )
    assert row.rank_biserial == pytest.approx(
        _r(2.0 * u1 / (n1 * (n - n1)) - 1, 4), abs=1e-9
    )


def test_kruskal_wallis_vs_pure_rank_walk(spark, events):
    """H and the tie-adjusted H from per-type rank sums over the pooled
    midranks (rank sums are exact dyadic; rterm's ≤|types| division
    terms fsum'd — the 4dp round absorbs the ulp)."""
    counts: dict = defaultdict(int)
    by_type: dict = defaultdict(lambda: defaultdict(int))
    for _eid, _u, etype, v, _ts in events:
        counts[v] += 1
        by_type[etype][v] += 1
    ranks = _midranks(counts)
    rg = {
        t: (
            math.fsum(ranks[v][1] * c for v, c in vs.items()),
            sum(vs.values()),
        )
        for t, vs in by_type.items()
    }
    k = len(rg)
    n = sum(ng for _rs, ng in rg.values())
    rterm = math.fsum(rs * rs / ng for rs, ng in rg.values())
    tsum = sum(c * c * c - c for c in counts.values())
    h = 12.0 / (n * (n + 1)) * rterm - 3 * (n + 1)
    got = _run("event_type_kruskal_wallis", spark)
    assert len(got) == 1
    row = got[0]
    assert (row.k_groups, row.n) == (k, n)
    assert row.h == pytest.approx(_r(h, 4), abs=1e-9)
    assert row.h_adj == pytest.approx(
        _r(h / (1 - tsum / (n * n * n - n * 1.0)), 4), abs=1e-9
    )


def test_runs_test_vs_pure_blocked_walk(spark, events):
    """Global lower-median from the distinct-value cumulative counts,
    then each user's above/below sequence walked imperatively for runs
    and pooled moments (per-user moment terms fsum'd; 4dp absorbs)."""
    counts: dict = defaultdict(int)
    for _eid, _u, _t, v, _ts in events:
        counts[v] += 1
    n_all = sum(counts.values())
    cum = 0
    median = None
    for v in sorted(counts):
        cum += counts[v]
        if cum * 2 >= n_all:
            median = v
            break
    per_user: dict = defaultdict(list)
    for eid, u, _t, v, ts in events:
        per_user[u].append((ts, eid, 1 if v > median else 0))
    n_users = n_runs = 0
    e_terms, v_terms = [], []
    for u, seq in per_user.items():
        seq.sort()
        bits = [b for _ts, _eid, b in seq]
        n1 = sum(bits)
        n0 = len(bits) - n1
        if n1 == 0 or n0 == 0:
            continue
        runs = 1 + sum(1 for a, b in zip(bits, bits[1:]) if a != b)
        n_users += 1
        n_runs += runs
        e_terms.append(2.0 * n1 * n0 / (n1 + n0) + 1)
        v_terms.append(
            2.0 * n1 * n0 * (2.0 * n1 * n0 - n1 - n0)
            / ((n1 + n0) * (n1 + n0) * (n1 + n0 - 1.0))
        )
    e_runs = math.fsum(e_terms)
    got = _run("event_value_runs_test", spark)
    assert len(got) == 1
    row = got[0]
    assert (row.n_users, row.n_runs) == (n_users, n_runs)
    assert row.expected_runs == pytest.approx(_r(e_runs, 4), abs=1e-9)
    assert row.z == pytest.approx(
        _r((n_runs - e_runs) / math.sqrt(math.fsum(v_terms)), 4), abs=1e-9
    )


@pytest.fixture(scope="module")
def orders():
    con = duckdb.connect()
    rows = con.execute(
        f"select o_orderkey, o_custkey, o_totalprice"
        f" from '{SF_DIR}/orders.parquet'"
    ).fetchall()
    con.close()
    return rows


def test_gini_vs_pure_rank_formula(spark, orders):
    """G = 2·Σ(i·vᵢ)/(n·Σv) − (n+1)/n under the total (rev, custkey)
    order, walked over per-customer fsum revenues. Revenues are double
    SUMS (order-sensitive in the ulp), so the assertion tolerance is
    one unit in the 6th decimal rather than 1e-9 — rank swaps between
    ulp-equal neighbours cancel in Σi·v except at the decile fence."""
    rev: dict = defaultdict(list)
    for _ok, ck, px in orders:
        rev[ck].append(px)
    vals = sorted((math.fsum(v), k) for k, v in rev.items())
    n = len(vals)
    tot = math.fsum(v for v, _k in vals)
    snum = math.fsum((i + 1) * v for i, (v, _k) in enumerate(vals))
    fence = n - int(math.floor(n * 0.1))
    top = math.fsum(v for i, (v, _k) in enumerate(vals) if i + 1 > fence)
    got = _run("customer_revenue_gini", spark)
    assert len(got) == 1
    row = got[0]
    assert row.n_customers == n
    assert row.total_rev == pytest.approx(_r(tot, 2), abs=2e-2)
    assert row.gini == pytest.approx(
        _r(2.0 * snum / (n * tot) - (n + 1.0) / n, 6), abs=2e-6
    )
    assert row.top_decile_share == pytest.approx(
        _r(top / tot, 6), abs=2e-6
    )


@pytest.fixture(scope="module")
def lineitem():
    con = duckdb.connect()
    rows = con.execute(
        f"select l_partkey, l_extendedprice, l_discount"
        f" from '{SF_DIR}/lineitem.parquet'"
    ).fetchall()
    con.close()
    return rows


def test_abc_vs_pure_cents_walk(spark, lineitem):
    """Exact-integer reference: per-row floor(px·(1−disc)·100) is the
    same IEEE expression in Python, the cents sums and the running sum
    under (rev desc, partkey) are bigint — every class boundary is
    engine-identical, so the assertion is exact."""
    cents: dict = defaultdict(int)
    for pk, px, disc in lineitem:
        cents[pk] += int(math.floor(px * (1 - disc) * 100))
    ranked = sorted(cents.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cents.values())
    cum = 0
    by_class: dict = defaultdict(lambda: [0, 0])
    for pk, rc in ranked:
        cum += rc
        cls = "A" if cum <= 0.8 * total else ("B" if cum <= 0.95 * total else "C")
        by_class[cls][0] += 1
        by_class[cls][1] += rc
    got = _run("part_revenue_abc", spark)
    assert [r.abc_class for r in got] == sorted(by_class)
    for r in got:
        n_parts, c = by_class[r.abc_class]
        assert r.n_parts == n_parts
        assert r.revenue_share == pytest.approx(
            _r(c / float(total), 6), abs=1e-9
        )


def _unit_hash(key, salt):
    """operators.corpus_prep.unit_hash: first 6 md5 nibbles of
    'salt-key', midpoint-shifted, scaled to (0, 1)."""
    h = hashlib.md5(f"{salt}-{key}".encode()).hexdigest()[:6]
    return (int(h, 16) + 0.5) / float(16**6)


def test_conformal_vs_pure_split_walk(spark, events):
    """The full split-conformal pipeline walked imperatively: md5-hash
    three-way split, 6dp per-type train means (fsum stands in for the
    engines' partial sums; the round absorbs the ulp), exact-integer
    rank ⌈0.9(n+1)⌉ over 6dp residual counts, eval coverage."""
    train: dict = defaultdict(list)
    rest = []
    for eid, _u, etype, v, _ts in events:
        u = _unit_hash(eid, "conf")
        if u < 0.5:
            train[etype].append(v)
        else:
            rest.append((etype, v, u))
    mu = {t: _r(math.fsum(vs) / len(vs), 6) for t, vs in train.items()}
    cal: dict = defaultdict(lambda: defaultdict(int))
    ev: dict = defaultdict(list)
    for etype, v, u in rest:
        if etype not in mu:
            continue
        r = _r(abs(v - mu[etype]), 6)
        if u < 0.75:
            cal[etype][r] += 1
        else:
            ev[etype].append(r)
    want = {}
    for etype, dist in cal.items():
        if etype not in ev or not ev[etype]:
            continue
        n_cal = sum(dist.values())
        k = min((9 * (n_cal + 1) + 9) // 10, n_cal)
        cum = 0
        qhat = None
        for r in sorted(dist):
            cum += dist[r]
            if cum >= k:
                qhat = r
                break
        n_eval = len(ev[etype])
        cov = sum(1 for r in ev[etype] if r <= qhat)
        want[etype] = (n_cal, qhat, n_eval, _r(cov / (n_eval * 1.0), 4))
    got = _run("event_value_conformal", spark)
    assert [r.event_type for r in got] == sorted(want)
    for r in got:
        n_cal, qhat, n_eval, coverage = want[r.event_type]
        assert r.n_calib == n_cal
        assert r.qhat == pytest.approx(qhat, abs=1e-9)
        assert r.n_eval == n_eval
        assert r.coverage == pytest.approx(coverage, abs=1e-9)


def test_markov_stationary_vs_pure_walk(spark, events):
    """Transitions recounted from per-user (ts, event_id)-sorted
    sequences, then the identical 8-step rounded power iteration —
    guards the fact-side lead window the compressed plan kept."""
    per_user: dict = defaultdict(list)
    emp: dict = defaultdict(int)
    for eid, u, etype, _v, ts in events:
        per_user[u].append((ts, eid, etype))
        emp[etype] += 1
    trans: dict = defaultdict(int)
    for seq in per_user.values():
        seq.sort()
        for (_t1, _e1, a), (_t2, _e2, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    rowsum: dict = defaultdict(int)
    for (a, _b), c in trans.items():
        rowsum[a] += c
    pm = sorted((b, a, c / (rowsum[a] * 1.0)) for (a, b), c in trans.items())
    v = {t: 1.0 / len(rowsum) for t in rowsum}
    for _ in range(8):
        acc: dict = defaultdict(float)
        for nxt, cur, p in pm:
            if cur in v:
                acc[nxt] += v[cur] * p
        v = {t: _r(s, 8) for t, s in acc.items()}
    n_all = sum(emp.values())
    got = _run("event_type_markov_stationary", spark)
    assert [r.event_type for r in got] == sorted(set(emp) & set(v))
    for r in got:
        assert r.stationary_prob == pytest.approx(
            _r(v[r.event_type], 6), abs=1e-9
        )
        assert r.empirical_share == pytest.approx(
            _r(emp[r.event_type] / (n_all * 1.0), 6), abs=1e-9
        )


def test_jackknife_vs_pure_cents_walk(spark, orders):
    """θ₋ᵢ from exact integer cents (bit-identical across engines and
    this walk); θ̄ averages |nations| doubles (fsum; 4dp absorbs)."""
    con = duckdb.connect()
    cust_nat = dict(
        con.execute(
            f"select c_custkey, n_name"
            f" from '{SF_DIR}/customer.parquet' c"
            f" join '{SF_DIR}/nation.parquet' n"
            f" on c.c_nationkey = n.n_nationkey"
        ).fetchall()
    )
    con.close()
    s_cents: dict = defaultdict(int)
    n_i: dict = defaultdict(int)
    for _ok, ck, px in orders:
        nat = cust_nat[ck]
        # Spark F.round(x) on a double is HALF_UP on the shortest repr
        from decimal import ROUND_HALF_UP, Decimal

        s_cents[nat] += int(
            Decimal(repr(px * 100)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )
        n_i[nat] += 1
    s_all = sum(s_cents.values())
    n_all = sum(n_i.values())
    g = len(s_cents)
    theta = {
        nat: (s_all - s_cents[nat]) / 100.0 / (n_all - n_i[nat])
        for nat in s_cents
    }
    theta_bar = math.fsum(theta.values()) / g
    got = _run("nation_order_jackknife", spark)
    assert [r.n_name for r in got] == sorted(theta)
    for r in got:
        assert r.n_orders == n_i[r.n_name]
        assert r.theta_wo == pytest.approx(_r(theta[r.n_name], 4), abs=1e-9)
        assert r.influence == pytest.approx(
            _r((g - 1) * (theta_bar - theta[r.n_name]), 4), abs=1e-9
        )

"""Third-implementation checks for the round-9 entries: each test
recomputes the answer in PLAIN PYTHON from the parquet (via duckdb just
as a reader) and asserts the Spark entry matches. The DuckDB oracles
restate the same relational math as the Spark plans; these references
are deliberately different shapes (imperative loops, brute force), so a
formula bug shared by both engine restatements cannot hide here.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entry.queries()


def _r(x: float, dp: int) -> float:
    """Half-up rounding of the double's shortest decimal repr — what
    Spark's F.round (BigDecimal.valueOf) and DuckDB's round do; plain
    Python round() is banker's and diverges on .5 boundaries."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"select event_id, cast(ts as date) as day, user_id, event_type,"
        f" value, ts from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


def test_hll_audit_vs_pure_python(spark, events):
    """Recompute the 64-register sketch + regime rule imperatively."""
    m, p, wbits, salt = 64, 6, 46, "hll9"
    regs: dict[tuple, dict[int, int]] = {}
    exact: dict[tuple, set] = {}
    for ev_id, _day, user, etype, _v, _ts in events:
        for metric, key in (("users", str(user)), ("events", str(ev_id))):
            h = int(
                hashlib.md5(f"{salt}-{metric}-{key}".encode()).hexdigest()[:13],
                16,
            )
            bucket, w = h % m, h // m
            rho = (wbits + 1) if w == 0 else (wbits + 1 - w.bit_length())
            g = (etype, metric)
            regs.setdefault(g, {})
            regs[g][bucket] = max(regs[g].get(bucket, 0), rho)
            exact.setdefault(g, set()).add(key)
    expected = {}
    for g, buckets in regs.items():
        v_zero = m - len(buckets)
        z = v_zero + sum(2.0 ** -r for r in sorted(buckets.values()))
        e_raw = 0.709 * m * m / z
        if e_raw <= 2.5 * m and v_zero > 0:
            mode, est = "linear_counting", m * math.log(m / float(v_zero))
        else:
            mode, est = "raw", e_raw
        expected[g] = (len(exact[g]), v_zero, round(e_raw, 2), mode, round(est, 2))
    got = _run("user_hll_sparse_audit", spark)
    assert len(got) == len(expected)
    for r in got:
        n_exact, v_zero, est_raw, mode, est = expected[(r.event_type, r.metric)]
        assert (r.n_exact, r.v_zero, r.mode) == (n_exact, v_zero, mode)
        assert r.est_raw == pytest.approx(est_raw, abs=1e-9)
        assert r.est == pytest.approx(est, abs=1e-9)
        assert r.rel_err == pytest.approx(
            round((r.est - n_exact) / n_exact, 4), abs=1e-12
        )


def test_kadane_vs_brute_force(spark):
    """O(n²) brute-force best window per nation on the exact integers."""
    con = duckdb.connect()
    daily = con.execute(f"""
        with ord as (
            select c.c_nationkey, n.n_name,
                   date_diff('day',
                       (select min(cast(o_orderdate as date))
                        from '{SF_DIR}/orders.parquet'),
                       cast(o.o_orderdate as date)) as t,
                   cast(round(o.o_totalprice * 100) as bigint) as cents
            from '{SF_DIR}/orders.parquet' o
            join '{SF_DIR}/customer.parquet' c on o.o_custkey = c.c_custkey
            join '{SF_DIR}/nation.parquet' n on c.c_nationkey = n.n_nationkey
        )
        select n_name, t, sum(cents) from ord group by 1, 2
    """).fetchall()
    tmax = max(t for _, t, _ in daily)
    nations = sorted({n for n, _, _ in daily})
    got = {r.n_name: r for r in _run("customer_kadane_window", spark)}
    for nn in nations:
        xs = [0] * (tmax + 1)
        for n, t, s in daily:
            if n == nn:
                xs[t] = int(s)
        tt, tot = len(xs), sum(xs)
        ys = [tt * x - tot for x in xs]

        def _key(cand):
            # plan tie-break (round-10 ADVICE fix): max gain, earliest
            # end; then the VIRTUAL empty-prefix start (start=0 via
            # p₋₁=0) loses ties to any explicit prefix row attaining
            # the same floor (start = argmin_t + 1); among explicit
            # starts, earliest wins
            gain, end, start = cand
            return (-gain, end, start == 0, start)

        best = None  # (gain, end, start)
        for i in range(len(ys)):
            run = 0
            for j in range(i, len(ys)):
                run += ys[j]
                cand = (run, j, i)
                if best is None or _key(cand) < _key(best):
                    best = cand
        gain, end, start = best
        r = got[nn]
        assert (r.scaled_gain, r.end_t, r.start_t) == (gain, end, start), nn
        assert r.streak_days == end - start + 1


def test_set_cover_vs_pure_greedy(spark):
    con = duckdb.connect()
    pairs = con.execute(
        f"select distinct l_suppkey, l_partkey from '{SF_DIR}/lineitem.parquet'"
    ).fetchall()
    by_supp: dict[int, set] = {}
    universe = set()
    for s, pt in pairs:
        by_supp.setdefault(s, set()).add(pt)
        universe.add(pt)
    covered: set = set()
    expected = []
    for step in range(1, 6):
        best = None
        for s in sorted(by_supp):
            gain = len(by_supp[s] - covered)
            if best is None or gain > best[1]:
                best = (s, gain)
        if best[1] == 0:
            break
        covered |= by_supp[best[0]]
        expected.append((step, best[0], best[1], len(covered)))
    got = _run("supplier_part_coverage", spark)
    assert [(r.step, r.s_suppkey, r.gain, r.covered) for r in got] == expected
    for r in got:
        assert r.coverage == pytest.approx(
            round(r.covered / len(universe), 6), abs=1e-12
        )


def test_page_hinkley_vs_pure_walk(spark, events):
    from collections import defaultdict

    sums = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for _eid, day, _u, etype, v, _ts in events:
        cell = sums[etype][day]
        cell[0] += round(v * 1_000_000)
        cell[1] += 1
    got = {r.event_type: r for r in _run("event_value_page_hinkley", spark)}
    for etype, days in sums.items():
        xs = [
            _r(s / 1_000_000.0 / n, 6)
            for _, (s, n) in sorted(days.items())
        ]
        ds = sorted(days)
        m_t, run_sum, run_n, mn, max_ph, alarm = 0.0, 0.0, 0, 0.0, None, None
        for i, x in enumerate(xs):
            run_sum += x
            run_n += 1
            m_t += x - run_sum / run_n - 0.005
            ph = m_t - mn
            if max_ph is None or ph > max_ph:
                max_ph = ph
            if ph > 1.0 and alarm is None:
                alarm = ds[i].strftime("%Y-%m-%d")
            mn = min(mn, m_t)
        r = got[etype]
        assert r.n_days == len(xs)
        assert r.max_ph == pytest.approx(_r(max_ph, 6), abs=1e-9)
        assert r.alarm_day == alarm


def test_ewma_bands_vs_pure_recurrence(spark, events):
    from collections import defaultdict

    sums = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for _eid, day, _u, etype, v, _ts in events:
        cell = sums[etype][day]
        cell[0] += round(v * 1_000_000)
        cell[1] += 1
    got = defaultdict(dict)
    for r in _run("event_value_ewma_bands", spark):
        got[r.event_type][r.day] = r
    for etype, days in sums.items():
        xs = {
            d: _r(s / 1_000_000.0 / n, 6)
            for d, (s, n) in days.items()
        }
        ordered = sorted(xs)
        series = [xs[d] for d in ordered]
        # order-pinned band inputs, mirroring both engines (round-10
        # ADVICE fix): x is 6dp-rounded so x·10⁶ is an exact integer;
        # exact integer sums, one divide, popσ from n·Σxm²−(Σxm)²
        xm = [round(x * 1_000_000) for x in series]
        n_days = len(xm)
        s1, s2 = sum(xm), sum(v * v for v in xm)
        mean = _r(s1 / n_days / 1_000_000.0, 6)
        sd = _r(
            math.sqrt(n_days * s2 - s1 * s1) / n_days / 1_000_000.0, 6
        )
        half = 3.0 * math.sqrt(0.25 / 1.75) * sd
        e = series[0]
        for i, d in enumerate(ordered):
            if i > 0:
                e = 0.25 * series[i] + 0.75 * e
            r = got[etype][d.strftime("%Y-%m-%d")]
            assert r.ewma == pytest.approx(_r(e, 6), abs=1e-9)
            assert r.x == pytest.approx(series[i], abs=1e-12)
            assert bool(r.breach) == (e > mean + half or e < mean - half), (
                etype,
                d,
            )


def test_pareto_vital_few_vs_pure_python(spark):
    con = duckdb.connect()
    rows = con.execute(f"""
        select n.n_name, s.o_custkey, s.cents from (
            select o_custkey,
                   sum(cast(round(o_totalprice * 100) as bigint)) as cents
            from '{SF_DIR}/orders.parquet' group by o_custkey
        ) s
        join '{SF_DIR}/customer.parquet' c on s.o_custkey = c.c_custkey
        join '{SF_DIR}/nation.parquet' n on c.c_nationkey = n.n_nationkey
    """).fetchall()
    from collections import defaultdict

    by_nation = defaultdict(list)
    for nn, ck, cents in rows:
        by_nation[nn].append((int(cents), int(ck)))
    got = {r.n_name: r for r in _run("customer_pareto_vital_few", spark)}
    for nn, lst in by_nation.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        tot = sum(c for c, _ in lst)
        cum, vital = 0, None
        for i, (c, _) in enumerate(lst, start=1):
            cum += c
            if vital is None and 5 * cum >= 4 * tot:
                vital = i
        r = got[nn]
        assert r.n_customers == len(lst)
        assert r.vital_count == vital
        n = len(lst)
        assert r.vital_frac == pytest.approx(
            ((2_000_000 * vital + n) // (2 * n)) / 1_000_000, abs=1e-12
        )
        assert r.top1_share == pytest.approx(
            round(lst[0][0] / tot, 6), abs=1e-12
        )


def test_set_cover_exhaustion_path_matches_oracle(spark, tmp_path):
    """Round-9 verdict directive 5: pin the early-exit semantics when the
    part universe is exhausted before the k-th greedy step. The Spark
    loop breaks on an empty pick; the unrolled oracle filters steps whose
    pick is NULL via `where ... is not null` — both must emit exactly
    the realized steps, nothing for the phantom ones."""
    from flight_radar_pipeline_spark.plans.battery_r9c import (
        _COVER_ORACLE,
        _COVER_STEPS,
    )

    # 4 parts, exhausted at step 2 (< _COVER_STEPS): supp 10 covers
    # {1,2,3}; supp 20 covers {3,4}; supp 30 covers {1} (never picked —
    # its only part is covered at step 1)
    pairs = [(10, 1), (10, 2), (10, 3), (20, 3), (20, 4), (30, 1)]
    spark.createDataFrame(
        [(s, p) for s, p in pairs], "l_suppkey bigint, l_partkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = [
        tuple(r)
        for r in QUERIES["supplier_part_coverage"](spark, str(tmp_path))
        .collect()
    ]
    con = duckdb.connect()
    con.sql(
        "create view lineitem as select * from "
        f"parquet_scan('{tmp_path}/lineitem.parquet/*.parquet')"
    )
    want = con.execute(_COVER_ORACLE).fetchall()
    assert got == want
    # the exhaustion actually happened: fewer realized steps than k,
    # full coverage on the last one
    assert len(got) == 2 < _COVER_STEPS
    assert got[0] == (1, 10, 3, 3, 0.75)
    assert got[1] == (2, 20, 1, 4, 1.0)

"""Third-implementation checks for the round-10 entries (duckdb used
only as a parquet reader; the math is plain imperative Python, a
different shape from both engines' relational restatements)."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entry.queries()


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


def test_apportionment_vs_pure_integer_walk(spark):
    """Hamilton with Python's unbounded ints: floors, ranked remainders,
    and the Σseats = budget invariant."""
    con = duckdb.connect()
    rows = con.execute(f"""
        select n.n_name,
               sum(cast(round(o.o_totalprice * 100) as bigint)) as cents
        from '{SF_DIR}/orders.parquet' o
        join '{SF_DIR}/customer.parquet' c on o.o_custkey = c.c_custkey
        join '{SF_DIR}/nation.parquet' n on c.c_nationkey = n.n_nationkey
        group by n.n_name
    """).fetchall()
    con.close()
    seats_budget = 100
    tot = sum(int(c) for _, c in rows)
    q = []
    for name, cents in rows:
        cents = int(cents)
        q.append(
            (name, cents, cents * seats_budget // tot,
             cents * seats_budget % tot)
        )
    base = sum(fq for _, _, fq, _ in q)
    ranked = sorted(q, key=lambda t: (-t[3], t[0]))
    rank = {t[0]: i + 1 for i, t in enumerate(ranked)}
    want = {
        name: (cents, fq, rank[name],
               fq + (1 if rank[name] <= seats_budget - base else 0))
        for name, cents, fq, _ in q
    }
    got = _run("nation_seat_apportionment", spark)
    assert len(got) == len(want)
    for r in got:
        cents, fq, rk, seats = want[r.n_name]
        assert (r.revenue_cents, r.quota_floor,
                r.remainder_rank, r.seats) == (cents, fq, rk, seats)
    assert sum(r.seats for r in got) == seats_budget


def test_skyline_vs_pure_sweep(spark):
    """O(n log n) dominance sweep: sort price tiers ascending, keep a
    part iff no strictly-cheaper tier reaches its size and no same-tier
    part strictly exceeds it."""
    con = duckdb.connect()
    parts = con.execute(
        f"select p_partkey, p_retailprice, p_size"
        f" from '{SF_DIR}/part.parquet'"
    ).fetchall()
    con.close()
    tiers: dict[float, int] = {}
    for _k, price, size in parts:
        tiers[price] = max(tiers.get(price, -(10 ** 9)), size)
    best_before: dict[float, int | None] = {}
    run = None
    for price in sorted(tiers):
        best_before[price] = run
        run = tiers[price] if run is None else max(run, tiers[price])
    want = sorted(
        (k, price, size)
        for k, price, size in parts
        if size == tiers[price]
        and (best_before[price] is None or best_before[price] < size)
    )
    got = sorted((r.p_partkey, r.price, r.size) for r in
                 _run("part_price_size_skyline", spark))
    assert got == want
    # the frontier is mutually non-dominating (sanity of the invariant)
    for k, p1, s1 in got:
        for k2, p2, s2 in got:
            assert not (
                (p2 <= p1 and s2 >= s1) and (p2 < p1 or s2 > s1)
            ), (k, k2)

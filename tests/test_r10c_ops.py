"""Third-implementation check for the MST entry: PRIM's algorithm in
pure Python (vs the Spark side's Kruskal and the oracle's unrolled
Kruskal CTEs — a genuinely different algorithm), plus tree invariants.
With all edge weights distinct the MST is unique, so Prim must produce
the identical EDGE SET; total weight is compared unconditionally (it
is unique even under ties)."""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_mst_vs_pure_prim(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select n_name, o_totalprice"
        f" from '{SF_DIR}/orders.parquet' o"
        f" join '{SF_DIR}/customer.parquet' c on o.o_custkey = c.c_custkey"
        f" join '{SF_DIR}/nation.parquet' n on c.c_nationkey = n.n_nationkey"
    ).fetchall()
    con.close()
    s_cents: dict = defaultdict(int)
    n_ord: dict = defaultdict(int)
    for nat, px in rows:
        s_cents[nat] += int(
            Decimal(repr(px * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )
        n_ord[nat] += 1
    names = sorted(s_cents)
    prof = {n: (s_cents[n] // n_ord[n], n_ord[n]) for n in names}

    def w(u, v):
        return abs(prof[u][0] - prof[v][0]) + 10000 * abs(
            prof[u][1] - prof[v][1]
        )

    # Prim from the lexicographically-first node
    in_tree = {names[0]}
    tree = set()
    total = 0
    while len(in_tree) < len(names):
        best = None
        for u in in_tree:
            for v in names:
                if v in in_tree:
                    continue
                cand = (w(u, v), *sorted((u, v)))
                if best is None or cand < best:
                    best = cand
        bw, bu, bv = best
        tree.add((bu, bv))
        total += bw
        in_tree.add(bu if bv in in_tree else bv)

    got = entry.queries()["nation_profile_mst"](spark, SF_DIR).collect()
    assert [r.step for r in got] == list(range(1, len(names)))
    assert sum(r.w for r in got) == total
    # weights are all distinct at this data → the MST is unique and the
    # edge SETS must coincide (Kruskal vs Prim)
    all_w = sorted(
        w(u, v) for i, u in enumerate(names) for v in names[i + 1:]
    )
    assert len(set(all_w)) == len(all_w)
    assert {(r.u_name, r.v_name) for r in got} == tree
    # Kruskal pick order is nondecreasing in weight
    ws = [r.w for r in got]
    assert ws == sorted(ws)

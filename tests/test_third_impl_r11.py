"""Third-implementation checks, batch 13 — the iterative-graph family
(round-10 verdict directive 3): PageRank, HITS, and k-core peeling are
the registry's highest remaining shared-restatement risk because the
Spark plan and the unrolled recursive-CTE oracle share the algorithm
SHAPE (the same recurrence, restated relationally twice). Each test here
recomputes the answer in plain imperative Python from the parquet
(duckdb used only as a reader) with dict folds and — for PageRank —
EXACT ``fractions.Fraction`` arithmetic, so a recurrence bug shared by
both engine restatements cannot hide.
"""

from __future__ import annotations

import math
from collections import defaultdict
from fractions import Fraction

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
def cs_pairs():
    """Distinct customer–supplier co-occurrence pairs ('c…', 's…') from
    order lines — the shared graph grain of all three entries."""
    con = duckdb.connect()
    rows = con.execute(
        f"""select distinct 'c' || o_custkey, 's' || l_suppkey
            from '{SF_DIR}/orders.parquet' o
            join '{SF_DIR}/lineitem.parquet' l
              on l.l_orderkey = o.o_orderkey"""
    ).fetchall()
    con.close()
    return [(a, b) for a, b in rows]


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


def test_pagerank_vs_exact_fraction_recurrence(spark, cs_pairs):
    """pr₀ = 1/N; prₜ₊₁(v) = (1−d)/N + d·Σ_{u→v} prₜ(u)/deg(u), three
    iterations on the SYMMETRIZED graph, walked with exact rationals
    (d = 85/100) — no floating point until the final 8dp compare. Both
    engines sum doubles in engine-specific orders and round to 8; the
    exact value must sit within one rounding quantum of each."""
    edges: list[tuple[str, str]] = []
    for a, b in cs_pairs:
        edges.append((a, b))
        edges.append((b, a))
    out_n: dict[str, list[str]] = defaultdict(list)
    in_n: dict[str, list[str]] = defaultdict(list)
    for u, v in edges:
        out_n[u].append(v)
        in_n[v].append(u)
    nodes = sorted(set(out_n) | set(in_n))
    n = len(nodes)
    d = Fraction(85, 100)
    pr = {v: Fraction(1, n) for v in nodes}
    for _ in range(3):
        nxt = {}
        for v in nodes:
            mass = sum(
                (pr[u] / len(out_n[u]) for u in in_n[v]), Fraction(0)
            )
            nxt[v] = (1 - d) / n + d * mass
        pr = nxt
    got = {r.node: r.pr for r in _run("entity_pagerank", spark)}
    assert set(got) == set(nodes)
    # exact mass conservation: the symmetrized graph has no dangling
    # nodes, so Σpr = 1 exactly in rational arithmetic
    assert sum(pr.values(), Fraction(0)) == 1
    for v in nodes:
        assert got[v] == pytest.approx(float(pr[v]), abs=1.5e-8), v


def test_hits_vs_exact_bigint_path_counts(spark, cs_pairs):
    """h₀ = 1 per source; aᵢ = Σ in-edge h, hᵢ = Σ out-edge a, three
    iterations of EXACT integer path counts folded with dicts; top-10
    per role by (paths desc, node asc); score = one float division of
    the exact integers, rounded 8dp (replicated bit-for-bit)."""
    out_n: dict[str, list[str]] = defaultdict(list)
    in_n: dict[str, list[str]] = defaultdict(list)
    for a, b in cs_pairs:
        out_n[a].append(b)
        in_n[b].append(a)
    h = {u: 1 for u in out_n}
    a: dict[str, int] = {}
    for _ in range(3):
        a = {
            v: sum(h.get(u, 0) for u in in_n[v]) for v in in_n
        }
        h = {
            u: sum(a.get(v, 0) for v in out_n[u]) for u in out_n
        }
    rows = _run("entity_hits_scores", spark)
    for role, scores in (("authority", a), ("hub", h)):
        total = sum(scores.values())
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = [r for r in rows if r.role == role]
        assert [(r.node, r.paths) for r in got] == want
        assert [r.rank for r in got] == list(range(1, 11))
        for r, (_node, paths) in zip(got, want):
            assert r.score == _r(paths / total, 8)


def test_kcore_peeling_vs_pure_peel_walk(spark, cs_pairs):
    """Four peel rounds on the symmetrized graph with the self-sized
    k = ⌈|sym edges| / (2·|V|)⌉ (computed with the same integer
    ceiling-division), each round recounting degrees over a plain edge
    set and dropping nodes below k — all-integer outputs compared
    exactly, plus the monotone-shrink invariant."""
    sym = set()
    for a, b in cs_pairs:
        sym.add((a, b))
        sym.add((b, a))
    m = len(sym)
    v = len({u for u, _ in sym})
    k = (m + 2 * v - 1) // (2 * v)
    want = []
    edges = sym
    for rnd in range(1, 5):
        deg: dict[str, int] = defaultdict(int)
        for u, _w in edges:
            deg[u] += 1
        keep = {u for u, dd in deg.items() if dd >= k}
        edges = {(u, w) for u, w in edges if u in keep and w in keep}
        srcs = {u for u, _w in edges}
        want.append(
            (
                rnd,
                sum(1 for u in srcs if u.startswith("c")),
                sum(1 for u in srcs if u.startswith("s")),
                len(edges) // 2,
            )
        )
    got = [
        (r.round, r.n_customers, r.n_suppliers, r.n_edges)
        for r in _run("entity_kcore_peeling", spark)
    ]
    assert got == want
    # the survivor curve can only shrink round over round
    ns = [w[3] for w in want]
    assert all(x >= y for x, y in zip(ns, ns[1:]))
    assert k >= 1 and k == math.ceil(m / (2.0 * v))

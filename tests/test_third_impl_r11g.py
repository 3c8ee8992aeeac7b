"""Third-implementation checks, batch 19 — bounded graph traversals and
the asymmetric-dedup faces: 3-hop BFS reach, Bellman–Ford bounded min
cost (the improved-frontier pruning must equal the textbook relaxation),
Adamic–Adar link prediction, and n-gram containment with synthesized
excerpts. Pure imperative Python walks (deque BFS, dict relaxation,
per-item pair loops) beside the Spark plans and anti-join/unrolled-CTE
oracles.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict, deque

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
def graph():
    """(sym adjacency, weighted adjacency, seed keys present in customer)
    for the customer–supplier transaction graph."""
    con = duckdb.connect()
    pairs = con.execute(
        f"""select 'c' || o_custkey, 's' || l_suppkey,
                   min(floor(l_quantity))::bigint
            from '{SF_DIR}/lineitem.parquet' l
            join '{SF_DIR}/orders.parquet' o on l.l_orderkey = o.o_orderkey
            group by 1, 2"""
    ).fetchall()
    custkeys = [
        int(k)
        for (k,) in con.execute(
            f"select c_custkey from '{SF_DIR}/customer.parquet'"
        ).fetchall()
    ]
    con.close()
    adj: dict[str, set[str]] = defaultdict(set)
    wadj: dict[str, list[tuple[str, int]]] = defaultdict(list)
    for a, b, w in pairs:
        adj[a].add(b)
        adj[b].add(a)
        wadj[a].append((b, int(w)))
        wadj[b].append((a, int(w)))
    return adj, wadj, custkeys


def test_reach_3hop_vs_pure_bfs(spark, graph):
    """Textbook deque BFS from the seed set, minimum-hop labels — the
    Spark frontier loop and the anti-joined CTE layers must both equal
    it, including seeds that are isolated in the transaction graph."""
    adj, _wadj, custkeys = graph
    seeds = {f"c{k}" for k in custkeys if k <= 25}
    hop = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if hop[u] == 3:
            continue
        for v in adj.get(u, ()):
            if v not in hop:
                hop[v] = hop[u] + 1
                q.append(v)
    got = sorted((r.node, r.hop) for r in _run("entity_reach_3hop", spark))
    assert got == sorted(hop.items())
    # monotone frontier sanity: every hop-k node has a hop-(k-1) neighbor
    for n, h in hop.items():
        if h:
            assert any(hop.get(v) == h - 1 for v in adj[n]), n


def test_min_cost_3hop_vs_pure_relaxation(spark, graph):
    """Three full Bellman–Ford relaxation rounds over a plain dict —
    the engine's improved-only frontier must be lossless against this.
    Plus the dominance invariant: min_cost(v) ≤ reach-hop path count
    implies every reached node is costed, and costs never increase with
    an extra round."""
    _adj, wadj, custkeys = graph
    d = {f"c{k}": 0 for k in custkeys if k <= 15}
    prev = dict(d)
    for _ in range(3):
        nxt = dict(prev)
        for u, cost in prev.items():
            for v, w in wadj.get(u, ()):
                c = cost + w
                if c < nxt.get(v, c + 1):
                    nxt[v] = c
        # costs are monotone nonincreasing round over round
        assert all(nxt[k] <= v for k, v in prev.items())
        prev = nxt
    got = sorted((r.node, r.min_cost) for r in _run("entity_min_cost_3hop", spark))
    assert got == sorted(prev.items())


def test_adamic_adar_vs_pure_inverted_index(spark):
    """Per qualifying part (2 ≤ df ≤ 20), every customer pair scores
    1/ln(df); pairs with ≥2 common parts survive. Pure dict/loop walk,
    4dp round replicated."""
    con = duckdb.connect()
    rows = con.execute(
        f"""select distinct o_custkey, l_partkey
            from '{SF_DIR}/lineitem.parquet' l
            join '{SF_DIR}/orders.parquet' o on l.l_orderkey = o.o_orderkey"""
    ).fetchall()
    con.close()
    members: dict[int, list[int]] = defaultdict(list)
    for u, i in rows:
        members[int(i)].append(int(u))
    common: dict[tuple[int, int], int] = defaultdict(int)
    score: dict[tuple[int, int], float] = defaultdict(float)
    for _i, us in members.items():
        if not (2 <= len(us) <= 20):
            continue
        s = 1.0 / math.log(len(us))
        us = sorted(us)
        for x, a in enumerate(us):
            for b in us[x + 1 :]:
                common[(a, b)] += 1
                score[(a, b)] += s
    want = sorted(
        (a, b, n, _r(score[(a, b)], 4))
        for (a, b), n in common.items()
        if n >= 2
    )
    got = sorted(
        (r.id_a, r.id_b, r.n_common, r.adamic_adar)
        for r in _run("customer_adamic_adar", spark)
    )
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1.5e-4)


def test_containment_pairs_vs_pure_walk(spark):
    """Docs ∪ 25-token excerpts; distinct word 3-grams; df-capped
    inverted index; directed containment inter/|src| ≥ 0.6 both ways.
    Plus the design claim the entry exists for: every synthesized
    excerpt (id ≥ 100000) is contained in its source at ≈1.0."""
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    corpus = {int(i): t for i, t in rows}
    for i, t in list(corpus.items()):
        if i % 7 == 0:
            corpus[i + 100000] = " ".join(re.split(r"\s+", t.strip())[:25])
    grams: dict[int, set] = {}
    for i, t in corpus.items():
        toks = re.split(r"\s+", t.strip())
        grams[i] = (
            {" ".join(toks[p : p + 3]) for p in range(len(toks) - 2)}
            if len(toks) >= 3
            else set()
        )
    df: dict[str, int] = defaultdict(int)
    for gs in grams.values():
        for g in gs:
            df[g] += 1
    capped = {i: {g for g in gs if df[g] <= 20} for i, gs in grams.items()}
    inv: dict[str, list[int]] = defaultdict(list)
    for i, gs in capped.items():
        for g in gs:
            inv[g].append(i)
    inter: dict[tuple[int, int], int] = defaultdict(int)
    for _g, ids in inv.items():
        ids = sorted(ids)
        for x, a in enumerate(ids):
            for b in ids[x + 1 :]:
                inter[(a, b)] += 1
    want = []
    for (a, b), n in inter.items():
        for src, dst in ((a, b), (b, a)):
            c = n / len(capped[src])
            if c >= 0.6:
                want.append((src, dst, _r(c, 4)))
    want.sort()
    got = sorted(
        (r.src_id, r.dst_id, r.containment)
        for r in _run("doc_containment_pairs", spark)
    )
    assert got == want
    # the asymmetric-relation design claim: each excerpt → its source
    snips = {s for s, _d, _c in want if s >= 100000}
    for s, d, c in want:
        if s >= 100000 and d == s - 100000:
            assert c >= 0.95
    assert snips, "no excerpt was contained in anything — fixture broken"

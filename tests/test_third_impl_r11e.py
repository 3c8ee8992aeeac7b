"""Third-implementation checks, batch 17 — the canonical corpus-dedup
pipeline and the remaining spectral/clustering entries: MinHash-LSH end
to end (shingle → signature → band → candidate → exact-Jaccard verify),
connected components over those pairs, power-iteration PCA, full-space
k-means assignment, and SemDeDup-style semantic dedup. All walked in
plain imperative Python (hashlib md5, list/dict folds, union-find) from
the parquet — the Spark plans and the unrolled-CTE oracles restate these
relationally twice; this is the non-relational third witness.
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

_K, _NH, _NB = 8, 16, 4
_THRESH = 0.35
_P = 2_147_483_647
_MIX_A, _MIX_B = 0x9E3779B1, 0x85EBCA6B
_DIMS = 64
_KM_K, _KM_ITERS = 8, 3
_SEM_T = 0.35
_PCA_ITERS = 3


def _r(x: float, dp: int) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return {int(i): t for i, t in rows}


@pytest.fixture(scope="module")
def minhash_pairs(docs):
    """The full MinHash-LSH walk: distinct char-8 shingles, one md5 per
    shingle to a 28-bit base, 16 universal hashes (aᵢH+bᵢ) mod 2³¹−1,
    min per hash, 4 bands of 4 keyed by md5 of the joined slice,
    candidates = same (band, key), verify = exact Jaccard of the
    distinct shingle sets rounded to 4dp at threshold 0.35."""
    shingle_sets = {}
    sigs = {}
    for i, t in docs.items():
        sh = {t[p : p + _K] for p in range(max(len(t) - (_K - 1), 1))}
        shingle_sets[i] = sh
        hs = [int(_md5(s)[:7], 16) for s in sh]
        sig = []
        for s in range(_NH):
            a = (_MIX_A * (s + 1)) % _P
            b = (_MIX_B * (s + 1)) % _P
            sig.append(min((a * h + b) % _P for h in hs))
        sigs[i] = sig
    buckets: dict[tuple, list[int]] = defaultdict(list)
    for i, sig in sigs.items():
        for band in range(_NB):
            key = _md5("|".join(str(v) for v in sig[band * 4 : band * 4 + 4]))
            buckets[(band, key)].append(i)
    cands = set()
    for members in buckets.values():
        ms = sorted(members)
        for x, a in enumerate(ms):
            for b in ms[x + 1 :]:
                cands.add((a, b))
    out = []
    for a, b in sorted(cands):
        inter = len(shingle_sets[a] & shingle_sets[b])
        jac = _r(inter / (len(shingle_sets[a]) + len(shingle_sets[b]) - inter), 4)
        if jac >= _THRESH:
            out.append((a, b, jac))
    return out


def test_minhash_lsh_pipeline_vs_pure_walk(spark, minhash_pairs):
    got = [
        (r.id_a, r.id_b, r.jaccard)
        for r in _run("minhash_near_dup_pairs", spark)
    ]
    assert sorted(got) == minhash_pairs
    # every surviving pair really is above threshold and ordered
    assert all(a < b and j >= _THRESH for a, b, j in minhash_pairs)


class _UF:
    def __init__(self):
        self.p: dict = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def test_near_dup_clusters_vs_union_find(spark, minhash_pairs):
    """Label propagation (Spark) and the recursive-CTE closure (oracle)
    must both equal a plain union-find labeling by min id — only nodes
    appearing in a pair are labeled."""
    uf = _UF()
    for a, b, _j in minhash_pairs:
        uf.union(a, b)
    comp_min: dict[int, int] = {}
    nodes = {x for a, b, _j in minhash_pairs for x in (a, b)}
    for n in nodes:
        r = uf.find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = sorted((n, comp_min[uf.find(n)]) for n in nodes)
    got = sorted((r.doc_id, r.cluster_id) for r in _run("near_dup_clusters", spark))
    assert got == want


@pytest.fixture(scope="module")
def vectors():
    con = duckdb.connect()
    rows = con.execute(
        f"select vec_id, embedding::DOUBLE[] from"
        f" '{SF_DIR}/embeddings.parquet' order by vec_id"
    ).fetchall()
    con.close()
    return {int(i): [float(x) for x in v] for i, v in rows}


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def test_power_iteration_vs_pure_walk(spark, vectors):
    """v₀ from the md5('pca-dim') first nibble − 7.5, normalized; three
    rounds of v ← Xᵀ(Xv) with renormalization; sum-sign convention;
    6dp loadings. Plus the eigenvector contract ‖v‖ = 1."""
    v = [int(_md5(f"pca-{d}")[0], 16) - 7.5 for d in range(_DIMS)]
    for _ in range(1):
        nrm = math.sqrt(_dot(v, v))
        v = [e / nrm for e in v]
    for _ in range(_PCA_ITERS):
        c = [0.0] * _DIMS
        for x in vectors.values():
            dot = _dot(x, v)
            for d in range(_DIMS):
                c[d] += x[d] * dot
        nrm = math.sqrt(_dot(c, c))
        v = [e / nrm for e in c]
    if sum(v) < 0:
        v = [-e for e in v]
    got = {r.dim: r.loading for r in _run("embedding_top_component", spark)}
    assert sorted(got) == list(range(_DIMS))
    for d in range(_DIMS):
        assert got[d] == pytest.approx(_r(v[d], 6), abs=1.5e-6), d
    assert math.sqrt(_dot(v, v)) == pytest.approx(1.0, abs=1e-12)


def _assign(vec, cents):
    best = None
    for cid, cv in cents:
        sim = _r(
            _dot(vec, cv)
            / (math.sqrt(_dot(vec, vec)) * math.sqrt(_dot(cv, cv))),
            6,
        )
        if best is None or sim > best[0]:
            best = (sim, cid)
    return best


@pytest.fixture(scope="module")
def km_cents(vectors):
    """Full-space deterministic Lloyd's: seeds = the 8 rows with the
    smallest (md5('kmeans-' || id), id), cent ids by source id; three
    assign/re-mean rounds with 6dp means; empty cells keep centroids."""
    seeded = sorted(
        vectors, key=lambda i: (_md5(f"kmeans-{i}"), i)
    )[:_KM_K]
    cents = [(c, vectors[i]) for c, i in enumerate(sorted(seeded))]
    for _ in range(_KM_ITERS):
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for i in sorted(vectors):
            cell = _assign(vectors[i], cents)[1]
            acc = sums.setdefault(cell, [0.0] * _DIMS)
            for d, x in enumerate(vectors[i]):
                acc[d] += x
            counts[cell] = counts.get(cell, 0) + 1
        cents = [
            (
                cid,
                [_r(sums[cid][d] / counts[cid], 6) for d in range(_DIMS)]
                if cid in counts
                else old,
            )
            for cid, old in cents
        ]
    return cents


def test_kmeans_clusters_vs_pure_lloyds(spark, vectors, km_cents):
    got = {r.vec_id: (r.cell, r.cosine) for r in _run("embedding_kmeans_clusters", spark)}
    assert sorted(got) == sorted(vectors)
    for i, v in vectors.items():
        sim, cell = _assign(v, km_cents)
        assert got[i] == (cell, pytest.approx(sim, abs=1e-9)), i


def test_semantic_dedup_vs_pure_cell_scan(spark, vectors, km_cents):
    """Same trained centroids; unit vectors; in-cell pairs with rounded
    unit-dot ≥ 0.35 mark the higher id — kept ⟺ no lower-id near
    neighbor in the cell. Plus the SemDeDup invariant: a kept=False row
    always has n_lower_dups ≥ 1 and a lower-id cell-mate."""
    cells: dict[int, list[int]] = defaultdict(list)
    units = {}
    for i, v in sorted(vectors.items()):
        nrm = math.sqrt(_dot(v, v))
        units[i] = [x / nrm for x in v]
        cells[_assign(v, km_cents)[1]].append(i)
    n_lower = defaultdict(int)
    for _cell, members in cells.items():
        ms = sorted(members)
        for x, a in enumerate(ms):
            for b in ms[x + 1 :]:
                if _r(_dot(units[a], units[b]), 6) >= _SEM_T:
                    n_lower[b] += 1
    got = {
        r.vec_id: (r.cell, r.n_lower_dups, r.kept)
        for r in _run("embedding_semantic_dedup", spark)
    }
    assert sorted(got) == sorted(vectors)
    for i in vectors:
        cell = _assign(vectors[i], km_cents)[1]
        nd = n_lower.get(i, 0)
        assert got[i] == (cell, nd, nd == 0), i
        if not got[i][2]:
            assert got[i][1] >= 1

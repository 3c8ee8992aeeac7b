"""Third-implementation checks, batch 24 — the embedding-audit family:
Johnson–Lindenstrauss distortion, Matryoshka truncation overlap, the
sampled pairwise-cosine histogram, and contrastive triplet mining. Pure
imperative Python (the ±1 sign matrix re-derived from its md5 spec,
explicit rank folds) beside the Spark plans and literal-matrix oracles.
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
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def vectors():
    con = duckdb.connect()
    rows = con.execute(
        f"select vec_id, embedding::DOUBLE[] from '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    con.close()
    return {int(i): [float(x) for x in v] for i, v in rows}


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cos(a, b):
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


def test_jl_distortion_vs_pure_sign_matrix(spark, vectors):
    """The ±1 matrix re-derived from the md5 spec (first nibble of
    'jl-j-d' ≥ 8 → +1), strict left-to-right signed sums × 1/√16,
    per-query mean/max |cos₆₄ − cos₁₆| and top-10 survival. Plus the JL
    sanity: mean distortion stays well under the ±2 cosine range
    (< 0.3 ≈ the 1/√k ballpark for k = 16) for every query."""
    signs = [
        [1 if int(_md5(f"jl-{j}-{d}")[0], 16) >= 8 else -1 for d in range(64)]
        for j in range(16)
    ]
    scale = 1.0 / math.sqrt(16.0)
    proj = {}
    for i, v in vectors.items():
        w = []
        for row in signs:
            acc = 0.0
            for d, s in enumerate(row):
                acc = acc + v[d] if s == 1 else acc - v[d]
            w.append(acc * scale)
        proj[i] = w
    got = {r.query_id: r for r in _run("embedding_jl_distortion", spark)}
    assert sorted(got) == list(range(8))
    for q in range(8):
        cands = []
        for n in vectors:
            if n == q:
                continue
            cands.append(
                (n, _r(_cos(vectors[q], vectors[n]), 6), _r(_cos(proj[q], proj[n]), 6))
            )
        errs = [abs(c64 - c16) for _n, c64, c16 in cands]
        top64 = {
            n for n, _c, _c2 in sorted(cands, key=lambda t: (-t[1], t[0]))[:10]
        }
        top16 = {
            n for n, _c, _c2 in sorted(cands, key=lambda t: (-t[2], t[0]))[:10]
        }
        r = got[q]
        assert r.n_neighbors == len(cands)
        assert r.mean_abs_err == pytest.approx(
            _r(math.fsum(errs) / len(errs), 4), abs=2e-4
        )
        assert r.max_abs_err == pytest.approx(_r(max(errs), 4), abs=1e-9)
        assert r.topk_overlap == len(top64 & top16)
        assert r.mean_abs_err < 0.3


def test_matryoshka_audit_vs_pure_truncation(spark, vectors):
    """Exact top-5 on the full 64 dims vs on the first 32; overlap and
    the n/(10−n) Jaccard of two size-5 sets."""
    got = {r.query_id: r for r in _run("embedding_matryoshka_audit", spark)}
    assert sorted(got) == list(range(10))
    for q in range(10):
        full = sorted(
            ((_r(_cos(vectors[q], vectors[n]), 6), n) for n in vectors if n != q),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        trunc = sorted(
            (
                (_r(_cos(vectors[q][:32], vectors[n][:32]), 6), n)
                for n in vectors
                if n != q
            ),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        ov = len({n for _c, n in full} & {n for _c, n in trunc})
        r = got[q]
        assert r.n_overlap == ov
        assert r.jaccard == pytest.approx(_r(ov / (10.0 - ov), 4), abs=1e-9)


def test_cosine_histogram_vs_pure_sampled_pairs(spark, vectors):
    """Self-sized md5 sample (modulus = ceil(n/100)), all sample pairs,
    floor-quantized 0.1-wide bins — plus the completeness check that
    bin counts sum to |S|·(|S|−1)/2."""
    modulus = max(1, -(-len(vectors) // 100))
    sample = sorted(
        i for i in vectors if int(_md5(f"chist-{i}")[:12], 16) % modulus == 0
    )
    bins: dict[float, int] = defaultdict(int)
    for x, a in enumerate(sample):
        for b in sample[x + 1 :]:
            c = _cos(vectors[a], vectors[b])
            bins[_r(math.floor(c / 0.1) * 0.1, 1)] += 1
    got = {r.bin_lo: r.n_pairs for r in _run("embedding_cosine_histogram", spark)}
    assert got == dict(bins)
    assert sum(got.values()) == len(sample) * (len(sample) - 1) // 2


def test_contrastive_triplets_vs_pure_mining(spark, vectors):
    """Per anchor: positive = exact top-1; negatives = 4 by the md5
    unit-hash order (excluding the positive); margins re-derived. Plus
    the mining invariant: the positive's cosine ≥ every negative's."""
    got = defaultdict(list)
    for r in _run("embedding_contrastive_triplets", spark):
        got[r.anchor_id].append(r)
    assert sorted(got) == list(range(32))
    for a in range(32):
        scored = sorted(
            ((_r(_cos(vectors[a], vectors[n]), 6), n) for n in vectors if n != a),
            key=lambda t: (-t[0], t[1]),
        )
        pos_cos, pos = scored[0]
        negs = sorted(
            (
                (
                    (int(_md5(f"neg-{a}-{n}")[:6], 16) + 0.5) / 16777216.0,
                    n,
                    c,
                )
                for c, n in scored
                if n != pos
            ),
        )[:4]
        rows = sorted(got[a], key=lambda r: r.neg_rank)
        assert [r.positive_id for r in rows] == [pos] * 4
        assert [r.negative_id for r in rows] == [n for _u, n, _c in negs]
        for rank, (r, (_u, _n, nc)) in enumerate(zip(rows, negs), 1):
            assert r.neg_rank == rank
            assert r.pos_cosine == pytest.approx(pos_cos, abs=1e-9)
            assert r.neg_cosine == pytest.approx(nc, abs=1e-9)
            assert r.margin == pytest.approx(_r(pos_cos - nc, 6), abs=1e-9)
            assert r.pos_cosine >= r.neg_cosine

"""Third-implementation checks, batch 14 — the ANN serving family
(round-10 verdict directive 3): IVF routing and the IVF-PQ ADC walk are
restated relationally twice (Spark plan ⟺ unrolled CTE oracle), so this
batch walks them a third way, in plain imperative Python: explicit
centroid loops, an md5-seeded Lloyd's per subspace, code assignment,
codeword reconstruction, asymmetric scoring, and the refinement
re-rank — list/dict folds only, duckdb used only as a parquet reader.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entry.queries()

_NC, _NPROBE, _KNN = 16, 2, 5       # battery_corpus constants
_PQ_M, _PQ_K, _PQ_ITERS = 4, 8, 2
_PQ_REFINE = 16
_DIMS = 64
_SUB = _DIMS // _PQ_M


def _r(x: float, dp: int) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _dot(a, b) -> float:
    """Left-to-right fold — the association order of the engines'
    aggregate/zip_with expression and DuckDB's list_cosine_similarity."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cos(a, b) -> float:
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


@pytest.fixture(scope="module")
def vectors():
    con = duckdb.connect()
    rows = con.execute(
        f"select vec_id, embedding::DOUBLE[] from"
        f" '{SF_DIR}/embeddings.parquet' order by vec_id"
    ).fetchall()
    con.close()
    return {int(i): [float(x) for x in v] for i, v in rows}


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


def _assign(vec, cents) -> int:
    """Max rounded-6dp cosine, ties to the LOWEST cent_id — the
    argmax both engines state."""
    best = None
    for cid, cv in cents:
        sim = _r(_cos(vec, cv), 6)
        if best is None or sim > best[0]:
            best = (sim, cid)
    return best[1]


def _probe(vec, cents, nprobe) -> list[int]:
    """The nprobe nearest cells ranked (rounded sim desc, cent_id asc)."""
    ranked = sorted(
        ((_r(_cos(vec, cv), 6), cid) for cid, cv in cents),
        key=lambda t: (-t[0], t[1]),
    )
    return [cid for _s, cid in ranked[:nprobe]]


def _search(vectors, cells, probes_of, score_vec_of, k):
    """Shared IVF search walk: per query, candidates = vectors in its
    probed cells minus itself, scored round(cos(query_raw, score_vec),6),
    top-k by (cosine desc, neighbor_id asc)."""
    out = []
    for qid in sorted(probes_of):
        probed = set(probes_of[qid])
        cands = []
        for nid, cell in cells.items():
            if nid == qid or cell not in probed:
                continue
            c = _r(_cos(vectors[qid], score_vec_of[nid]), 6)
            cands.append((c, nid))
        cands.sort(key=lambda t: (-t[0], t[1]))
        out.extend((qid, nid, c) for c, nid in cands[:k])
    return out


def test_ivf_vs_pure_centroid_walk(spark, vectors):
    """First-16-by-id coarse centroids; assignment/probe by rounded
    cosine; exact in-cell ranking — every step an explicit loop."""
    cents = [(i, vectors[i]) for i in range(_NC)]
    cells = {nid: _assign(v, cents) for nid, v in vectors.items()}
    probes_of = {
        qid: _probe(vectors[qid], cents, _NPROBE) for qid in range(10)
    }
    want = _search(vectors, cells, probes_of, vectors, _KNN)
    got = [
        (r.query_id, r.neighbor_id, r.cosine)
        for r in _run("embedding_topk_ivf", spark)
    ]
    assert sorted(got) == sorted(want)


def _train_codebook(vectors, s):
    """Deterministic spherical Lloyd's on subspace s, replicated from
    the engines' statement: seeds = the _PQ_K rows with the smallest
    (md5('pq{s}-' || id), id), cent_ids numbered by source id;
    each iteration assigns by rounded-cosine argmax and re-means per
    dim (rounded 6dp); empty cells keep their previous centroid."""
    sub = {
        nid: v[s * _SUB : (s + 1) * _SUB] for nid, v in vectors.items()
    }
    seeded = sorted(
        sub,
        key=lambda nid: (
            hashlib.md5(f"pq{s}-{nid}".encode()).hexdigest(),
            nid,
        ),
    )[:_PQ_K]
    cents = [(i, sub[nid]) for i, nid in enumerate(sorted(seeded))]
    for _ in range(_PQ_ITERS):
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for nid in sorted(sub):
            cell = _assign(sub[nid], cents)
            acc = sums.setdefault(cell, [0.0] * _SUB)
            for d, x in enumerate(sub[nid]):
                acc[d] += x
            counts[cell] = counts.get(cell, 0) + 1
        cents = [
            (
                cid,
                [
                    _r(sums[cid][d] / counts[cid], 6)
                    for d in range(_SUB)
                ]
                if cid in counts
                else old,
            )
            for cid, old in cents
        ]
    return cents


def _pq_recon(vectors):
    """Per-vector PQ reconstruction: concat of the 4 assigned codewords."""
    books = [_train_codebook(vectors, s) for s in range(_PQ_M)]
    recon = {}
    for nid, v in vectors.items():
        parts: list[float] = []
        for s in range(_PQ_M):
            code = _assign(v[s * _SUB : (s + 1) * _SUB], books[s])
            parts.extend(dict(books[s])[code])
        recon[nid] = parts
    return recon


@pytest.fixture(scope="module")
def pq_state(vectors):
    cents = [(i, vectors[i]) for i in range(_NC)]
    cells = {nid: _assign(v, cents) for nid, v in vectors.items()}
    probes_of = {
        qid: _probe(vectors[qid], cents, _NPROBE) for qid in range(10)
    }
    return cells, probes_of, _pq_recon(vectors)


def test_ivfpq_adc_vs_pure_codebook_walk(spark, vectors, pq_state):
    """The ADC pass: asymmetric scoring of the raw query against each
    candidate's codeword reconstruction, trained/assigned entirely by
    the imperative walk above. Candidates sharing all m codes tie in
    cosine and break toward the lower neighbor id in both the engines
    and this reference's sort key."""
    cells, probes_of, recon = pq_state
    want = _search(vectors, cells, probes_of, recon, _KNN)
    got = [
        (r.query_id, r.neighbor_id, r.cosine)
        for r in _run("embedding_topk_ivfpq", spark)
    ]
    assert sorted(got) == sorted(want)


def test_ivfpq_refined_vs_pure_rerank_walk(spark, vectors, pq_state):
    """The refinement stage: ADC shortlists 16 per query, the raw
    vectors of only that shortlist re-score exactly, final top-5 by
    (exact cosine desc, neighbor_id asc)."""
    cells, probes_of, recon = pq_state
    shortlist = _search(vectors, cells, probes_of, recon, _PQ_REFINE)
    want = []
    for qid in sorted(probes_of):
        mine = [
            (_r(_cos(vectors[qid], vectors[nid]), 6), nid)
            for q, nid, _c in shortlist
            if q == qid
        ]
        mine.sort(key=lambda t: (-t[0], t[1]))
        want.extend((qid, nid, c) for c, nid in mine[:_KNN])
    got = [
        (r.query_id, r.neighbor_id, r.cosine)
        for r in _run("embedding_topk_ivfpq_refined", spark)
    ]
    assert sorted(got) == sorted(want)
    # refinement must not hurt: the refined top-5 is the 5 best exact
    # cosines within the shortlist, so it rank-wise dominates the exact
    # cosines of ANY 5-subset — in particular the plain-ADC picks
    # (sorted by exact value; ADC order is by quantized score)
    adc = {}
    for q, nid, _c in _search(vectors, cells, probes_of, recon, _KNN):
        adc.setdefault(q, []).append(_r(_cos(vectors[q], vectors[nid]), 6))
    ref = {}
    for q, nid, c in want:
        ref.setdefault(q, []).append(c)
    for q in ref:
        assert all(
            rc >= ac
            for rc, ac in zip(ref[q], sorted(adc[q], reverse=True))
        )

"""Third-implementation checks, batch 20 — retrieval and selection
walks: winnowing rolling-hash fingerprints, DSIR importance weighting,
greedy MMR re-ranking, sign-LSH mutual nearest neighbors, and hybrid
BM25+vector RRF fusion. Each is recomputed in plain imperative Python
from the parquet (hashlib, dict folds, explicit greedy loops) — the
Spark plans and their unrolled-CTE oracles are both relational; these
are the non-relational third witnesses.
"""

from __future__ import annotations

import hashlib
import math
import re
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
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, lang, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return {int(i): (lang, t) for i, lang, t in rows}


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


def _cos(a, b):
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


# --------------------------------------------------------------------------
# winnowing rolling fingerprint
# --------------------------------------------------------------------------

_WIN, _KEEP, _BASE, _MOD = 16, 4, 31, 1_000_000_007


def test_rolling_fingerprint_vs_pure_horner(spark, docs):
    """Canonicalize, slide the 16-char window, Horner-fold the
    polynomial hash mod 1e9+7, keep the 4 smallest distinct — a short
    doc fingerprints its whole canon. Joined with '-', string-exact."""
    want = {}
    for i, (_lang, t) in docs.items():
        if i >= 200:
            continue
        canon = re.sub(r"\s+", " ", t.strip().lower())
        wins = (
            [canon[p : p + _WIN] for p in range(len(canon) - _WIN + 1)]
            if len(canon) >= _WIN
            else [canon]
        )
        hs = set()
        for w in wins:
            h = 0
            for ch in w:
                h = (h * _BASE + ord(ch)) % _MOD
            hs.add(h)
        want[i] = "-".join(str(h) for h in sorted(hs)[:_KEEP])
    got = {r.doc_id: r.rolling_fp for r in _run("doc_rolling_fingerprint", spark)}
    assert got == want


# --------------------------------------------------------------------------
# DSIR importance weighting
# --------------------------------------------------------------------------

_DSIR_B = 64


def test_dsir_importance_vs_pure_llr_fold(spark, docs):
    """Token→64-bucket md5 hash, Laplace-smoothed LLR of the English
    slice vs the whole corpus, per-doc mean LLR (6dp), per-lang report
    (4dp). Plus the selection-direction invariant: English documents
    are selected at a higher rate than any other language."""
    bucket_of = {}

    def bkt(term):
        if term not in bucket_of:
            bucket_of[term] = int(_md5(term)[:6], 16) % _DSIR_B
        return bucket_of[term]

    n_r = defaultdict(int)
    n_t = defaultdict(int)
    doc_buckets = {}
    for i, (lang, t) in docs.items():
        bs = [bkt(tok) for tok in re.split(r"\s+", t.strip())]
        doc_buckets[i] = bs
        for b in bs:
            n_r[b] += 1
            if lang == "en":
                n_t[b] += 1
    tr, tt = sum(n_r.values()), sum(n_t.values())
    w = {
        b: _r(
            math.log(
                ((n_t.get(b, 0) + 1) / (tt + float(_DSIR_B)))
                / ((n_r[b] + 1) / (tr + float(_DSIR_B)))
            ),
            6,
        )
        for b in n_r
    }
    per_lang = defaultdict(list)
    for i, (lang, _t) in docs.items():
        score = _r(sum(w[b] for b in doc_buckets[i]) / len(doc_buckets[i]), 6)
        per_lang[lang].append(score)
    got = {r.lang: r for r in _run("doc_dsir_importance", spark)}
    assert sorted(got) == sorted(per_lang)
    rates = {}
    for lang, scores in per_lang.items():
        r = got[lang]
        assert r.n_docs == len(scores)
        assert r.avg_llr == pytest.approx(
            _r(math.fsum(scores) / len(scores), 4), abs=2e-4
        )
        assert r.n_selected == sum(1 for s in scores if s > 0)
        rates[lang] = r.n_selected / r.n_docs
    assert all(rates["en"] > v for k, v in rates.items() if k != "en")


# --------------------------------------------------------------------------
# greedy MMR re-ranking
# --------------------------------------------------------------------------

_MMR_N, _MMR_K, _MMR_LAM = 16, 5, 0.7


def test_mmr_topk_vs_pure_greedy(spark, vectors):
    """Exact 16-deep shortlist per query; greedy rounds score
    λ·rel − (1−λ)·max-sim-to-selected rounded to 7dp with the
    neighbor-id tiebreak. Plus the diversity invariant each rank-1 pick
    is the pure-relevance argmax."""
    one_m = round(1 - _MMR_LAM, 10)
    want = []
    for q in range(4):
        scored = sorted(
            (
                (_r(_cos(vectors[q], vectors[n]), 6), n)
                for n in vectors
                if n != q
            ),
            key=lambda t: (-t[0], t[1]),
        )[:_MMR_N]
        short = {n: rel for rel, n in scored}
        sims = {
            (a, b): _r(_cos(vectors[a], vectors[b]), 6)
            for _r1, a in scored
            for _r2, b in scored
            if a != b
        }
        rel0, n0 = scored[0]
        sel = [(q, 1, n0, rel0, _r(_MMR_LAM * rel0, 7))]
        chosen = [n0]
        for rank in range(2, _MMR_K + 1):
            best = None
            for n, rel in short.items():
                if n in chosen:
                    continue
                pen = max(sims[(n, c)] for c in chosen)
                sc = _r(_MMR_LAM * rel - one_m * pen, 7)
                if best is None or (-sc, n) < (-best[0], best[1]):
                    best = (sc, n, rel)
            sel.append((q, rank, best[1], best[2], best[0]))
            chosen.append(best[1])
        want.extend(sel)
    got = [
        (r.query_id, r.rank, r.neighbor_id, r.relevance, r.mmr_score)
        for r in _run("embedding_mmr_topk", spark)
    ]
    assert sorted(got) == sorted(want)


# --------------------------------------------------------------------------
# sign-LSH mutual nearest neighbors
# --------------------------------------------------------------------------

_NT, _PPT = 4, 4  # recommended_planes(500, 400) = max(4, ceil(log2(1.25)))


def test_mutual_nn_vs_pure_lsh_walk(spark, vectors):
    """16 md5-seeded hyperplanes → 4 four-bit table signatures;
    candidates share (table, signature); top-1 per id among candidates
    (rounded cosine desc, id asc); pairs where the top-1 relation is
    RECIPROCAL. Popularity hubs failing reciprocity is the entry's
    point — asserted: every output pair really is mutually best."""
    planes = [
        [int(_md5(f"{p}-{d}")[0], 16) - 7.5 for d in range(64)]
        for p in range(_NT * _PPT)
    ]
    sig = {}
    for i, v in vectors.items():
        bits = ["1" if _dot(v, pl) > 0 else "0" for pl in planes]
        sig[i] = {
            t: "".join(bits[t * _PPT : (t + 1) * _PPT]) for t in range(_NT)
        }
    buckets = defaultdict(list)
    for i in vectors:
        for t in range(_NT):
            buckets[(t, sig[i][t])].append(i)
    cands = defaultdict(set)
    for ids in buckets.values():
        ids = sorted(ids)
        for x, a in enumerate(ids):
            for b in ids[x + 1 :]:
                cands[a].add(b)
                cands[b].add(a)
    units = {}
    for i, v in vectors.items():
        nrm = math.sqrt(_dot(v, v))
        units[i] = [x / nrm for x in v]
    nn = {}
    for i, cs in cands.items():
        ranked = sorted(
            ((_r(_dot(units[i], units[c]), 6), c) for c in cs),
            key=lambda t: (-t[0], t[1]),
        )
        nn[i] = ranked[0]
    want = sorted(
        (a, nn[a][1], nn[a][0])
        for a in nn
        if nn[a][1] in nn
        and nn[nn[a][1]][1] == a
        and a < nn[a][1]
    )
    got = sorted(
        (r.id_a, r.id_b, r.cosine) for r in _run("embedding_mutual_nn", spark)
    )
    assert got == want
    for a, b, _c in want:
        assert nn[a][1] == b and nn[b][1] == a


# --------------------------------------------------------------------------
# hybrid BM25 + vector RRF fusion
# --------------------------------------------------------------------------

_RRF_K, _RRF_LIST, _RRF_OUT, _RRF_QVEC = 60, 50, 20, 0
_BM25_TERMS = ("spark", "shuffle", "broadcast")


def test_hybrid_rrf_vs_pure_fusion(spark, docs, vectors):
    """BM25 scores folded term by term (k1=1.2, b=0.75, 4dp), cosine
    list against query vector 0 (6dp); both rank lists capped at 50;
    RRF = Σ 1/(60+rank) with rank 0 marking absence; top 20 by
    (rrf desc, doc_id)."""
    toks = {i: re.split(r"\s+", t.strip()) for i, (_l, t) in docs.items()}
    nn = len(docs)
    avgdl = math.fsum(len(ts) for ts in toks.values()) / nn
    dfreq = {
        term: sum(1 for ts in toks.values() if term in ts)
        for term in _BM25_TERMS
    }
    bm25 = {}
    for i, ts in toks.items():
        s = 0.0
        for term in _BM25_TERMS:
            tf = ts.count(term)
            if not tf:
                continue
            idf = math.log((nn - dfreq[term] + 0.5) / (dfreq[term] + 0.5) + 1.0)
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ts) / avgdl))
        if _r(s, 4) > 0:
            bm25[i] = _r(s, 4)
    lex_rank = {
        i: rk + 1
        for rk, (i, _s) in enumerate(
            sorted(bm25.items(), key=lambda kv: (-kv[1], kv[0]))[:_RRF_LIST]
        )
    }
    cos = {
        i: _r(_cos(vectors[i], vectors[_RRF_QVEC]), 6)
        for i in vectors
        if i != _RRF_QVEC
    }
    vec_rank = {
        i: rk + 1
        for rk, (i, _s) in enumerate(
            sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:_RRF_LIST]
        )
    }
    fused = []
    for i in set(lex_rank) | set(vec_rank):
        rrf = (1.0 / (_RRF_K + lex_rank[i]) if i in lex_rank else 0.0) + (
            1.0 / (_RRF_K + vec_rank[i]) if i in vec_rank else 0.0
        )
        fused.append(
            (i, lex_rank.get(i, 0), vec_rank.get(i, 0), _r(rrf, 6))
        )
    fused.sort(key=lambda t: (-t[3], t[0]))
    want = fused[:_RRF_OUT]
    got = [
        (r.doc_id, r.lex_rank, r.vec_rank, r.rrf)
        for r in _run("doc_hybrid_rrf_search", spark)
    ]
    assert got == want

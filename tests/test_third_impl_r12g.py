"""Third-implementation checks, batch 39 — the round-12 POST_FREEZE
entries: the in-engine multinomial Naive Bayes language classifier
(training counts → micro-nat integer weights → exact-integer argmax →
confusion grid) and the Heaps'-law shingle-vocabulary growth fit
(checkpoint buckets → cumulative N/V → log-log OLS), both walked as
plain Python folds beside their Spark plans and unrolled SQL oracles.
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


def _iround_away(x: float) -> int:
    """Integer round half-up AWAY from zero on doubles — F.round(x, 0) /
    DuckDB round(x) semantics for the micro-nat quantization."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


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


# --------------------------------------------------------------------------
# doc_nb_lang_classifier — exact-integer NB scoring fold
# --------------------------------------------------------------------------

_NB_BUCKETS = 64


@pytest.mark.parametrize(
    "name", ["doc_nb_lang_classifier", "doc_nb_stream_train"]
)
def test_nb_classifier_vs_integer_scoring_fold(spark, docs, name):
    def buckets(text):
        return [
            int(_md5(term)[:6], 16) % _NB_BUCKETS
            for term in re.split(r"\s+", text.strip())
        ]

    # training: priors + per-(lang, bucket) counts
    n_docs_l: dict = defaultdict(int)
    cnt: dict = defaultdict(int)
    tot: dict = defaultdict(int)
    for _i, (lang, t) in docs.items():
        n_docs_l[lang] += 1
        for b in buckets(t):
            cnt[(lang, b)] += 1
            tot[lang] += 1
    langs = sorted(n_docs_l)
    n_tot = sum(n_docs_l.values())
    prior = {
        lg: _iround_away(math.log(n_docs_l[lg] / n_tot) * 1e6) for lg in langs
    }
    wint = {
        (lg, b): _iround_away(
            math.log((cnt[(lg, b)] + 1) / (tot[lg] + float(_NB_BUCKETS)))
            * 1e6
        )
        for lg in langs
        for b in range(_NB_BUCKETS)
    }

    # scoring: exact integer sums, argmax (score desc, lang asc)
    confusion: dict = defaultdict(int)
    for _i, (true_lang, t) in docs.items():
        bs = buckets(t)
        scores = {
            lg: prior[lg] + sum(wint[(lg, b)] for b in bs) for lg in langs
        }
        pred = min(langs, key=lambda lg: (-scores[lg], lg))
        confusion[(true_lang, pred)] += 1
    expected = sorted((tl, pl, n) for (tl, pl), n in confusion.items())

    got = [
        (r.true_lang, r.pred_lang, r.n_docs)
        for r in _run(name, spark)
    ]
    assert got == expected
    # the grid partitions the corpus exactly
    assert sum(n for _t, _p, n in expected) == len(docs)


# --------------------------------------------------------------------------
# corpus_heaps_fit — shingle growth checkpoints + closed-form OLS
# --------------------------------------------------------------------------

_HEAPS_CKPTS, _HEAPS_K = 20, 8


def test_heaps_fit_vs_checkpoint_ols_walk(spark, docs):
    st = math.ceil((max(docs) + 1) / _HEAPS_CKPTS)
    inst: dict = defaultdict(int)  # bucket -> shingle instances
    first: dict = {}  # shingle -> first doc_id
    for i in sorted(docs):
        t = docs[i][1]
        rng = max(len(t) - (_HEAPS_K - 1), 1)
        inst[i // st] += rng
        for p in range(rng):
            sh = t[p : p + _HEAPS_K]
            first.setdefault(sh, i)
    newv: dict = defaultdict(int)
    for _sh, fd in first.items():
        newv[fd // st] += 1
    xs, ys, n_cum, v_cum = [], [], 0, 0
    for bk in sorted(inst):
        n_cum += inst[bk]
        v_cum += newv.get(bk, 0)
        xs.append(math.log(n_cum))
        ys.append(math.log(v_cum))
    m = float(len(xs))
    sx, sy = math.fsum(xs), math.fsum(ys)
    sxx = math.fsum(x * x for x in xs)
    syy = math.fsum(y * y for y in ys)
    sxy = math.fsum(x * y for x, y in zip(xs, ys))
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    k_coef = math.exp((sy - sx * beta) / m)
    r2 = (m * sxy - sx * sy) ** 2 / ((m * sxx - sx * sx) * (m * syy - sy * sy))

    [row] = _run("corpus_heaps_fit", spark)
    assert (
        row.n_checkpoints,
        row.total_tokens,
        row.vocab_size,
        row.beta,
        row.k_coef,
        row.r2,
    ) == (len(xs), n_cum, v_cum, _r(beta, 4), _r(k_coef, 4), _r(r2, 4))
    # the growth law is real on this corpus: sublinear, tight fit
    assert 0.0 < row.beta < 1.0 and row.r2 > 0.9

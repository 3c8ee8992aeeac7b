"""Third-implementation checks, batch 9: pure-Python imperative
references (duckdb used only as a reader) for the corpus/IR families —
TF-IDF top terms (whitespace tokens, ln(N/df), per-doc top-3), PMI
collocations (adjacent bigrams, min-count 5, top-15), held-out trigram
novelty (md5 unit-hash doc split replicated bit-for-bit), and the
deterministic md5-shuffled round-robin mixture schedule.
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


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, lang, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return rows


def _toks(text):
    t = text.strip()
    return re.split(r"\s+", t) if t else []


def test_tfidf_vs_pure_walk(spark, docs):
    tf: dict = defaultdict(lambda: defaultdict(int))
    for doc_id, _l, text in docs:
        for t in _toks(text):
            tf[doc_id][t] += 1
    df: dict = defaultdict(int)
    for terms in tf.values():
        for t in terms:
            df[t] += 1
    n = len(docs)
    want = []
    for doc_id in sorted(tf):
        scored = sorted(
            (
                (-_r(c * math.log(n / float(df[t])), 4), t)
                for t, c in tf[doc_id].items()
            )
        )[:3]
        for rank, (neg_s, t) in enumerate(scored, 1):
            want.append((doc_id, t, -neg_s, rank))
    got = _run("doc_tfidf_top_terms", spark)
    assert len(got) == len(want)
    for r, (doc_id, term, tfidf, rank) in zip(got, want):
        assert (r.doc_id, r.term, r.rank) == (doc_id, term, rank)
        assert r.tfidf == pytest.approx(tfidf, abs=1e-9)


def test_pmi_vs_pure_walk(spark, docs):
    uni: dict = defaultdict(int)
    bi: dict = defaultdict(int)
    wt = bt = 0
    for _d, _l, text in docs:
        ts = _toks(text)
        wt += len(ts)
        for t in ts:
            uni[t] += 1
        for a, b in zip(ts, ts[1:]):
            bi[f"{a} {b}"] += 1
            bt += 1
    scored = []
    for bg, cab in bi.items():
        if cab < 5:
            continue
        a, b = bg.split(" ")
        pmi = _r(
            math.log(
                (cab / bt) / ((uni[a] / wt) * (uni[b] / wt))
            ),
            4,
        )
        scored.append((-pmi, bg, cab))
    scored.sort()
    want = scored[:15]
    got = _run("top_pmi_collocations", spark)
    assert len(got) == len(want)
    for r, (neg_pmi, bg, cab) in zip(got, want):
        assert (r.bigram, r.cab) == (bg, cab)
        assert r.pmi == pytest.approx(-neg_pmi, abs=1e-9)


def _unit_hash(key, salt):
    h = hashlib.md5(f"{salt}-{key}".encode()).hexdigest()[:6]
    return (int(h, 16) + 0.5) / float(16**6)


def test_ngram_novelty_vs_pure_split_walk(spark, docs):
    """Trigrams of the 70/30 md5 doc split: eval grams unseen in any
    train doc, counted with multiplicity per lang."""
    train_grams = set()
    ev: dict = defaultdict(lambda: [set(), 0, 0])  # lang -> [docs, grams, novel]
    split = []
    for doc_id, lang, text in docs:
        ts = _toks(text)
        grams = (
            [" ".join(ts[i:i + 3]) for i in range(len(ts) - 2)]
            if len(ts) >= 3
            else []
        )
        u = _unit_hash(doc_id, "novel")
        split.append((doc_id, lang, grams, u))
        if u < 0.7:
            train_grams.update(grams)
    for doc_id, lang, grams, u in split:
        if u < 0.7:
            continue
        a = ev[lang]
        a[0].add(doc_id)
        a[1] += len(grams)
        a[2] += sum(1 for g in grams if g not in train_grams)
    got = _run("doc_ngram_novelty", spark)
    # langs whose eval slice has zero grams drop out of the count(*) grain
    want_langs = sorted(l for l, a in ev.items() if a[1] > 0)
    assert [r.lang for r in got] == want_langs
    for r in got:
        n_docs, n_grams, n_novel = ev[r.lang]
        assert r.n_eval_docs == len(n_docs)
        assert (r.n_grams, r.n_novel) == (n_grams, n_novel)
        assert r.novelty_rate == pytest.approx(
            _r(n_novel / (n_grams * 1.0), 4), abs=1e-9
        )


def test_mixture_schedule_vs_pure_walk(spark, docs):
    """Round-robin across langs, md5-shuffled within (hex-string sort
    order), first 120 positions."""
    per_lang: dict = defaultdict(list)
    for doc_id, lang, _t in docs:
        per_lang[lang].append(
            (hashlib.md5(f"mix-{doc_id}".encode()).hexdigest(), doc_id)
        )
    ranked = []
    for lang, items in per_lang.items():
        items.sort()
        for rn, (_h, doc_id) in enumerate(items, 1):
            ranked.append((rn, lang, doc_id))
    ranked.sort()
    want = [
        (pos, doc_id, lang)
        for pos, (_rn, lang, doc_id) in enumerate(ranked, 1)
    ][:120]
    got = _run("doc_mixture_schedule", spark)
    assert [(r.position, r.doc_id, r.lang) for r in got] == want
    # any prefix of a round-robin schedule is near-uniform across langs:
    # within each full round every lang appears exactly once
    langs = {l for _p, _d, l in want}
    first_round = [l for _p, _d, l in want[: len(langs)]]
    assert sorted(first_round) == sorted(langs)

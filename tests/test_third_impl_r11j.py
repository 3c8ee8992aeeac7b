"""Third-implementation checks, batch 22 — corpus curation and rolling
sketch walks: the add-alpha bigram LM, benchmark decontamination,
boilerplate span mining, the hashed-TF → cluster composition,
sorted-neighborhood blocking, and the rolling-7d KMV merge. Pure
imperative Python from the parquet (dict LMs, explicit window slides,
per-block neighbor loops) beside the relational Spark/oracle pair.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict
from datetime import timedelta

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
def doc_toks():
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return {int(i): re.split(r"\s+", t.strip()) for i, t in rows}


def test_lm_perplexity_vs_pure_bigram_model(spark, doc_toks):
    """Corpus bigram/unigram-context counts in dicts, V = distinct
    unigrams, add-0.5 smoothing, per-doc mean negative log-likelihood
    over its bigram INSTANCES. Plus the smoothing bound: every NLL term
    is positive and ≤ ln((c1_max + αV)/α)."""
    c2: dict[tuple, int] = defaultdict(int)
    c1: dict[str, int] = defaultdict(int)
    vocab = set()
    for toks in doc_toks.values():
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    got = {r.doc_id: r for r in _run("doc_lm_perplexity", spark)}
    want_ids = sorted(i for i, ts in doc_toks.items() if len(ts) >= 2)
    assert sorted(got) == want_ids
    for i in want_ids:
        toks = doc_toks[i]
        nlls = [
            -math.log((c2[(a, b)] + 0.5) / (c1[a] + 0.5 * v))
            for a, b in zip(toks, toks[1:])
        ]
        r = got[i]
        assert r.n_bigrams == len(nlls)
        assert r.avg_nll == pytest.approx(
            _r(math.fsum(nlls) / len(nlls), 4), abs=2e-4
        )
        assert all(0 < x for x in nlls)


def test_decontamination_vs_pure_gram_overlap(spark, doc_toks):
    """md5 bucket 1 is the eval slice; per train doc, the distinct word
    trigram overlap against the union of eval trigrams — plus the
    definitional bound 0 ≤ contamination ≤ 1 and that an eval doc never
    appears in the report."""
    bucket = {
        i: int(_md5(str(i))[:12], 16) % 10 for i in doc_toks
    }
    grams = {
        i: {
            " ".join(ts[p : p + 3]) for p in range(len(ts) - 2)
        }
        if len(ts) >= 3
        else set()
        for i, ts in doc_toks.items()
    }
    eval_grams = set()
    for i, gs in grams.items():
        if bucket[i] == 1:
            eval_grams |= gs
    got = {r.doc_id: r for r in _run("doc_decontamination", spark)}
    want_ids = sorted(
        i for i in doc_toks if bucket[i] != 1 and grams[i]
    )
    assert sorted(got) == want_ids
    for i in want_ids:
        n = len(grams[i])
        ov = len(grams[i] & eval_grams)
        r = got[i]
        assert (r.n_grams, r.n_overlap) == (n, ov)
        assert r.contamination == pytest.approx(_r(ov / n, 4), abs=1e-9)
        assert 0.0 <= r.contamination <= 1.0


def test_boilerplate_spans_vs_pure_slide(spark, doc_toks):
    """Every 8-token window of every doc (short docs contribute their
    whole text once), counted by distinct docs and occurrences; top 20
    with the full (n_docs, n_occurrences, span) tiebreak."""
    by_span_docs: dict[str, set] = defaultdict(set)
    by_span_occ: dict[str, int] = defaultdict(int)
    for i, ts in doc_toks.items():
        hi = max(len(ts) - 6, 1)
        for p in range(hi):
            span = " ".join(ts[p : p + 8])
            by_span_docs[span].add(i)
            by_span_occ[span] += 1
    cands = [
        (s, len(d), by_span_occ[s])
        for s, d in by_span_docs.items()
        if len(d) >= 3
    ]
    cands.sort(key=lambda t: (-t[1], -t[2], t[0]))
    want = [(s, nd, no) for s, nd, no in cands[:20]]
    got = [
        (r.span, r.n_docs, r.n_occurrences)
        for r in _run("doc_boilerplate_spans", spark)
    ]
    assert got == want


def test_topic_clusters_vs_pure_hashed_tf(spark, doc_toks):
    """Hashed-TF 64-dim count vectors (md5 bucket per token), first-6
    docs as centroids, rounded-cosine argmax with the lowest-cent tie —
    the full text→vector→cluster composition walked by hand."""
    vecs = {}
    for i, ts in doc_toks.items():
        v = [0.0] * 64
        for tok in ts:
            v[int(_md5(tok)[:12], 16) % 64] += 1.0
        vecs[i] = v

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    cents = [(c, vecs[c]) for c in range(6)]
    got = {r.doc_id: (r.cell, r.cosine) for r in _run("doc_topic_clusters", spark)}
    assert sorted(got) == sorted(vecs)
    for i, v in vecs.items():
        best = None
        for cid, cv in cents:
            sim = _r(
                dot(v, cv) / (math.sqrt(dot(v, v)) * math.sqrt(dot(cv, cv))),
                6,
            )
            if best is None or sim > best[0]:
                best = (sim, cid)
        assert got[i] == (best[1], pytest.approx(best[0], abs=1e-9)), i


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for x, ca in enumerate(a, 1):
        cur = [x]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_sorted_neighborhood_vs_pure_window_slide(spark):
    """Distinct names sort within their 4-char prefix block; each pairs
    with its next 3 neighbors; Levenshtein ≤ 3 verifies. The w·n
    candidate bound is asserted directly."""
    con = duckdb.connect()
    names = sorted(
        {n for (n,) in con.execute(
            f"select p_name from '{SF_DIR}/part.parquet'"
        ).fetchall()}
    )
    con.close()
    blocks: dict[str, list[str]] = defaultdict(list)
    for n in names:  # already sorted → per-block lists are sorted
        blocks[n[:4]].append(n)
    want = []
    n_cands = 0
    for _blk, ns in blocks.items():
        for x, a in enumerate(ns):
            for b in ns[x + 1 : x + 4]:
                n_cands += 1
                d = _lev(a, b)
                if d <= 3:
                    want.append((a, b, d))
    want.sort()
    assert n_cands <= 3 * len(names)  # the SNM w·n bound
    got = sorted(
        (r.name_a, r.name_b, r.dist)
        for r in _run("part_sorted_neighborhood_pairs", spark)
    )
    assert got == want


def test_kmv_rolling_7d_vs_pure_window_merge(spark):
    """Each (window-end, user) membership from day+0..6 replication;
    the k-th smallest unit hash per window decides the estimate; the
    mergeability claim is checked directly — merging per-day min-k
    lists and re-taking k equals the from-scratch window min-k."""
    con = duckdb.connect()
    rows = con.execute(
        f"select distinct cast(ts as date), user_id from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    k = 32
    day_users: dict = defaultdict(set)
    for d, u in rows:
        day_users[d].add(u)

    def uh(u):
        return (int(_md5(f"kmv-{u}")[:6], 16) + 0.5) / 16777216.0

    # per-day min-k partials (the mergeable sketch state)
    day_mink = {
        d: sorted((uh(u), u) for u in us)[:k] for d, us in day_users.items()
    }
    windows: dict = defaultdict(set)
    for d, us in day_users.items():
        for off in range(7):
            windows[d + timedelta(days=off)] |= us
    got = {r.window_end: r for r in _run("user_kmv_rolling_7d", spark)}
    assert sorted(got) == sorted(w.strftime("%Y-%m-%d") for w in windows)
    for wend, users in windows.items():
        direct = sorted((uh(u), u) for u in users)
        # mergeability: union of member days' min-k, dedup, re-take k
        merged = sorted(
            {t for d in day_users if d <= wend and wend - d <= timedelta(days=6)
             for t in day_mink[d]}
        )[:k]
        assert merged == direct[:k]
        n = len(users)
        est = float(n) if n <= k else _r((k - 1) / direct[k - 1][0], 3)
        r = got[wend.strftime("%Y-%m-%d")]
        assert r.n_exact == n
        assert r.kmv_estimate == pytest.approx(est, abs=1e-6)

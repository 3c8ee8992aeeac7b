"""Third-implementation checks, batch 10: pure-Python imperative
references (duckdb used only as a reader) for the governance and
corpus-shape families — char-class entropy, the k-anonymity audit,
mergeable moment partials, the doc-length histogram, and the
add-one-smoothed per-language KL drift over the bounded vocabulary
grid.
"""

from __future__ import annotations

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


def test_char_class_entropy_vs_pure_count_walk(spark, docs):
    got = {r.doc_id: r for r in _run("doc_char_class_entropy", spark)}
    want_ids = [d for d, _l, t in docs if len(t) > 0]
    assert sorted(got) == sorted(want_ids)
    for doc_id, _lang, text in docs:
        if not text:
            continue
        n = len(text)
        counts = [
            sum(1 for ch in text if "a" <= ch <= "z"),
            sum(1 for ch in text if "A" <= ch <= "Z"),
            sum(1 for ch in text if "0" <= ch <= "9"),
            text.count(" "),
        ]
        counts.append(n - sum(counts))
        ent = math.fsum(
            -(c / n) * math.log2(c / n) for c in counts if c > 0
        )
        r = got[doc_id]
        assert (r.n, r.n_lower, r.n_upper, r.n_digit, r.n_space, r.n_other) \
            == (n, counts[0], counts[1], counts[2], counts[3], counts[4])
        assert r.class_entropy == pytest.approx(_r(ent, 4), abs=1e-9)
        assert 0.0 <= r.class_entropy <= math.log2(5) + 1e-9


def test_k_anonymity_vs_pure_group_walk(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select c_mktsegment, c_nationkey, c_acctbal"
        f" from '{SF_DIR}/customer.parquet'"
    ).fetchall()
    con.close()
    g: dict = defaultdict(lambda: [0, set()])
    for seg, nk, bal in rows:
        a = g[(seg, nk)]
        a[0] += 1
        a[1].add(bal)
    got = {(r.segment, r.nationkey): r for r in _run("customer_k_anonymity", spark)}
    assert set(got) == set(g)
    for key, (size, bals) in g.items():
        r = got[key]
        assert r.group_size == size
        assert r.l_diversity == len(bals)
        assert r.k_violation == (size < 10)


def test_stats_merged_vs_pure_moments(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select event_type, value from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    vals: dict = defaultdict(list)
    for t, v in rows:
        vals[t].append(v)
    got = {r.event_type: r for r in _run("event_value_stats_merged", spark)}
    assert set(got) == set(vals)
    for t, vs in vals.items():
        n = len(vs)
        m = math.fsum(vs) / n
        var = math.fsum((x - m) ** 2 for x in vs) / (n - 1)
        r = got[t]
        assert r.n == n
        assert r.mean == pytest.approx(_r(m, 4), abs=1e-9)
        assert r.variance == pytest.approx(_r(var, 4), abs=1e-9)


def test_length_histogram_vs_pure_bucket_walk(spark, docs):
    buckets: dict = defaultdict(list)
    for _d, _l, text in docs:
        t = text.strip()
        n_tok = len(re.split(r"\s+", t)) if t else 1  # duckdb len([''])=1
        buckets[(n_tok // 16) * 16].append(n_tok)
    got = _run("doc_length_histogram", spark)
    assert [r.bucket_lo for r in got] == sorted(buckets)
    for r in got:
        toks = buckets[r.bucket_lo]
        assert r.n_docs == len(toks)
        assert r.avg_tokens == pytest.approx(
            _r(math.fsum(toks) / len(toks), 2), abs=1e-9
        )


def test_lang_kl_drift_vs_pure_grid_walk(spark, docs):
    """Count-thresholded vocab (cg >= 10), add-one smoothing over the
    lang x vocab grid, KL in bits."""
    cg: dict = defaultdict(int)
    lc: dict = defaultdict(lambda: defaultdict(int))
    lt_all: dict = defaultdict(int)
    for _d, lang, text in docs:
        t = text.strip()
        for tok in (re.split(r"\s+", t) if t else [""]):
            cg[tok] += 1
    vocab = {t: c for t, c in cg.items() if c >= 10}
    v = len(vocab)
    tg = sum(vocab.values())
    for _d, lang, text in docs:
        t = text.strip()
        for tok in (re.split(r"\s+", t) if t else [""]):
            if tok in vocab:
                lc[lang][tok] += 1
                lt_all[lang] += 1
    got = {r.lang: r for r in _run("doc_lang_kl_drift", spark)}
    assert set(got) == set(lt_all)
    for lang, tl in lt_all.items():
        kl = math.fsum(
            ((lc[lang].get(t, 0) + 1) / (tl + v))
            * math.log2(
                ((lc[lang].get(t, 0) + 1) / (tl + v))
                / ((vocab[t] + 1) / (tg + v))
            )
            for t in vocab
        )
        r = got[lang]
        assert r.n_tokens == tl
        assert r.kl_bits == pytest.approx(_r(kl, 6), abs=1e-9)
        # both smoothed vectors are proper distributions over the same
        # vocab grid, so the KL is nonnegative
        assert r.kl_bits >= -1e-9

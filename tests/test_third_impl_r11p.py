"""Third-implementation checks, batch 28 — sketch set operations and
corpus-assembly policies: KMV join-key overlap, domain-mixture
sampling, stratified sampling, incremental-ingest dedup, and per-group
winsorization. Pure imperative Python from the parquet.
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


def _uh(salt: str, key) -> float:
    return (int(_md5(f"{salt}-{key}")[:6], 16) + 0.5) / 16777216.0


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


def test_kmv_overlap_vs_pure_set_estimator(spark):
    """Beyer et al.'s KMV set-operation estimator walked by hand: each
    side's 64 minimum unit hashes, merged to the union's 64 minima,
    Jaccard ≈ the both-sides fraction. Plus the sanity that the
    estimate is within [0, 1] and directionally right (customer keys ⊆
    plausible order keys ⇒ nonzero overlap)."""
    con = duckdb.connect()
    oa = {int(k) for (k,) in con.execute(
        f"select distinct o_custkey from '{SF_DIR}/orders.parquet'").fetchall()}
    cb = {int(k) for (k,) in con.execute(
        f"select distinct c_custkey from '{SF_DIR}/customer.parquet'").fetchall()}
    con.close()
    ha = sorted((_uh("ov", k), k) for k in oa)[:64]
    hb = sorted((_uh("ov", k), k) for k in cb)[:64]
    merged: dict[float, list[int]] = {}
    for hv, _k in ha:
        merged.setdefault(hv, [0, 0])[0] = 1
    for hv, _k in hb:
        merged.setdefault(hv, [0, 0])[1] = 1
    u = sorted(merged.items())[:64]
    k_union = len(u)
    k_both = sum(1 for _hv, (a, b) in u if a and b)
    [row] = _run("orders_customer_key_overlap_kmv", spark)
    assert (row.k_union, row.k_both) == (k_union, k_both)
    assert row.jaccard_est == pytest.approx(_r(k_both / k_union, 4), abs=1e-9)
    true_j = len(oa & cb) / len(oa | cb)
    assert 0.0 <= row.jaccard_est <= 1.0
    assert abs(row.jaccard_est - true_j) < 0.35  # sketch ballpark


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, lang, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return {int(i): (lang, t) for i, lang, t in rows}


def test_mixture_sample_vs_pure_rates(spark, docs):
    """Fixed target shares × 250-doc budget → per-lang rate
    min(1, share·budget/n); membership by the md5 draw. Plus the budget
    check: Σ n_sampled lands near the budget (each domain binomial
    around rate·n)."""
    shares = {"de": 0.15, "en": 0.35, "es": 0.20, "fr": 0.15, "zh": 0.15}
    counts: dict[str, int] = defaultdict(int)
    for _i, (lang, _t) in docs.items():
        counts[lang] += 1
    rates = {
        lang: _r(min(1.0, shares.get(lang, 0.0) * 250 / n), 6)
        for lang, n in counts.items()
    }
    sampled: dict[str, int] = defaultdict(int)
    for i, (lang, _t) in docs.items():
        if _uh("mix", i) < rates[lang]:
            sampled[lang] += 1
    got = {r.lang: r for r in _run("corpus_mixture_sample", spark)}
    assert sorted(got) == sorted(counts)
    for lang, n in counts.items():
        r = got[lang]
        assert (r.n_docs, r.n_sampled) == (n, sampled[lang])
        assert r.target_share == shares.get(lang, 0.0)
        assert r.rate == pytest.approx(rates[lang], abs=1e-9)
    total = sum(sampled.values())
    assert 0.6 * 250 <= total <= 1.4 * 250


def test_stratified_sample_vs_pure_md5_rank(spark, docs):
    """Within each language, the 20 smallest (md5(id), id) win — exact
    quotas (or the whole stratum when smaller), asserted per lang."""
    per_lang: dict[str, list] = defaultdict(list)
    for i, (lang, _t) in docs.items():
        per_lang[lang].append((_md5(str(i)), i))
    want = []
    for lang, rows in per_lang.items():
        rows.sort()
        for _h, i in rows[:20]:
            want.append((i, lang))
    want.sort()
    got = sorted((r.doc_id, r.lang) for r in _run("doc_stratified_sample", spark))
    assert got == want
    picked: dict[str, int] = defaultdict(int)
    for _i, lang in got:
        picked[lang] += 1
    for lang, rows in per_lang.items():
        assert picked[lang] == min(20, len(rows))


def test_incremental_dedup_vs_pure_fingerprints(spark, docs):
    """History = canonical-md5 fingerprints of doc_id < 250; the new
    batch keeps a row iff its fingerprint is unseen in history AND it is
    the batch's first occurrence — precedence asserted: dup_of_history
    beats dup_in_batch."""
    fp = {
        i: _md5(re.sub(r"\s+", " ", t.strip().lower()))
        for i, (_l, t) in docs.items()
    }
    hist = {fp[i] for i in fp if i < 250}
    new_ids = sorted(i for i in fp if i >= 250)
    first_new: dict[str, int] = {}
    for i in new_ids:
        first_new.setdefault(fp[i], i)
    want = {}
    for i in new_ids:
        if fp[i] in hist:
            want[i] = (False, "dup_of_history")
        elif first_new[fp[i]] != i:
            want[i] = (False, "dup_in_batch")
        else:
            want[i] = (True, "kept")
    got = {r.doc_id: (r.keep, r.reason) for r in _run("doc_incremental_dedup", spark)}
    assert got == want


def test_winsorized_vs_pure_fences(spark):
    """Exact quantile_cont fences per type, clip, raw-vs-clipped means,
    clip counts — plus the winsorization contract: the clipped mean
    moves TOWARD the fences' interval and clip counts stay ≤ ~5% + 1
    of n on each side."""
    con = duckdb.connect()
    rows = con.execute(
        f"select event_type, value from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    per: dict[str, list[float]] = defaultdict(list)
    for et, v in rows:
        per[et].append(float(v))

    def qc(xs, q):
        xs = sorted(xs)
        h = (len(xs) - 1) * q
        lo = math.floor(h)
        if lo + 1 >= len(xs):
            return float(xs[-1])
        return xs[lo] + (h - lo) * (xs[lo + 1] - xs[lo])

    got = {r.event_type: r for r in _run("event_value_winsorized", spark)}
    assert sorted(got) == sorted(per)
    for et, xs in per.items():
        p05, p95 = qc(xs, 0.05), qc(xs, 0.95)
        clipped = [min(max(x, p05), p95) for x in xs]
        r = got[et]
        assert r.n == len(xs)
        assert r.p05 == pytest.approx(_r(p05, 4), abs=2e-4)
        assert r.p95 == pytest.approx(_r(p95, 4), abs=2e-4)
        assert r.mean_raw == pytest.approx(_r(math.fsum(xs) / len(xs), 4), abs=2e-4)
        assert r.mean_winsorized == pytest.approx(
            _r(math.fsum(clipped) / len(clipped), 4), abs=2e-4
        )
        assert r.clipped_low == sum(1 for x in xs if x < p05)
        assert r.clipped_high == sum(1 for x in xs if x > p95)
        assert r.clipped_low <= 0.05 * len(xs) + 1
        assert r.clipped_high <= 0.05 * len(xs) + 1
        assert p05 - 1e-9 <= r.mean_winsorized <= p95 + 1e-9

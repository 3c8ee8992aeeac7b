"""Third-implementation checks, batch 7: pure-Python imperative
references (duckdb used only as a reader) for the lifecycle / recency /
text-quality families — Kaplan–Meier second-order survival (the
product-limit fold in exact event-time order), exponentially decayed
popularity, the per-user-day entropy profile, trigram repetition
ratio, and char-4-shingle diversity.
"""

from __future__ import annotations

import calendar
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


def test_km_survival_vs_pure_product_limit(spark):
    """First→second-order gaps, censoring at the corpus max date, then
    the product-limit estimator folded in ascending event-time order
    (the engines' cumulative-window op order), depletion row forced to
    0 with its ln(0) term excluded."""
    con = duckdb.connect()
    rows = con.execute(
        f"select o_custkey, cast(o_orderdate as date)"
        f" from '{SF_DIR}/orders.parquet'"
    ).fetchall()
    con.close()
    first: dict = {}
    for ck, d in rows:
        if ck not in first or d < first[ck]:
            first[ck] = d
    second: dict = {}
    for ck, d in rows:
        if d > first[ck] and (ck not in second or d < second[ck]):
            second[ck] = d
    mx = max(d for _ck, d in rows)
    agg: dict = defaultdict(lambda: [0, 0])  # dur -> [d_i, c]
    for ck, t1 in first.items():
        if ck in second:
            dur = (second[ck] - t1).days
            agg[dur][0] += 1
        else:
            dur = (mx - t1).days
        agg[dur][1] += 1
    durs = sorted(agg)
    # n_risk at dur = everyone with duration >= dur
    n_after = 0
    n_risk = {}
    for d in reversed(durs):
        n_after += agg[d][1]
        n_risk[d] = n_after
    got = _run("order_gap_survival", spark)
    want_rows = [d for d in durs if agg[d][0] > 0]
    assert [r.duration_days for r in got] == want_rows
    log_s = 0.0
    for r, d in zip(got, want_rows):
        d_i = agg[d][0]
        assert (r.n_risk, r.n_events) == (n_risk[d], d_i)
        if d_i == n_risk[d]:
            s = 0.0
        else:
            log_s += math.log(1 - d_i * 1.0 / n_risk[d])
            s = math.exp(log_s)
        assert r.survival == pytest.approx(_r(s, 6), abs=1e-9)
    # survival is nonincreasing
    ss = [r.survival for r in got]
    assert all(a >= b for a, b in zip(ss, ss[1:]))


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"select user_id, event_type, value, ts, cast(ts as date) as day"
        f" from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def test_decayed_scores_vs_pure_fold(spark, events):
    """24h-half-life weights from floor-epoch ages; sums fsum'd (the
    4dp round absorbs partial-sum order)."""
    def epoch(ts):
        return calendar.timegm(ts.timetuple())

    t_max = max(epoch(ts) for _u, _t, _v, ts, _d in events)
    acc: dict = defaultdict(lambda: [0, [], []])
    for _u, t, v, ts, _d in events:
        w = math.exp(-math.log(2.0) * ((t_max - epoch(ts)) / 3600.0) / 24.0)
        a = acc[t]
        a[0] += 1
        a[1].append(w)
        a[2].append(v * w)
    got = _run("event_decayed_type_scores", spark)
    assert [r.event_type for r in got] == sorted(acc)
    for r in got:
        n, ws, vws = acc[r.event_type]
        assert r.n == n
        assert r.decayed_count == pytest.approx(
            _r(math.fsum(ws), 4), abs=1e-9
        )
        assert r.decayed_value == pytest.approx(
            _r(math.fsum(vws), 4), abs=1e-9
        )
        assert 0 < r.decayed_count < n  # strictly decayed, never negative


def test_entropy_profile_vs_pure_walk(spark, events):
    """Per-user-day Shannon entropy of the event-type mix (6dp), then
    the fixed ln(5)/10-width histogram."""
    mix: dict = defaultdict(lambda: defaultdict(int))
    for u, t, _v, _ts, d in events:
        mix[(u, d)][t] += 1
    width = math.log(5) / 10
    bins: dict = defaultdict(list)
    for counts in mix.values():
        n = sum(counts.values())
        ent = _r(
            -math.fsum(
                (c / (n * 1.0)) * math.log(c / (n * 1.0))
                for c in counts.values()
            ),
            6,
        )
        b = min(int(math.floor(ent / width)), 9)
        bins[b].append(ent)
    total = sum(len(v) for v in bins.values())
    got = _run("user_type_entropy_profile", spark)
    assert [r.bin for r in got] == sorted(bins)
    for r in got:
        es = bins[r.bin]
        assert r.n_user_days == len(es)
        assert r.share == pytest.approx(
            _r(len(es) / (total * 1.0), 4), abs=1e-9
        )
        assert r.avg_entropy == pytest.approx(
            _r(math.fsum(es) / len(es), 4), abs=1e-9
        )


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, lang, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return rows


def test_repetition_ratio_vs_pure_gram_walk(spark, docs):
    """Whitespace trigrams of the trimmed text; duplicate fraction."""
    got = {r.doc_id: r for r in _run("doc_repetition_ratio", spark)}
    assert set(got) == {d for d, _l, _t in docs}
    for doc_id, _lang, text in docs:
        toks = re.split(r"\s+", text.strip()) if text.strip() else []
        grams = (
            [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
            if len(toks) >= 3
            else []
        )
        ratio = (len(grams) - len(set(grams))) / float(max(len(grams), 1))
        assert got[doc_id].rep_ratio == pytest.approx(
            _r(ratio, 4), abs=1e-9
        )


def test_shingle_diversity_vs_pure_walk(spark, docs):
    """Char-4 shingles of the lowercased text; per-lang mean diversity
    and the <0.2 flag count."""
    per_lang: dict = defaultdict(list)
    for _doc_id, lang, text in docs:
        low = text.lower()
        shingles = {low[i:i + 4] for i in range(len(low) - 3)}
        n_total = max(len(low) - 3, 1)
        per_lang[lang].append(_r(len(shingles) / (n_total * 1.0), 6))
    got = {r.lang: r for r in _run("doc_shingle_diversity", spark)}
    assert set(got) == set(per_lang)
    for lang, divs in per_lang.items():
        r = got[lang]
        assert r.n_docs == len(divs)
        assert r.avg_diversity == pytest.approx(
            _r(math.fsum(divs) / len(divs), 4), abs=1e-9
        )
        assert r.n_flagged == sum(1 for d in divs if d < 0.2)

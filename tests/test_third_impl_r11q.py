"""Third-implementation checks, batch 29 — vocabulary encoding, OOV
coverage, categorical PSI drift, the sliding mean-shift detector, and
the backfill gap audit. Pure imperative Python from the parquet.
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
def doc_toks():
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return {int(i): re.split(r"\s+", t.strip()) for i, t in rows}


@pytest.fixture(scope="module")
def vocab(doc_toks):
    counts: dict[str, int] = defaultdict(int)
    for ts in doc_toks.values():
        for t in ts:
            counts[t] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:150]
    return {t: i + 1 for i, (t, _c) in enumerate(ranked)}


def test_token_ids_vs_pure_vocab_encode(spark, doc_toks, vocab):
    """Top-150 (count desc, token asc) vocabulary, 1-based ids, OOV→0;
    per-doc id strings joined by spaces — plus the reversibility check
    that every non-zero id decodes back to the original token."""
    inv = {i: t for t, i in vocab.items()}
    got = {r.doc_id: r.ids for r in _run("doc_token_ids", spark)}
    assert sorted(got) == sorted(doc_toks)
    for i, ts in doc_toks.items():
        want = " ".join(str(vocab.get(t, 0)) for t in ts)
        assert got[i] == want, i
        for tok, sid in zip(ts, got[i].split(" ")):
            if sid != "0":
                assert inv[int(sid)] == tok


def test_oov_rate_vs_pure_coverage(spark, doc_toks, vocab):
    """Occurrence-level OOV counts against the same top-150 vocabulary;
    rate = n_oov / n_tokens at 4dp, bounded in [0, 1]."""
    got = {r.doc_id: r for r in _run("doc_oov_rate", spark)}
    assert sorted(got) == sorted(doc_toks)
    for i, ts in doc_toks.items():
        oov = sum(1 for t in ts if t not in vocab)
        r = got[i]
        assert (r.n_tokens, r.n_oov) == (len(ts), oov)
        assert r.oov_rate == pytest.approx(_r(oov / len(ts), 4), abs=1e-9)
        assert 0.0 <= r.oov_rate <= 1.0


def test_status_psi_vs_pure_month_fold(spark):
    """Month × status fractions; PSI between consecutive calendar
    months folded by hand; PSI ≥ 0 (Gibbs) asserted."""
    con = duckdb.connect()
    rows = con.execute(
        f"""select strftime(date_trunc('month', o_orderdate), '%Y-%m'),
                   o_orderstatus, count(*)
            from '{SF_DIR}/orders.parquet' group by 1, 2"""
    ).fetchall()
    con.close()
    bym: dict[str, dict[str, int]] = defaultdict(dict)
    for m, st, c in rows:
        bym[m][st] = c
    months = sorted(bym)

    def nxt_month(m):
        y, mm = int(m[:4]), int(m[5:])
        mm += 1
        if mm == 13:
            y, mm = y + 1, 1
        return f"{y:04d}-{mm:02d}"

    want = {}
    for m in months:
        nm = nxt_month(m)
        if nm not in bym:
            continue
        tp, tc = sum(bym[m].values()), sum(bym[nm].values())
        psi = 0.0
        for st, c in bym[nm].items():
            if st in bym[m]:
                pc, pp = c / tc, bym[m][st] / tp
                psi += (pc - pp) * math.log(pc / pp)
        want[nm] = _r(psi, 6)
    got = {r.month: r.psi for r in _run("order_status_psi_drift", spark)}
    assert sorted(got) == sorted(want)
    for m, psi in want.items():
        assert got[m] == pytest.approx(psi, abs=2e-6)
        assert got[m] >= -1e-9  # PSI is nonnegative


def test_mean_shift_vs_pure_range_windows(spark):
    """Hourly per-type means; for each hour compare [t−24h, t−1s]
    against [t, t+24h−1s] (RANGE semantics re-implemented with epoch
    filters); flags where both windows hold ≥4 hours and the pooled-std
    z exceeds 0.9. Row set and values re-derived."""
    con = duckdb.connect()
    rows = con.execute(
        f"""select event_type, date_trunc('hour', ts), avg(value)
            from '{SF_DIR}/events.parquet' group by 1, 2"""
    ).fetchall()
    con.close()
    per: dict[str, list] = defaultdict(list)
    for et, h, v in rows:
        per[et].append((h.timestamp(), h, float(v)))
    want = {}
    for et, pts in per.items():
        pts.sort()
        for e, h, _v in pts:
            before = [v for (e2, _h2, v) in pts if e - 86400 <= e2 <= e - 1]
            after = [v for (e2, _h2, v) in pts if e <= e2 <= e + 86400 - 1]
            if len(before) < 4 or len(after) < 4:
                continue
            mb = math.fsum(before) / len(before)
            ma = math.fsum(after) / len(after)
            sb = math.sqrt(math.fsum((x - mb) ** 2 for x in before) / len(before))
            sa = math.sqrt(math.fsum((x - ma) ** 2 for x in after) / len(after))
            z = abs(ma - mb) / math.sqrt((sb * sb + sa * sa) / 2 + 1e-9)
            if z > 0.9:
                want[(et, h.strftime("%Y-%m-%d %H:%M:%S"))] = (
                    _r(ma - mb, 4),
                    _r(z, 4),
                )
    got = {
        (r.event_type, r.hour_start): (r.shift, r.zscore)
        for r in _run("event_hourly_mean_shift", spark)
    }
    assert sorted(got) == sorted(want)
    for k, (shift, z) in want.items():
        assert got[k][0] == pytest.approx(shift, abs=2e-4)
        assert got[k][1] == pytest.approx(z, abs=2e-4)
        assert got[k][1] > 0.9


def test_backfill_gap_audit_vs_pure_day_walk(spark):
    """Distinct active days per priority; span arithmetic and the
    longest hole from consecutive-day gaps; the accounting identity
    n_expected = n_present + n_missing."""
    con = duckdb.connect()
    rows = con.execute(
        f"""select distinct o_orderpriority, date_trunc('day', o_orderdate)::date
            from '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    con.close()
    days: dict[str, list] = defaultdict(list)
    for pr, d in rows:
        days[pr].append(d)
    got = {r.priority: r for r in _run("orders_backfill_gap_audit", spark)}
    assert sorted(got) == sorted(days)
    for pr, ds in days.items():
        ds.sort()
        span = (ds[-1] - ds[0]).days + 1
        max_gap = max(
            ((b - a).days - 1 for a, b in zip(ds, ds[1:])), default=0
        )
        r = got[pr]
        assert r.first_day == ds[0].strftime("%Y-%m-%d")
        assert r.last_day == ds[-1].strftime("%Y-%m-%d")
        assert (r.n_expected, r.n_present, r.n_missing) == (
            span, len(ds), span - len(ds),
        )
        assert r.max_gap_days == max_gap
        assert r.n_expected == r.n_present + r.n_missing

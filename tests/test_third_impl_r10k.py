"""Third-implementation checks, batch 11: pure-Python imperative
references (duckdb used only as a reader) for the quality-rule and
positional-retrieval families — the three-rule document quality score
(token-count band, chars-per-token band, punctuation-ratio cap), the
per-type hour-of-day OLS trend, and the NEAR positional proximity
search ('key' within 5 of 'value').
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

_PUNCT = set("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")


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


def test_quality_score_vs_pure_rule_walk(spark, docs):
    got = {r.doc_id: r for r in _run("doc_quality_score", spark)}
    assert set(got) == {d for d, _l, _t in docs}
    for doc_id, _lang, text in docs:
        t = text.strip()
        ntok = float(len(re.split(r"\s+", t)) if t else 1)
        nonspace = float(len(re.sub(r"\s", "", text)))
        n_chars = len(text)
        n_punct = sum(1 for ch in text if ch in _PUNCT)
        pr = _r(n_punct / max(n_chars, 1), 10)
        r1 = 1.0 if 10 <= ntok <= 100000 else 0.3
        cpt = nonspace / max(ntok, 1.0)
        r2 = 1.0 if 2.0 <= cpt <= 12.0 else 0.4
        r3 = 1.0 if pr <= 0.2 else 0.5
        q = _r((r1 + r2 + r3) / 3.0, 4)
        assert got[doc_id].quality == pytest.approx(q, abs=1e-9)
        assert 0.0 < got[doc_id].quality <= 1.0


def test_hourly_trend_vs_pure_ols(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select event_type, hour(ts), value"
        f" from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    pts: dict = defaultdict(list)
    for t, h, v in rows:
        pts[t].append((float(h), v))
    got = {r.event_type: r for r in _run("event_value_hourly_trend", spark)}
    assert set(got) == set(pts)
    for t, ps in pts.items():
        n = len(ps)
        sx = math.fsum(x for x, _y in ps)
        sy = math.fsum(y for _x, y in ps)
        sxx = math.fsum(x * x for x, _y in ps)
        sxy = math.fsum(x * y for x, y in ps)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        r = got[t]
        assert r.n == n
        assert r.slope == pytest.approx(_r(slope, 6), abs=1e-9)
        assert r.intercept == pytest.approx(
            _r((sy - slope * sx) / n, 6), abs=1e-9
        )


def test_proximity_search_vs_pure_position_walk(spark, docs):
    """All ('key','value') position pairs within distance 5, counted
    with multiplicity; distinct matching docs per lang."""
    n_pairs: dict = defaultdict(int)
    n_docs: dict = defaultdict(set)
    for doc_id, lang, text in docs:
        t = text.strip()
        toks = re.split(r"\s+", t) if t else []
        pos_a = [i for i, w in enumerate(toks) if w == "key"]
        pos_b = [i for i, w in enumerate(toks) if w == "value"]
        c = sum(
            1 for i in pos_a for j in pos_b if abs(i - j) <= 5
        )
        if c:
            n_pairs[lang] += c
            n_docs[lang].add(doc_id)
    got = _run("doc_proximity_search", spark)
    assert [r.lang for r in got] == sorted(n_pairs)
    for r in got:
        assert r.n_docs == len(n_docs[r.lang])
        assert r.n_pairs == n_pairs[r.lang]
        assert r.n_pairs >= r.n_docs  # every matching doc has >= 1 pair

"""Third-implementation checks, batch 30 — corpus-shaping walks:
Flesch readability, the T5 span-corruption plan, sliding-window
chunking, chunk-level dedup accounting, the staged filter funnel, and
the per-source health report. Pure imperative Python from the parquet.
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


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, lang, source, text, n_chars from"
        f" '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return {int(i): (lang, src, t, int(nc)) for i, lang, src, t, nc in rows}


def test_readability_vs_pure_flesch(spark, docs):
    """FRE = 206.835 − 1.015·wps − 84.6·spw with vowel-group syllables
    and terminal-punctuation sentences, per-doc ratios rounded 6 then
    language-averaged at 4dp."""
    per: dict[str, list] = defaultdict(list)
    for _i, (lang, _s, t, _nc) in docs.items():
        words = len(re.split(r"\s+", t.strip()))
        sents = max(1, len(re.findall(r"[.!?]+", t)))
        syls = len(re.findall(r"[aeiouy]+", t.lower()))
        wps = _r(words / sents, 6)
        spw = _r(syls / words, 6)
        fre = _r(206.835 - 1.015 * (words / sents) - 84.6 * (syls / words), 6)
        per[lang].append((wps, spw, fre))
    got = {r.lang: r for r in _run("doc_readability", spark)}
    assert sorted(got) == sorted(per)
    for lang, rows in per.items():
        r = got[lang]
        n = len(rows)
        assert r.n_docs == n
        assert r.avg_words_per_sentence == pytest.approx(
            _r(math.fsum(w for w, _s, _f in rows) / n, 4), abs=2e-4
        )
        assert r.avg_syllables_per_word == pytest.approx(
            _r(math.fsum(s for _w, s, _f in rows) / n, 4), abs=2e-4
        )
        assert r.avg_reading_ease == pytest.approx(
            _r(math.fsum(f for _w, _s, f in rows) / n, 4), abs=2e-4
        )
        assert r.n_easy == sum(1 for _w, _s, f in rows if f >= 60)


def test_span_corruption_vs_pure_mask_walk(spark, docs):
    """Positions mask where unit_hash('mask', 'id-p') < 0.15; spans =
    runs of consecutive masked positions; per-lang rollup. Plus the
    design bound: realized mask_ratio lands near 15% and
    avg_span_len ≥ 1."""
    per: dict[str, list] = defaultdict(lambda: [0, 0, 0, 0])
    for i, (lang, _s, t, _nc) in docs.items():
        ntok = len(re.split(r"\s+", t.strip()))
        masked = [p for p in range(ntok) if _uh("mask", f"{i}-{p}") < 0.15]
        if not masked:
            continue
        spans = 1 + sum(
            1 for a, b in zip(masked, masked[1:]) if b != a + 1
        )
        row = per[lang]
        row[0] += 1
        row[1] += ntok
        row[2] += len(masked)
        row[3] += spans
    got = {r.lang: r for r in _run("doc_span_corruption_plan", spark)}
    assert sorted(got) == sorted(per)
    for lang, (nd, ntok, nm, ns) in per.items():
        r = got[lang]
        assert (r.n_docs, r.n_tokens, r.n_masked, r.n_spans) == (nd, ntok, nm, ns)
        assert r.mask_ratio == pytest.approx(_r(nm / ntok, 4), abs=1e-9)
        assert r.avg_span_len == pytest.approx(_r(nm / ns, 4), abs=1e-9)
        assert 0.10 <= r.mask_ratio <= 0.20
        assert r.avg_span_len >= 1.0


@pytest.fixture(scope="module")
def chunks(docs):
    """(doc_id, chunk_idx, start, n, hash) for window 32 / stride 24."""
    out = []
    for i, (_l, _s, t, _nc) in sorted(docs.items()):
        toks = re.split(r"\s+", t.strip())
        starts = list(range(1, max(len(toks), 1) + 1, 24))
        for start in starts:
            piece = toks[start - 1 : min(start + 31, len(toks))]
            out.append(
                (
                    i,
                    (start - 1) // 24,
                    start,
                    min(len(toks) - start + 1, 32),
                    _md5(" ".join(piece)),
                )
            )
    return out


def test_chunk_windows_vs_pure_slide(spark, chunks):
    got = [
        (r.doc_id, r.chunk_idx, r.start, r.n_chunk_tokens, r.chunk_hash)
        for r in _run("doc_chunk_windows", spark)
    ]
    assert sorted(got) == sorted(chunks)
    # overlap contract: consecutive chunks of one doc overlap by 8
    # tokens except possibly the tail
    by_doc: dict[int, list] = defaultdict(list)
    for i, idx, start, n, _h in chunks:
        by_doc[i].append((idx, start, n))
    for _i, cs in by_doc.items():
        cs.sort()
        for (i1, s1, n1), (_i2, s2, _n2) in zip(cs, cs[1:]):
            assert s2 - s1 == 24


def test_chunk_dedup_rate_vs_pure_first_occurrence(spark, chunks):
    """Corpus-wide first occurrence per chunk hash under the
    (doc_id, chunk_idx) order; per-doc duplicate accounting."""
    first: dict[str, tuple] = {}
    for i, idx, _s, _n, h in sorted(chunks, key=lambda c: (c[0], c[1])):
        first.setdefault(h, (i, idx))
    per_doc: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for i, idx, _s, _n, h in chunks:
        row = per_doc[i]
        row[0] += 1
        if first[h] != (i, idx):
            row[1] += 1
    got = {r.doc_id: r for r in _run("doc_chunk_dedup_rate", spark)}
    assert sorted(got) == sorted(per_doc)
    for i, (n, dup) in per_doc.items():
        r = got[i]
        assert (r.n_chunks, r.n_dup_chunks) == (n, dup)
        assert r.dup_ratio == pytest.approx(_r(dup / n, 4), abs=1e-9)


def test_filter_funnel_vs_pure_rule_walk(spark, docs):
    """The four staged rules walked doc by doc (language, length band,
    distinct-token ratio, chars-per-token band); stage counts are
    monotone nonincreasing by construction."""
    s = [0, 0, 0, 0, 0]
    langs = {"de", "en", "es", "fr"}
    for _i, (lang, _src, t, _nc) in docs.items():
        toks = re.split(r"\s+", t.strip())
        ntok, ndist = len(toks), len(set(toks))
        nonws = len(re.sub(r"\s", "", t))
        s[0] += 1
        if lang not in langs:
            continue
        s[1] += 1
        if not (20 <= ntok <= 1000):
            continue
        s[2] += 1
        if not (ndist >= 0.3 * ntok):
            continue
        s[3] += 1
        if 3 * ntok <= nonws <= 12 * ntok:
            s[4] += 1
    got = [(r.stage, r.n_pass, r.pct_of_total) for r in _run("corpus_filter_funnel", spark)]
    names = ["0_total", "1_lang", "2_length", "3_repetition", "4_token_shape"]
    assert [g[0] for g in got] == names
    for (stage, n, pct), want_n in zip(got, s):
        assert n == want_n, stage
        assert pct == pytest.approx(_r(want_n / s[0], 4), abs=1e-9)
    assert all(a >= b for a, b in zip(s, s[1:]))


def test_source_report_vs_pure_rollup(spark, docs):
    """Per-source language entropy (−Σ p ln p), exact-duplicate rate
    from canonical fingerprints, and mean length — entropy bounded by
    ln(n_langs)."""
    by_src: dict[str, list] = defaultdict(list)
    for i, (lang, src, t, nc) in docs.items():
        fp = _md5(re.sub(r"\s+", " ", t.strip().lower()))
        by_src[src].append((lang, fp, nc))
    got = {r.source: r for r in _run("doc_source_report", spark)}
    assert sorted(got) == sorted(by_src)
    for src, rows in by_src.items():
        n = len(rows)
        lc: dict[str, int] = defaultdict(int)
        for lang, _fp, _nc in rows:
            lc[lang] += 1
        ent = -math.fsum((c / n) * math.log(c / n) for c in lc.values())
        uniq = len({fp for _l, fp, _nc in rows})
        r = got[src]
        assert (r.n_docs, r.n_langs) == (n, len(lc))
        assert r.lang_entropy == pytest.approx(_r(ent, 4), abs=2e-4)
        assert r.dup_rate == pytest.approx(_r(1.0 - uniq / n, 4), abs=1e-9)
        assert r.avg_chars == pytest.approx(
            _r(math.fsum(nc for _l, _f, nc in rows) / n, 2), abs=2e-2
        )
        assert r.lang_entropy <= math.log(len(lc)) + 1e-9

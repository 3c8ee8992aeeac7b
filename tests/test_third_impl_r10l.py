"""Third-implementation checks, batch 12: pure-Python imperative
references (duckdb used only as a reader) for the path-mining,
histogram-quantile, and language-ID families — top event-type trigram
paths, per-type histogram quantiles with in-bin linear interpolation,
and the stopword-marker language classifier (space-padded
non-overlapping replace semantics replicated literally).
"""

from __future__ import annotations

import math
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


def test_top_paths_vs_pure_trigram_walk(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select user_id, event_type, ts, event_id"
        f" from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    per_u: dict = defaultdict(list)
    for u, t, ts, eid in rows:
        per_u[u].append((ts, eid, t))
    paths: dict = defaultdict(int)
    for seq in per_u.values():
        seq.sort()
        ts_types = [t for _ts, _e, t in seq]
        for a, b, c in zip(ts_types, ts_types[1:], ts_types[2:]):
            paths[f"{a}>{b}>{c}"] += 1
    want = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = _run("top_session_paths", spark)
    assert [(r.path, r.n) for r in got] == want


def test_hist_quantiles_vs_pure_interp_walk(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"select event_type, value from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    bins: dict = defaultdict(lambda: defaultdict(int))
    for t, v in rows:
        b = min(49, max(0, int(math.floor((v - 0.0) / 10.0))))
        bins[t][b] += 1
    want = []
    for t in sorted(bins):
        n = sum(bins[t].values())
        for p in (0.5, 0.9, 0.99):
            cum = 0
            for b in sorted(bins[t]):
                c = bins[t][b]
                cum += c
                if cum >= p * n:
                    q = _r(0.0 + 10.0 * (b + (p * n - (cum - c)) / c), 6)
                    want.append((t, p, q, n))
                    break
    got = _run("event_value_hist_quantiles", spark)
    assert len(got) == len(want)
    for r, (t, p, q, n) in zip(got, want):
        assert (r.event_type, r.n) == (t, n)
        assert r.p == pytest.approx(p, abs=1e-12)
        assert r.quantile == pytest.approx(q, abs=1e-9)
    # within a type, quantiles are nondecreasing in p
    by_t: dict = defaultdict(list)
    for r in got:
        by_t[r.event_type].append(r.quantile)
    for qs in by_t.values():
        assert qs == sorted(qs)


_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "que"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
}


def test_lang_id_vs_pure_replace_walk(spark):
    """Marker hit rates via the space-padded NON-OVERLAPPING replace
    (consecutive markers share a space and count once per pair — the
    replace semantics both engines use, replicated with str.replace);
    tie priority de < en < es < fr, 'und' on zero."""
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, lang, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    conf: dict = defaultdict(int)
    for _d, lang, text in rows:
        padded = " " + text.strip() + " "
        scores = {}
        for lg, words in _MARKERS.items():
            s = 0.0
            for w in words:
                needle = f" {w} "
                s += (len(padded) - len(padded.replace(needle, ""))) / float(
                    len(w) + 2
                )
            scores[lg] = s
        best = max(scores.values())
        if best <= 0:
            pred = "und"
        else:
            pred = next(
                lg for lg in ("de", "en", "es", "fr") if scores[lg] == best
            )
        conf[(lang, pred)] += 1
    got = _run("doc_lang_id", spark)
    assert [(r.lang, r.lang_pred) for r in got] == sorted(conf)
    for r in got:
        assert r.n == conf[(r.lang, r.lang_pred)]
    # the labeled language should dominate its own row of the confusion
    by_lang: dict = defaultdict(dict)
    for (lang, pred), n in conf.items():
        by_lang[lang][pred] = n
    for lang, preds in by_lang.items():
        if lang in preds:
            assert preds[lang] == max(preds.values())

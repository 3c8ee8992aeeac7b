"""Third-implementation checks, batch 40 — ANN search faces and
semi-structured extraction: exact brute-force cosine top-k walked with
explicit dot/norm folds, sign-LSH bucketing (md5-derived hyperplanes,
bit-signature buckets, in-bucket exact rescore), the JSON props
aggregate through Python's ``json`` (a THIRD JSON parser beside Spark's
Jackson path and DuckDB's yyjson), its VARIANT-typed sibling, and the
UDTF span-annotation fingerprint recomputed from plain ``str.split``.
"""

from __future__ import annotations

import hashlib
import json as jsonlib
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


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def embeddings():
    con = duckdb.connect()
    rows = con.execute(
        f"select vec_id, embedding from '{SF_DIR}/embeddings.parquet'"
        f" order by vec_id"
    ).fetchall()
    con.close()
    return {int(i): [float(x) for x in v] for i, v in rows}


def _cos(a, b):
    dot = math.fsum(x * y for x, y in zip(a, b))
    na = math.sqrt(math.fsum(x * x for x in a))
    nb = math.sqrt(math.fsum(y * y for y in b))
    return dot / (na * nb)


def _topk_within(vecs, qids, cand_of, k=5):
    out = []
    for q in sorted(qids):
        scored = sorted(
            (
                (-_r(_cos(vecs[q], vecs[c]), 6), c)
                for c in cand_of(q)
                if c != q
            )
        )[:k]
        out.extend((q, c, -s) for s, c in sorted(scored))
    return sorted(out)


def test_topk_bruteforce_vs_dot_fold(spark, embeddings):
    qids = [i for i in embeddings if i < 10]
    expected = _topk_within(embeddings, qids, lambda _q: embeddings)

    got = sorted(
        (r.query_id, r.neighbor_id, r.cosine)
        for r in _run("embedding_topk_bruteforce", spark)
    )
    assert got == expected


_PLANES = 6


def test_topk_lsh_vs_signature_bucket_walk(spark, embeddings):
    planes = [
        [int(_md5(f"{p}-{d}")[0], 16) - 7.5 for d in range(64)]
        for p in range(_PLANES)
    ]
    sig = {}
    for i, v in embeddings.items():
        bits = []
        for pl in planes:
            dot = math.fsum(a * b for a, b in zip(v, pl))
            bits.append("1" if dot > 0 else "0")
        sig[i] = "".join(bits)
    buckets: dict = defaultdict(set)
    for i, s in sig.items():
        buckets[s].add(i)
    qids = [i for i in embeddings if i < 10]
    expected = _topk_within(embeddings, qids, lambda q: buckets[sig[q]])

    got = sorted(
        (r.query_id, r.neighbor_id, r.cosine)
        for r in _run("embedding_topk_lsh", spark)
    )
    assert got == expected
    # the LSH answer really is bucket-local: every returned neighbor
    # shares its query's full signature
    assert all(sig[q] == sig[c] for q, c, _s in got)


@pytest.fixture(scope="module")
def events_props():
    con = duckdb.connect()
    rows = con.execute(
        f"select event_type, props from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


@pytest.mark.parametrize("name", ["event_props_json", "event_props_variant"])
def test_props_extraction_vs_python_json(spark, events_props, name):
    agg: dict = defaultdict(list)
    for et, props in events_props:
        k = jsonlib.loads(props).get("k") if props else None
        agg[et].append(k)
    expected = []
    for et in sorted(agg):
        ks = [k for k in agg[et] if k is not None]
        row = (et, len(agg[et]))
        if name == "event_props_variant":
            row += (len(ks),)
        row += (_r(math.fsum(float(k) for k in ks) / len(ks), 4),)
        if name == "event_props_variant":
            row += (max(int(k) for k in ks),)
        expected.append(row)

    got = [tuple(r) for r in _run(name, spark)]
    assert got == expected


def test_word_spans_vs_str_split_walk(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"select doc_id, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    expected = []
    for i, t in sorted(docs):
        words = t.split(" ")
        spans, off = [], 0
        for pos, w in enumerate(words):
            spans.append((pos, off, w))
            off += len(w) + 1
        end_char = max(s + len(w) for _p, s, w in spans)
        fp = _md5(",".join(f"{p}:{s}:{w}" for p, s, w in spans))
        expected.append((i, len(words), end_char, fp))

    got = [
        (r.doc_id, r.n_words, r.end_char, r.spans_fp)
        for r in _run("doc_word_spans_udtf", spark)
    ]
    assert got == expected

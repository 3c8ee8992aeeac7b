"""Third-implementation checks, batch 44 — per-document text statistics
and grouped economics: token/char/punctuation stats with explicit
character-class scans, GPT-2-style pre-tokenizer class counts through
Python `re`, the hashing-trick TF sketch (bucket dict, L2, argmax
bucket), per-language bigram leaderboards, per-brand OLS elasticity
with exact-decimal sufficient statistics, and the two-sided trade
balance from independent join paths folded by hand.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entry.queries()


def _r(x: float, dp: int) -> float:
    from decimal import ROUND_HALF_UP

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, lang, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return {int(i): (lang, t) for i, lang, t in rows}


def test_text_stats_vs_char_scans(spark, docs):
    punct = set("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")
    expected = []
    for i in sorted(docs):
        t = docs[i][1]
        toks = re.split(r"\s+", t.strip())
        nonspace = sum(1 for c in t if not c.isspace())
        n_punct = sum(1 for c in t if c in punct)
        expected.append(
            (
                i,
                len(toks),
                len(t),
                _r(nonspace / len(toks), 4),
                _r(n_punct / max(len(t), 1), 4),
                _md5(re.sub(r"\s+", " ", t.strip().lower())),
            )
        )

    got = [
        (
            r.doc_id,
            r.token_count,
            r.char_count,
            r.avg_token_len,
            r.punct_ratio,
            r.fingerprint,
        )
        for r in _run("doc_text_stats", spark)
    ]
    assert got == expected


def test_token_classes_vs_python_re(spark, docs):
    expected = []
    for i in sorted(docs):
        t = docs[i][1]
        expected.append(
            (
                i,
                len(re.findall(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]", t)),
                len(re.findall(r"[A-Za-z]+", t)),
                len(re.findall(r"[0-9]", t)),
                len(re.findall(r"[^A-Za-z0-9\s]", t)),
            )
        )

    got = [
        (
            r.doc_id,
            r.n_bpe_tokens,
            r.n_word_tokens,
            r.n_digit_tokens,
            r.n_other_tokens,
        )
        for r in _run("doc_token_classes", spark)
    ]
    assert got == expected


_HTF_D = 64


def test_hashing_tf_vs_bucket_dict(spark, docs):
    expected = []
    for i in sorted(docs):
        t = docs[i][1]
        tf: dict = defaultdict(int)
        for tok in re.split(r"\s+", t.strip()):
            tf[int(_md5(tok)[:12], 16) % _HTF_D] += 1
        top = max(tf.values())
        expected.append(
            (
                i,
                len(tf),
                _r(math.sqrt(sum(c * c for c in tf.values())), 4),
                min(b for b, c in tf.items() if c == top),
            )
        )

    got = [
        (r.doc_id, r.nnz, r.l2_norm, r.top_bucket)
        for r in _run("doc_hashing_tf", spark)
    ]
    assert got == expected


def test_top_bigrams_vs_leaderboard_walk(spark, docs):
    cnt: dict = defaultdict(int)
    for i, (lang, t) in docs.items():
        toks = re.split(r"\s+", t.strip())
        for a, b in zip(toks, toks[1:]):
            cnt[(lang, f"{a} {b}")] += 1
    by_lang: dict = defaultdict(list)
    for (lang, bg), n in cnt.items():
        by_lang[lang].append((-n, bg))
    expected = []
    for lang in sorted(by_lang):
        for rnk, (negn, bg) in enumerate(sorted(by_lang[lang])[:3], start=1):
            expected.append((lang, bg, -negn, rnk))

    got = [
        (r.lang, r.bigram, r.cnt, r.rnk)
        for r in _run("top_bigrams_per_lang", spark)
    ]
    assert got == expected


def test_discount_elasticity_vs_exact_decimal_ols(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""select p_brand, l_discount, l_quantity
            from '{SF_DIR}/lineitem.parquet' l
            join '{SF_DIR}/part.parquet' p on l_partkey = p_partkey"""
    ).fetchall()
    con.close()
    q6 = Decimal("0.000001")
    acc: dict = defaultdict(lambda: [0, Decimal(0), Decimal(0), Decimal(0), Decimal(0), Decimal(0)])
    for brand, x, y in rows:
        xd = Decimal(repr(float(x))).quantize(q6)
        yd = Decimal(repr(float(y))).quantize(q6)
        a = acc[brand]
        a[0] += 1
        a[1] += xd
        a[2] += yd
        a[3] += xd * xd
        a[4] += xd * yd
        a[5] += yd * yd
    expected = []
    for brand in sorted(acc):
        n, sxd, syd, sxxd, sxyd, syyd = acc[brand]
        sx, sy, sxx, sxy, syy = map(float, (sxd, syd, sxxd, sxyd, syyd))
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        expected.append(
            (
                brand,
                n,
                _r(num / den, 6),
                _r(num * num / (den * (n * syy - sy * sy)), 6),
            )
        )

    got = [
        (r.brand, r.n_lines, r.slope, r.r2)
        for r in _run("brand_discount_elasticity", spark)
    ]
    assert got == expected


def test_trade_balance_vs_two_path_fold(spark):
    con = duckdb.connect()
    cust_rev = dict(
        con.execute(
            f"""select c_nationkey, sum(o_totalprice)
                from '{SF_DIR}/orders.parquet' o
                join '{SF_DIR}/customer.parquet' c on o_custkey = c_custkey
                group by 1"""
        ).fetchall()
    )
    supp_rev = dict(
        con.execute(
            f"""select s_nationkey, sum(l_extendedprice * (1 - l_discount))
                from '{SF_DIR}/lineitem.parquet' l
                join '{SF_DIR}/supplier.parquet' s on l_suppkey = s_suppkey
                group by 1"""
        ).fetchall()
    )
    nations = con.execute(
        f"select n_nationkey, n_name from '{SF_DIR}/nation.parquet'"
    ).fetchall()
    con.close()
    expected = sorted(
        (
            name,
            _r(float(cust_rev.get(nk, 0.0)), 2),
            _r(float(supp_rev.get(nk, 0.0)), 2),
            _r(float(cust_rev.get(nk, 0.0)) - float(supp_rev.get(nk, 0.0)), 2),
        )
        for nk, name in nations
    )

    got = [
        (r.n_name, r.cust_revenue, r.supp_revenue, r.balance)
        for r in _run("nation_trade_balance", spark)
    ]
    assert got == expected

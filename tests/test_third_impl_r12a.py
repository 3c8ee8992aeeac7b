"""Third-implementation checks, batch 33 — the highest restatement-risk
ALGORITHMIC entries that still lacked a pure-Python reference (round-11
verdict, next-round item 5): no-straddle first-fit packing (sequential
per-bucket recurrence, rows-only in the driver — exactly where a third
witness matters most), Levenshtein re-verification of MinHash candidates,
Fellegi–Sunter blocked match weights, blocked fuzzy name linkage, and the
unrolled-GD logistic domain classifier (feature build → 6 GD steps →
rank-identity AUC). Each walked imperatively (dicts, explicit DP tables,
float folds) from the parquet — the Spark plan and the oracle restate
the same algorithm relationally twice; this is the non-relational third
statement.
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


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


def _levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance, explicit DP rows (the third statement of
    what Spark's `levenshtein` and DuckDB's `levenshtein` both compute)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, lang, text, n_chars"
        f" from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return {int(i): (lang, t, int(nc)) for i, lang, t, nc in rows}


@pytest.fixture(scope="module")
def parts():
    con = duckdb.connect()
    rows = con.execute(
        f"select p_partkey, p_name, p_brand, p_type, p_size, p_retailprice"
        f" from '{SF_DIR}/part.parquet'"
    ).fetchall()
    con.close()
    return rows


# --------------------------------------------------------------------------
# doc_pack_firstfit — the rows-only driver entry (no SQL oracle exists for
# the open-pack recurrence, so this walk is its only independent witness)
# --------------------------------------------------------------------------

_PACK_BUDGET, _PACK_BUCKETS = 512, 8


def test_firstfit_packing_vs_pure_sequential_walk(spark, docs):
    by_bucket: dict[int, list[tuple[str, int, int]]] = defaultdict(list)
    for i, (_lang, t, _nc) in docs.items():
        n_tok = len(re.split(r"\s+", t.strip()))
        b = int(_md5(str(i))[:12], 16) % _PACK_BUCKETS
        by_bucket[b].append((_md5(str(i)), i, n_tok))
    expected: dict[int, tuple[int, int, int]] = {}
    for b, rows in by_bucket.items():
        rows.sort()  # (md5(id), id) order — same layout as the plan
        pack, used = 0, 0
        for _h, i, n in rows:
            if used > 0 and used + n > _PACK_BUDGET:
                pack, used = pack + 1, 0
            expected[i] = (b, n, b * 2**32 + pack)
            used += n

    got = {
        r.doc_id: (r.bucket, r.n_tokens, r.pack_id)
        for r in _run("doc_pack_firstfit", spark)
    }
    assert got == expected
    # invariant only the sequential statement exposes: multi-doc packs
    # never exceed the budget
    tot: dict[int, int] = defaultdict(int)
    members: dict[int, int] = defaultdict(int)
    for _i, (_b, n, pid) in expected.items():
        tot[pid] += n
        members[pid] += 1
    assert all(
        tot[p] <= _PACK_BUDGET for p in tot if members[p] > 1
    )


# --------------------------------------------------------------------------
# edit_distance_near_dup — MinHash-LSH candidates re-verified by explicit
# DP Levenshtein on 200-char canonical prefixes
# --------------------------------------------------------------------------

_K, _NH, _NB = 8, 16, 4
_THRESH = 0.35
_P = 2_147_483_647
_MIX_A, _MIX_B = 0x9E3779B1, 0x85EBCA6B
_ED_PREFIX, _ED_MAX = 200, 40


def _minhash_survivors(texts: dict[int, str]) -> list[tuple[int, int]]:
    """The batch-17 MinHash-LSH walk reduced to its surviving pair ids:
    char-8 shingles → md5→28-bit base → 16 universal hashes → 4 bands of
    4 → bucket candidates → exact Jaccard ≥ 0.35."""
    shingle_sets, sigs = {}, {}
    for i, t in texts.items():
        sh = {t[p : p + _K] for p in range(max(len(t) - (_K - 1), 1))}
        shingle_sets[i] = sh
        hs = [int(_md5(s)[:7], 16) for s in sh]
        sig = []
        for s in range(_NH):
            a = (_MIX_A * (s + 1)) % _P
            b = (_MIX_B * (s + 1)) % _P
            sig.append(min((a * h + b) % _P for h in hs))
        sigs[i] = sig
    buckets: dict[tuple, list[int]] = defaultdict(list)
    for i, sig in sigs.items():
        for band in range(_NB):
            key = _md5("|".join(str(v) for v in sig[band * 4 : band * 4 + 4]))
            buckets[(band, key)].append(i)
    cands = set()
    for members in buckets.values():
        ms = sorted(members)
        for x, a in enumerate(ms):
            for b in ms[x + 1 :]:
                cands.add((a, b))
    out = []
    for a, b in sorted(cands):
        inter = len(shingle_sets[a] & shingle_sets[b])
        jac = inter / (len(shingle_sets[a]) + len(shingle_sets[b]) - inter)
        if _r(jac, 4) >= _THRESH:
            out.append((a, b))
    return out


def test_edit_distance_near_dup_vs_dp_levenshtein(spark, docs):
    texts = {i: t for i, (_l, t, _nc) in docs.items()}
    canon = {
        i: re.sub(r"\s+", " ", t.strip().lower())[:_ED_PREFIX]
        for i, t in texts.items()
    }
    expected = []
    for a, b in _minhash_survivors(texts):
        d = _levenshtein(canon[a], canon[b])
        if d <= _ED_MAX:
            expected.append((a, b, d))

    got = [
        (r.id_a, r.id_b, r.edit_dist)
        for r in _run("edit_distance_near_dup", spark)
    ]
    assert sorted(got) == expected


# --------------------------------------------------------------------------
# part_fs_match_weights — Fellegi–Sunter log2(m/u) evidence sums over
# (brand, size)-blocked pairs
# --------------------------------------------------------------------------

_FS_MU = {
    "p_type": (0.9, 1 / 6),
    "p_name": (0.7, 0.08),
    "p_retailprice": (0.8, 0.1),
}


def test_fellegi_sunter_weights_vs_pure_blocked_walk(spark, parts):
    wa = {
        f: math.log(m / u) / math.log(2.0) for f, (m, u) in _FS_MU.items()
    }
    wd = {
        f: math.log((1 - m) / (1 - u)) / math.log(2.0)
        for f, (m, u) in _FS_MU.items()
    }
    blocks: dict[tuple, list] = defaultdict(list)
    for row in parts:
        pk, name, brand, ptype, size, price = row
        blocks[(brand, size)].append((int(pk), name, ptype, float(price)))
    expected = []
    for members in blocks.values():
        members.sort()
        for x, (ka, na, ta, pa) in enumerate(members):
            for kb, nb, tb, pb in members[x + 1 :]:
                ag_t = ta == tb
                ag_n = na.split(" ")[0] == nb.split(" ")[0]
                ag_p = abs(pa - pb) <= 10.0
                w = (
                    (wa["p_type"] if ag_t else wd["p_type"])
                    + (wa["p_name"] if ag_n else wd["p_name"])
                    + (wa["p_retailprice"] if ag_p else wd["p_retailprice"])
                )
                expected.append((ka, kb, ag_t, ag_n, ag_p, _r(w, 4)))
    expected.sort()

    got = sorted(
        (
            r.id_a,
            r.id_b,
            r.p_type_agree,
            r.p_name_agree,
            r.p_retailprice_agree,
            r.weight,
        )
        for r in _run("part_fs_match_weights", spark)
    )
    assert got == expected
    # the three weight literals really are log2(m/u): spot the all-agree
    # total against the independently derived constants
    all_agree = sum(wa.values())
    for _a, _b, t, n, p, w in expected:
        if t and n and p:
            assert w == _r(all_agree, 4)


# --------------------------------------------------------------------------
# part_name_fuzzy_pairs — blocking key + DP edit distance <= 3
# --------------------------------------------------------------------------


def test_blocked_fuzzy_pairs_vs_dp_levenshtein(spark, parts):
    names = sorted({row[1] for row in parts})
    blocks: dict[str, list[str]] = defaultdict(list)
    for n in names:
        toks = n.split(" ")
        blocks[toks[1] if len(toks) > 1 else ""].append(n)
    expected = []
    for members in blocks.values():
        for x, a in enumerate(members):
            for b in members[x + 1 :]:
                lo, hi = min(a, b), max(a, b)
                d = _levenshtein(lo, hi)
                if d <= 3:
                    expected.append((lo, hi, d))
    expected.sort()

    got = sorted(
        (r.name_a, r.name_b, r.dist)
        for r in _run("part_name_fuzzy_pairs", spark)
    )
    assert got == expected


# --------------------------------------------------------------------------
# doc_domain_classifier_gd — feature build, 6 full-batch GD steps, scoring,
# rank-identity AUC, accuracy, log-loss: the whole trainer as float folds
# --------------------------------------------------------------------------

_LR_BUCKETS, _LR_STEPS = 64, 6


def test_gd_domain_classifier_vs_pure_trainer(spark, docs):
    # hashed-unigram bucket stream (every occurrence, not distinct)
    tok: list[tuple[int, int, int]] = []  # (doc_id, y, bucket)
    for i, (lang, t, _nc) in docs.items():
        y = 1 if lang == "en" else 0
        for term in re.split(r"\s+", t.strip()):
            tok.append((i, y, int(_md5(term)[:6], 16) % _LR_BUCKETS))
    n_r: dict[int, int] = defaultdict(int)
    n_t: dict[int, int] = defaultdict(int)
    for _i, y, b in tok:
        n_r[b] += 1
        n_t[b] += y
    tr, tt = sum(n_r.values()), sum(n_t.values())
    llr = {
        b: _r(
            math.log(
                ((n_t[b] + 1) / (tt + float(_LR_BUCKETS)))
                / ((n_r[b] + 1) / (tr + float(_LR_BUCKETS)))
            ),
            6,
        )
        for b in n_r
    }
    sw: dict[int, float] = defaultdict(float)
    cw: dict[int, int] = defaultdict(int)
    for i, _y, b in tok:
        sw[i] += llr[b]
        cw[i] += 1
    feat = []
    for i, (lang, _t, nc) in docs.items():
        feat.append(
            (
                1 if lang == "en" else 0,
                _r(math.log(1 + nc), 6),
                _r(sw[i] / cw[i], 6),
            )
        )
    n = len(feat)
    m1 = sum(f[1] for f in feat) / n
    s1 = math.sqrt(sum((f[1] - m1) ** 2 for f in feat) / n)
    m2 = sum(f[2] for f in feat) / n
    s2 = math.sqrt(sum((f[2] - m2) ** 2 for f in feat) / n)
    z = [(y, _r((f1 - m1) / s1, 6), _r((f2 - m2) / s2, 6)) for y, f1, f2 in feat]

    a = b = c = 0.0
    for _ in range(_LR_STEPS):
        g0 = ga = gb = 0.0
        for y, z1, z2 in z:
            p = 1 / (1 + math.exp(-(a + b * z1 + c * z2)))
            g0 += y - p
            ga += (y - p) * z1
            gb += (y - p) * z2
        a, b, c = a + _r(g0 / n, 6), b + _r(ga / n, 6), c + _r(gb / n, 6)

    scored = [
        (y, _r(1 / (1 + math.exp(-(a + b * z1 + c * z2))), 6))
        for y, z1, z2 in z
    ]
    # rank-identity AUC over the distinct-probability pre-aggregate
    dist: dict[float, list[int]] = defaultdict(lambda: [0, 0])
    for y, p in scored:
        dist[p][0] += 1
        dist[p][1] += y
    cum, r1, n1 = 0, 0.0, 0
    for p in sorted(dist):
        cnt, cnt1 = dist[p]
        midrank = cum + (cnt + 1) / 2.0
        r1 += midrank * cnt1
        n1 += cnt1
        cum += cnt
    auc = _r((r1 - n1 * (n1 + 1) / 2.0) / (n1 * (n - n1)), 4)
    ncorr = sum(1 for y, p in scored if (p >= 0.5) == (y == 1))
    logloss = _r(
        sum(
            -(y * math.log(max(p, 1e-9)) + (1 - y) * math.log(max(1 - p, 1e-9)))
            for y, p in scored
        )
        / n,
        4,
    )

    [row] = _run("doc_domain_classifier_gd", spark)
    assert (
        row.n_docs,
        row.n_pos,
        row.w_bias,
        row.w_len,
        row.w_llr,
        row.train_logloss,
        row.auc,
        row.accuracy,
    ) == (
        n,
        n1,
        _r(a, 6),
        _r(b, 6),
        _r(c, 6),
        logloss,
        auc,
        _r(ncorr / n, 4),
    )

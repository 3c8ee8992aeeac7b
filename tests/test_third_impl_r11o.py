"""Third-implementation checks, batch 27 — packing and sampling-policy
walks: contiguous-fill sequence packing, the leakage-safe group split,
temperature-flattened language sampling, DoReMi mixture reweighting, and
quality-aware keep-best dedup (re-deriving the MinHash clusters AND the
three-rule quality score imperatively). Pure Python from the parquet.
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


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, lang, text, n_chars from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return {int(i): (lang, t, int(nc)) for i, lang, t, nc in rows}


def test_pack_assignments_vs_pure_contiguous_fill(spark, docs):
    """md5-bucketed docs in (md5, id) order fill packs of 512 tokens by
    running offset; plus the budget invariant that a pack's docs (beyond
    the first) start strictly inside pack boundaries."""
    per_bucket: dict[int, list] = defaultdict(list)
    for i, (_l, t, _nc) in docs.items():
        b = int(_md5(str(i))[:12], 16) % 8
        per_bucket[b].append((_md5(str(i)), i, len(re.split(r"\s+", t.strip()))))
    want = {}
    for b, rows in per_bucket.items():
        rows.sort()
        off = 0
        for _h, i, n in rows:
            want[i] = (b, n, off, b * 4294967296 + off // 512)
            off += n
    got = {
        r.doc_id: (r.bucket, r.n_tokens, r.start_offset, r.pack_id)
        for r in _run("doc_pack_assignments", spark)
    }
    assert got == want
    # same pack ⇒ same bucket and contiguous offsets
    packs: dict[int, list] = defaultdict(list)
    for i, (b, n, off, pid) in want.items():
        packs[pid].append((off, n, b))
    for pid, members in packs.items():
        members.sort()
        assert len({b for _o, _n, b in members}) == 1
        for (o1, n1, _b1), (o2, _n2, _b2) in zip(members, members[1:]):
            assert o2 == o1 + n1  # contiguous fill


def test_train_eval_split_vs_pure_group_hash(spark, docs):
    """The split hangs off md5(lang) — per GROUP, not per row — so every
    document of a language lands in one split (the leakage-safety
    property, asserted directly)."""
    got = {r.doc_id: (r.lang, r.split) for r in _run("doc_train_eval_split", spark)}
    assert sorted(got) == sorted(docs)
    split_of_lang = {}
    for i, (lang, _t, _nc) in docs.items():
        b = int(_md5(lang)[:12], 16) % 10
        s = "train" if b <= 7 else ("val" if b == 8 else "test")
        assert got[i] == (lang, s), i
        split_of_lang.setdefault(lang, set()).add(got[i][1])
    assert all(len(v) == 1 for v in split_of_lang.values())


def test_temperature_sample_vs_pure_rates(spark, docs):
    """n^0.5 target shares, budget 40% of the corpus, per-lang rate
    min(1, share·budget/n), unit-hash thresholding — plus the
    flattening direction: tail languages sample at a HIGHER rate than
    head languages."""
    counts: dict[str, int] = defaultdict(int)
    for _i, (lang, _t, _nc) in docs.items():
        counts[lang] += 1
    total = sum(counts.values())
    tsum = math.fsum(n ** 0.5 for n in counts.values())
    rates = {}
    for lang, n in counts.items():
        share = n ** 0.5 / tsum
        rates[lang] = _r(min(1.0, share * (0.4 * total) / n), 6)
    sampled: dict[str, int] = defaultdict(int)
    for i, (lang, _t, _nc) in docs.items():
        u = (int(_md5(f"temp-{i}")[:6], 16) + 0.5) / 16777216.0
        if u < rates[lang]:
            sampled[lang] += 1
    got = {r.lang: r for r in _run("doc_lang_temperature_sample", spark)}
    assert sorted(got) == sorted(counts)
    for lang, n in counts.items():
        r = got[lang]
        assert r.n_docs == n
        assert r.raw_share == pytest.approx(_r(n / total, 4), abs=1e-9)
        assert r.temp_share == pytest.approx(_r(n ** 0.5 / tsum, 4), abs=2e-4)
        assert r.rate == pytest.approx(rates[lang], abs=2e-6)
        assert r.n_sampled == sampled[lang]
    ordered = sorted(counts.items(), key=lambda kv: kv[1])
    for (tail, _n1), (head, _n2) in zip(ordered, ordered[1:]):
        if counts[tail] < counts[head]:
            assert got[tail].rate >= got[head].rate


def test_mixture_reweight_vs_pure_tilt(spark, docs):
    """Per-lang proxy loss = mean ln(1+chars) (6dp), baseline = corpus
    mean (6dp), weight = softmax of the excess — plus Σweights = 1 and
    the direction invariant: the worst-loss domain gets the largest
    weight."""
    per: dict[str, list[float]] = defaultdict(list)
    allv = []
    for _i, (lang, _t, nc) in docs.items():
        x = math.log(1 + nc)
        per[lang].append(x)
        allv.append(x)
    loss = {lang: _r(math.fsum(v) / len(v), 6) for lang, v in per.items()}
    base = _r(math.fsum(allv) / len(allv), 6)
    e = {lang: math.exp(ls - base) for lang, ls in loss.items()}
    z = math.fsum(e.values())
    got = {r.lang: r for r in _run("doc_mixture_reweight", spark)}
    assert sorted(got) == sorted(per)
    for lang in per:
        r = got[lang]
        assert r.n_docs == len(per[lang])
        assert r.loss == pytest.approx(loss[lang], abs=2e-6)
        assert r.weight == pytest.approx(_r(e[lang] / z, 6), abs=2e-6)
    assert sum(r.weight for r in got.values()) == pytest.approx(1.0, abs=5e-6)
    worst = max(loss, key=lambda k: (loss[k], k))
    assert got[worst].weight == max(r.weight for r in got.values())


def _quality(text: str) -> float:
    ntok = len(re.split(r"\s+", text.strip()))
    nonspace = len(re.sub(r"\s", "", text))
    punct = len(re.findall(r"[!-/:-@\[-`{-~]", text))
    pr = _r(punct / max(len(text), 1), 10)
    b1 = 1.0 if 10 <= ntok <= 100000 else 0.3
    b2 = 1.0 if 2.0 <= nonspace / max(ntok, 1.0) <= 12.0 else 0.4
    b3 = 1.0 if pr <= 0.2 else 0.5
    return _r((b1 + b2 + b3) / 3.0, 4)


def test_keep_best_dedup_vs_pure_policy(spark, docs):
    """Clusters re-derived from the full MinHash-LSH walk (batch 17's
    pipeline, union-find labels), quality from the three-rule walk;
    keep = the cluster's (quality desc, doc_id asc) argmax — exactly one
    keeper per cluster, asserted."""
    # --- the MinHash pipeline (char-8 shingles, 16 hashes, 4 bands) ---
    P = 2_147_483_647
    sh = {}
    sigs = {}
    for i, (_l, t, _nc) in docs.items():
        s = {t[p : p + 8] for p in range(max(len(t) - 7, 1))}
        sh[i] = s
        hs = [int(_md5(x)[:7], 16) for x in s]
        sig = []
        for k in range(16):
            a = (0x9E3779B1 * (k + 1)) % P
            b = (0x85EBCA6B * (k + 1)) % P
            sig.append(min((a * h + b) % P for h in hs))
        sigs[i] = sig
    buckets: dict = defaultdict(list)
    for i, sig in sigs.items():
        for band in range(4):
            key = _md5("|".join(str(v) for v in sig[band * 4 : band * 4 + 4]))
            buckets[(band, key)].append(i)
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = set()
    for members in buckets.values():
        ms = sorted(members)
        for x, a in enumerate(ms):
            for b in ms[x + 1 :]:
                if (a, b) in edges:
                    continue
                edges.add((a, b))
                inter = len(sh[a] & sh[b])
                if _r(inter / (len(sh[a]) + len(sh[b]) - inter), 4) >= 0.35:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    nodes = {x for a, b in edges for x in (a, b)}
    # only nodes in a true pair get cluster rows (pairs above threshold)
    paired = set()
    for a, b in edges:
        inter = len(sh[a] & sh[b])
        if _r(inter / (len(sh[a]) + len(sh[b]) - inter), 4) >= 0.35:
            paired.add(a)
            paired.add(b)
    comp_min: dict[int, int] = {}
    for n in paired:
        rt = find(n)
        comp_min[rt] = min(comp_min.get(rt, n), n)
    quality = {i: _quality(t) for i, (_l, t, _nc) in docs.items()}
    clusters: dict[int, list[int]] = defaultdict(list)
    for n in paired:
        clusters[comp_min[find(n)]].append(n)
    want = {}
    for cid, members in clusters.items():
        best = min(members, key=lambda m: (-quality[m], m))
        for m in members:
            want[m] = (cid, quality[m], m == best)
    got = {
        r.doc_id: (r.cluster_id, r.quality, r.kept)
        for r in _run("doc_keep_best_dedup", spark)
    }
    assert got == want
    for cid, members in clusters.items():
        assert sum(1 for m in members if got[m][2]) == 1

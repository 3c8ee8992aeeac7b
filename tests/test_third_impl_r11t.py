"""Third-implementation checks, batch 32 — the composed LLM-training-
data pipeline: ``corpus_training_manifest`` chains exact dedup →
capped-trigram near-dedup → decontamination → quality gate → stratified
sampling → sequence packing → vocabulary encoding in ONE plan, and both
the Spark lineage and the CTE oracle restate it relationally. This
reference walks all seven stages imperatively (dicts, sets, explicit
greedy drops), then re-proves the end-to-end FLOW invariants no single
stage test can see. Plus the k-fold label-parity audit.
"""

from __future__ import annotations

import hashlib
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
        f"select doc_id, lang, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return {int(i): (lang, t) for i, lang, t in rows}


def _trigrams(toks):
    return (
        {" ".join(toks[p : p + 3]) for p in range(len(toks) - 2)}
        if len(toks) >= 3
        else set()
    )


def test_training_manifest_vs_pure_seven_stage_walk(spark, docs):
    toks = {i: re.split(r"\s+", t.strip()) for i, (_l, t) in docs.items()}
    bucket10 = {i: int(_md5(str(i))[:12], 16) % 10 for i in docs}

    # 1. exact dedup (min id per canonical fingerprint)
    first_fp: dict[str, int] = {}
    for i in sorted(docs):
        fp = _md5(re.sub(r"\s+", " ", docs[i][1].strip().lower()))
        first_fp.setdefault(fp, i)
    uniq = set(first_fp.values())

    # 2. capped-trigram near-dedup over the uniq survivors
    grams = {i: _trigrams(toks[i]) for i in uniq}
    df: dict[str, int] = defaultdict(int)
    for gs in grams.values():
        for g in gs:
            df[g] += 1
    capped = {i: {g for g in gs if df[g] <= 20} for i, gs in grams.items()}
    inv: dict[str, list[int]] = defaultdict(list)
    for i, gs in capped.items():
        for g in gs:
            inv[g].append(i)
    inter: dict[tuple, int] = defaultdict(int)
    for ids in inv.values():
        ids = sorted(ids)
        for x, a in enumerate(ids):
            for b in ids[x + 1 :]:
                inter[(a, b)] += 1
    dupped = set()
    for (a, b), n in inter.items():
        if _r(n / (len(capped[a]) + len(capped[b]) - n), 4) >= 0.4:
            dupped.add(b)
    near = uniq - dupped

    # 3. decontamination vs the RAW corpus's md5-bucket-1 slice
    eval_grams = set()
    for i in docs:
        if bucket10[i] == 1:
            eval_grams |= _trigrams(toks[i])
    train = {i for i in near if bucket10[i] != 1}
    clean = set()
    for i in train:
        gs = _trigrams(toks[i])
        if not gs:
            clean.add(i)  # no grams → the HAVING never fires
            continue
        if _r(len(gs & eval_grams) / len(gs), 4) < 0.5:
            clean.add(i)

    # 4. quality gate
    qual = set()
    for i in clean:
        lang, t = docs[i]
        ntok, ndist = len(toks[i]), len(set(toks[i]))
        nonws = len(re.sub(r"\s", "", t))
        if (
            lang in ("de", "en", "es", "fr")
            and 20 <= ntok <= 1000
            and ndist >= 0.3 * ntok
            and 3 * ntok <= nonws <= 12 * ntok
        ):
            qual.add(i)

    # 5. stratified sample: per lang, first 20 by (md5(id), id)
    per_lang: dict[str, list] = defaultdict(list)
    for i in qual:
        per_lang[docs[i][0]].append((_md5(str(i)), i))
    sampled = set()
    for _lang, rows in per_lang.items():
        rows.sort()
        sampled |= {i for _h, i in rows[:20]}

    # 6. contiguous-fill packing over the sample
    per_bucket: dict[int, list] = defaultdict(list)
    for i in sampled:
        per_bucket[int(_md5(str(i))[:12], 16) % 8].append((_md5(str(i)), i))
    pack = {}
    for b, rows in per_bucket.items():
        rows.sort()
        off = 0
        for _h, i in rows:
            n = len(toks[i])
            pack[i] = (b, n, off, b * 4294967296 + off // 512)
            off += n

    # 7. vocabulary (top 150 of the SAMPLED corpus) + encoding
    counts: dict[str, int] = defaultdict(int)
    for i in sampled:
        for t in toks[i]:
            counts[t] += 1
    vocab = {
        t: k + 1
        for k, (t, _c) in enumerate(
            sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:150]
        )
    }
    ids_of = {
        i: " ".join(str(vocab.get(t, 0)) for t in toks[i]) for i in sampled
    }

    want = sorted(
        (i, docs[i][0], *pack[i], ids_of[i]) for i in sampled
    )
    got = sorted(
        (r.doc_id, r.lang, r.bucket, r.n_tokens, r.start_offset, r.pack_id, r.ids)
        for r in _run("corpus_training_manifest", spark)
    )
    assert got == want

    # end-to-end FLOW invariants only the composition can show:
    # monotone shrinkage through the funnel...
    assert len(docs) >= len(uniq) >= len(near) >= len(train) >= len(clean) >= len(qual) >= len(sampled)
    # ...no eval-slice doc survives to the manifest...
    assert all(bucket10[i] != 1 for i in sampled)
    # ...every manifest doc passes the quality gate's language allowlist
    assert all(docs[i][0] in ("de", "en", "es", "fr") for i in sampled)
    # ...and per-language quotas hold
    lang_n: dict[str, int] = defaultdict(int)
    for i in sampled:
        lang_n[docs[i][0]] += 1
    assert all(n <= 20 for n in lang_n.values())


def test_fold_label_parity_vs_pure_shares(spark, docs):
    """md5 % 5 folds; per-(fold, lang) share vs the corpus share and the
    absolute deviation — plus the parity reading itself: every fold's
    language distribution is within a loose band of the corpus's."""
    fold = {i: int(_md5(str(i))[:12], 16) % 5 for i in docs}
    fl: dict[tuple, int] = defaultdict(int)
    for i, (lang, _t) in docs.items():
        fl[(fold[i], lang)] += 1
    total = len(docs)
    lang_n: dict[str, int] = defaultdict(int)
    fold_n: dict[int, int] = defaultdict(int)
    for (f, lang), n in fl.items():
        lang_n[lang] += n
        fold_n[f] += n
    got = {
        (r.fold, r.lang): (r.n, r.fold_share, r.corpus_share, r.abs_dev)
        for r in _run("doc_fold_label_parity", spark)
    }
    assert sorted(got) == sorted(fl)
    for (f, lang), n in fl.items():
        fs = n / fold_n[f]
        cs = lang_n[lang] / total
        r = got[(f, lang)]
        assert r[0] == n
        assert r[1] == pytest.approx(_r(fs, 6), abs=2e-6)
        assert r[2] == pytest.approx(_r(cs, 6), abs=2e-6)
        assert r[3] == pytest.approx(_r(abs(fs - cs), 6), abs=2e-6)
        assert r[3] < 0.15  # the parity the audit certifies

"""Edge semantics of the corpus-assembly operators
(operators/corpus_prep.py): chunk coverage/overlap invariants,
decontamination boundaries, A-Res weighting, mixture-rate math.

The battery oracle sweep (test_battery.py) hash-checks these against
DuckDB at corpus scale; these tests pin the per-operator contracts on
hand-built frames where the expected answer is computed independently.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators import corpus_prep as P


def _docs(spark, texts: dict[int, str], lang: str = "en"):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lang) for i, t in sorted(texts.items())]
    )


# --------------------------------------------------------------------------
# unit_hash
# --------------------------------------------------------------------------


def test_unit_hash_range_and_determinism(spark):
    df = spark.range(200).select(
        P.unit_hash(F.col("id"), "s1").alias("u1"),
        P.unit_hash(F.col("id"), "s1").alias("u1b"),
        P.unit_hash(F.col("id"), "s2").alias("u2"),
    )
    rows = df.collect()
    assert all(0.0 < r.u1 < 1.0 for r in rows)
    assert all(r.u1 == r.u1b for r in rows)  # same salt → same draw
    assert any(r.u1 != r.u2 for r in rows)  # different salt → different draw


def test_unit_hash_matches_python_md5(spark):
    row = spark.range(7, 8).select(P.unit_hash(F.col("id"), "x").alias("u")).first()
    want = (int(hashlib.md5(b"x-7").hexdigest()[:6], 16) + 0.5) / 16**6
    assert row.u == pytest.approx(want, abs=0)


# --------------------------------------------------------------------------
# chunking
# --------------------------------------------------------------------------


def test_chunks_cover_every_token_once_per_window(spark):
    # 50 tokens, window 32, stride 24 → starts 1, 25, 49
    toks = [f"t{i}" for i in range(50)]
    docs = _docs(spark, {1: " ".join(toks)})
    out = (
        P.chunk_documents(docs, window=32, stride=24)
        .orderBy("chunk_idx")
        .collect()
    )
    assert [r.start for r in out] == [1, 25, 49]
    assert [r.chunk_idx for r in out] == [0, 1, 2]
    assert [r.n_chunk_tokens for r in out] == [32, 26, 2]
    # trailing chunk hash is the md5 of exactly the last two tokens
    want = hashlib.md5("t48 t49".encode()).hexdigest()
    assert out[-1].chunk_hash == want


def test_short_doc_yields_single_partial_chunk(spark):
    docs = _docs(spark, {1: "a b c"})
    out = P.chunk_documents(docs, window=32, stride=24).collect()
    assert len(out) == 1
    assert out[0].n_chunk_tokens == 3
    assert out[0].chunk_hash == hashlib.md5(b"a b c").hexdigest()


def test_chunk_rejects_bad_params(spark):
    docs = _docs(spark, {1: "a b"})
    with pytest.raises(ValueError):
        P.chunk_documents(docs, window=0, stride=4)
    with pytest.raises(ValueError):
        P.chunk_documents(docs, window=4, stride=0)


# --------------------------------------------------------------------------
# decontamination
# --------------------------------------------------------------------------


def test_contamination_fractions_exact(spark):
    train = _docs(
        spark,
        {
            1: "a b c d e",       # grams: abc bcd cde → 2/3 contaminated
            2: "x y z w",         # grams: xyz yzw → 0 contaminated
            3: "a b",             # < 3 tokens → absent from report
        },
    )
    eval_docs = _docs(spark, {10: "a b c d q"})  # eval grams: abc bcd cdq
    out = {
        r.doc_id: r
        for r in P.contamination_report(train, eval_docs, n=3).collect()
    }
    assert set(out) == {1, 2}
    assert (out[1].n_grams, out[1].n_overlap) == (3, 2)
    assert out[1].contamination == pytest.approx(round(2 / 3, 4))
    assert (out[2].n_grams, out[2].n_overlap) == (2, 0)


def test_contamination_counts_distinct_grams_once(spark):
    # the repeated gram "a b c" counts once in both n_grams and n_overlap
    train = _docs(spark, {1: "a b c a b c"})  # distinct grams: abc bca cab
    eval_docs = _docs(spark, {10: "a b c"})
    r = P.contamination_report(train, eval_docs, n=3).first()
    assert (r.n_grams, r.n_overlap) == (3, 1)


# --------------------------------------------------------------------------
# weighted sampling
# --------------------------------------------------------------------------


def test_weighted_sample_matches_brute_force(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("w")
    )
    got = [
        r.doc_id
        for r in P.weighted_sample(docs, 10, F.col("w"))
        .orderBy("sample_key", "doc_id")
        .collect()
    ]

    def key(i: int) -> float:
        u = (int(hashlib.md5(f"wsample-{i}".encode()).hexdigest()[:6], 16) + 0.5) / 16**6
        return round(-math.log(u) / (i % 7 + 1), 8)

    want = [i for i in sorted(range(100), key=lambda i: (key(i), i))[:10]]
    assert got == want


def test_weighted_sample_prefers_heavy_rows(spark):
    # weights 1 vs 1000 on the same draw universe: heavy rows should
    # dominate the selected set
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, 1000).otherwise(1).alias("w"),
    )
    got = P.weighted_sample(docs, 20, F.col("w")).collect()
    heavy = sum(1 for r in got if r.doc_id < 100)
    assert heavy >= 18  # P(light row beats heavy) ≈ w_l/(w_l+w_h) ≈ 1e-3


# --------------------------------------------------------------------------
# OOV / vocabulary
# --------------------------------------------------------------------------


def test_top_vocabulary_total_order_and_oov(spark):
    docs = _docs(spark, {1: "a a a b b c", 2: "b c d"})
    vocab = [r.token for r in P.top_vocabulary(docs, 2).collect()]
    # counts: a=3 b=3 c=2 d=1 → top-2 by (count desc, token asc) = [a, b]
    assert vocab == ["a", "b"]
    out = {
        r.doc_id: r
        for r in P.oov_report(docs, P.top_vocabulary(docs, 2)).collect()
    }
    assert (out[1].n_tokens, out[1].n_oov) == (6, 1)  # only "c" is OOV
    assert (out[2].n_tokens, out[2].n_oov) == (3, 2)  # "c", "d"
    assert out[2].oov_rate == pytest.approx(round(2 / 3, 4))


# --------------------------------------------------------------------------
# mixture sampling
# --------------------------------------------------------------------------


def test_mixture_rates_and_unknown_domain(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i < 80 else ("fr" if i < 90 else "xx"))
         for i in range(100)]
    )
    out = {
        r.lang: r
        for r in P.mixture_sample_report(
            docs, {"en": 0.5, "fr": 0.5}, budget=40
        ).collect()
    }
    assert out["en"].rate == pytest.approx(0.25)  # 0.5·40/80
    assert out["fr"].rate == pytest.approx(1.0)   # 0.5·40/10 capped
    assert out["xx"].rate == 0.0 and out["xx"].n_sampled == 0
    assert out["fr"].n_sampled == 10              # rate 1 takes everything
    assert 0 <= out["en"].n_sampled <= 80

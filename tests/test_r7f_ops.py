"""Invariant tests for the round-7f additions: fertility ≥ 1 with the
target-rich language compressing best, span-plan ratios near the mask
rate with span lengths ≥ 1, novelty bounded with shared-vocabulary
corpora scoring low, triplet margins consistent with the positive being
the argmax, and the entropy profile a proper distribution."""

from __future__ import annotations

import math

import pytest

from conftest import SF_DIR
from flight_radar_pipeline_spark.plans.battery_r7f import (
    _MASK_RATE,
    _TRIP_ANCHORS,
    _TRIP_NEGS,
    doc_bpe_fertility,
    doc_ngram_novelty,
    doc_span_corruption_plan,
    embedding_contrastive_triplets,
    user_type_entropy_profile,
)
from flight_radar_pipeline_spark.sources.readers import load_table


def test_fertility_bounds(spark):
    rows = doc_bpe_fertility(spark, SF_DIR).collect()
    assert len(rows) == 5
    docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == docs
    for r in rows:
        # merges only fuse characters: symbols per word ≥ 1, and with
        # 3 merges fertility is at most the raw chars-per-word
        assert r.fertility >= 1.0
        assert r.n_subwords >= r.n_words


def test_span_plan_rate_and_lengths(spark):
    rows = doc_span_corruption_plan(spark, SF_DIR).collect()
    for r in rows:
        # realized mask rate concentrates near the target
        assert abs(r.mask_ratio - _MASK_RATE) < 0.03
        assert r.avg_span_len >= 1.0
        assert r.n_spans <= r.n_masked


def test_novelty_bounds_and_shared_vocab(spark):
    rows = doc_ngram_novelty(spark, SF_DIR).collect()
    for r in rows:
        assert 0.0 <= r.novelty_rate <= 1.0
        assert r.n_novel <= r.n_grams


def test_triplets_margins(spark):
    rows = embedding_contrastive_triplets(spark, SF_DIR).collect()
    assert len(rows) == _TRIP_ANCHORS * _TRIP_NEGS
    by_anchor = {}
    for r in rows:
        by_anchor.setdefault(r.anchor_id, []).append(r)
        # positive is the global argmax → every margin ≥ 0
        assert r.margin >= -1e-9
        assert r.margin == pytest.approx(
            r.pos_cosine - r.neg_cosine, abs=2e-6
        )
        assert r.negative_id != r.positive_id
        assert r.negative_id != r.anchor_id
    for aid, rs in by_anchor.items():
        assert sorted(r.neg_rank for r in rs) == list(
            range(1, _TRIP_NEGS + 1)
        )
        assert len({r.negative_id for r in rs}) == _TRIP_NEGS


def test_entropy_profile_distribution(spark):
    rows = user_type_entropy_profile(spark, SF_DIR).collect()
    assert sum(r.share for r in rows) == pytest.approx(1.0, abs=2e-3)
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.avg_entropy <= math.log(5) + 1e-9
        # bin's mean must sit inside the bin's range
        w = math.log(5) / 10
        lo = r.bin * w
        hi = math.log(5) if r.bin == 9 else (r.bin + 1) * w
        assert lo - 1e-6 <= r.avg_entropy <= hi + 1e-6


def test_encode_caller_supplied_vocab_path(spark):
    """`encode_token_counts(vocab=...)` must (a) return the same counts
    as the self-derived path and (b) persist nothing itself, so library
    callers own the cache lifecycle deterministically (round-12 ADVICE)."""
    from flight_radar_pipeline_spark.operators.bpe import (
        encode_token_counts,
        word_vocabulary,
    )

    docs = load_table(spark, SF_DIR, "documents")
    base = {
        (r.doc_id, r.n_words, r.n_subwords)
        for r in encode_token_counts(docs, n_merges=3).collect()
    }
    spark.catalog.clearCache()
    vocab = word_vocabulary(docs).persist()
    vocab.count()  # materialize the caller's cache BEFORE the snapshot
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()  # caller's persist (+ any
    # unrelated module-fixture caches a shared session carries)
    try:
        got = {
            (r.doc_id, r.n_words, r.n_subwords)
            for r in encode_token_counts(docs, n_merges=3, vocab=vocab).collect()
        }
        assert got == base
        # the function added no persist of its own: the live set did not
        # grow past the caller's
        after = jsc.getPersistentRDDs().size()
        assert after <= before, f"function leaked a persist: {before}->{after}"
    finally:
        vocab.unpersist()

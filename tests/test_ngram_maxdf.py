"""The ``maxdf`` stop-gram cap on exact n-gram Jaccard.

The gram-keyed inverted-index self-join fans out quadratically in per-gram
document frequency — one gram shared by 100k documents would alone produce
5·10⁹ join rows at scale. ``maxdf`` drops such hot grams before the join;
these tests pin (a) that the fan-out is actually eliminated, observably,
and (b) that rare-gram similarity is untouched.
"""

from __future__ import annotations

from flight_radar_pipeline_spark.operators.dedup import ngram_jaccard_pairs

N_HOT_DOCS = 60


def _corpus(spark):
    """60 docs whose ONLY cross-doc gram is one hot trigram, plus one
    genuine near-dup pair sharing only rare grams."""
    rows = [
        (i, f"HOT1 HOT2 HOT3 u{i}a u{i}b u{i}c") for i in range(N_HOT_DOCS)
    ] + [
        (1000, "x1 x2 x3 x4"),
        (1001, "x1 x2 x3 x4"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_capped_join_drops_hot_gram_fanout(spark):
    docs = _corpus(spark)
    # threshold 0 exposes every candidate pair the join materialized
    capped = ngram_jaccard_pairs(docs, jaccard_threshold=0.0, maxdf=10).collect()
    # hot-gram-only doc pairs are gone; the rare-gram near-dup survives
    assert {(r.id_a, r.id_b) for r in capped} == {(1000, 1001)}
    assert capped[0].jaccard == 1.0


def test_uncapped_join_materializes_quadratic_candidates(spark):
    docs = _corpus(spark)
    uncapped = ngram_jaccard_pairs(docs, jaccard_threshold=0.0, maxdf=None).collect()
    # the single hot gram alone produces C(60,2) candidate pairs
    expected = N_HOT_DOCS * (N_HOT_DOCS - 1) // 2 + 1
    assert len(uncapped) == expected


def test_cap_is_noop_when_no_gram_exceeds_it(spark):
    docs = _corpus(spark)
    a = ngram_jaccard_pairs(docs, jaccard_threshold=0.3, maxdf=None).collect()
    b = ngram_jaccard_pairs(docs, jaccard_threshold=0.3, maxdf=N_HOT_DOCS).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

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


def test_prefix_filter_output_identical(spark):
    """Prefix filtering is pruning-only: every pair it drops is provably
    below threshold, so the (id_a, id_b, jaccard) output must be
    byte-identical to the exhaustive inverted-index join — on the real
    documents table and on the synthetic hot-gram corpus."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    for frame, t, cap in ((docs, 0.4, 20), (_corpus(spark), 0.3, None)):
        pruned = ngram_jaccard_pairs(
            frame, jaccard_threshold=t, maxdf=cap, prefix_filter=True
        ).collect()
        full = ngram_jaccard_pairs(
            frame, jaccard_threshold=t, maxdf=cap, prefix_filter=False
        ).collect()
        assert sorted(map(tuple, pruned)) == sorted(map(tuple, full))


def test_prefix_filter_prunes_candidates(spark):
    """The point of the filter: docs that share only POST-prefix grams
    never become candidates. Two docs sharing 1 of their 6 grams
    (J = 1/11 < t = 0.5) share no prefix gram at t = 0.5 when the shared
    gram is their most frequent one (sorts last in df order), so the
    candidate join must not even see the pair; with prefix_filter=False
    the pair is materialized (and then filtered by threshold). Observable
    at threshold 0: the unfiltered form returns the pair, the prefix form
    does not."""
    rows = [
        (0, "a1 a2 a3 a4 a5 SHARED1 SHARED2 SHARED3"),
        (1, "b1 b2 b3 b4 b5 SHARED1 SHARED2 SHARED3"),
        (2, "c1 c2 c3 c4 c5 SHARED1 SHARED2 SHARED3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    # 6 distinct trigrams/doc; only "SHARED1 SHARED2 SHARED3" (df=3, the
    # global-order tail) is shared. t=0.5 → prefix = 6-3+1 = 4 rarest
    # grams — all doc-unique — so zero candidates survive pruning.
    pruned = ngram_jaccard_pairs(
        docs, jaccard_threshold=0.0, maxdf=None, prefix_filter=True
    ).collect()
    full = ngram_jaccard_pairs(
        docs, jaccard_threshold=0.0, maxdf=None, prefix_filter=False
    ).collect()
    assert len(full) == 3  # every pair shares the hot gram
    assert len(pruned) == 3  # t=0 ⇒ prefix is the whole doc, nothing pruned
    pruned_t = ngram_jaccard_pairs(
        docs, jaccard_threshold=0.5, maxdf=None, prefix_filter=True
    )
    # at t=0.5 the prefixes exclude the shared gram entirely: the plan's
    # candidate join sees no pair, not merely a below-threshold pair
    assert pruned_t.count() == 0

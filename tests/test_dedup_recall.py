"""Recall floors for the sketch dedup families against the exact
word-3-gram Jaccard baseline (see tools/dedup_eval.py and BASELINE.md):
a sketch config change that silently loses near-dup pairs fails here."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from dedup_eval import evaluate, pair_sets  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_sketch_recall_floors(spark):
    report = evaluate(pair_sets(spark, SF_DIR))
    assert report["n_truth_pairs"] > 0
    mh = report["minhash_lsh"]
    sh = report["simhash_h3"]
    assert mh["recall_vs_truth"] >= 0.85
    assert sh["recall_vs_truth"] >= 0.5
    # neither family may emit a pair the exact pass would reject
    assert mh["agreement"] >= 0.95
    assert sh["agreement"] >= 0.95

"""Sequence-packing invariants for both packers.

The relational packer (`pack_documents`) is oracle-checked in the battery;
the first-fit packer's recurrence has no SQL statement, so its contract is
pinned here: budget respected, order respected, deterministic under
shuffle width, every document packed exactly once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.packing import (
    pack_documents,
    pack_documents_firstfit,
)

SF_DIR = "/root/testdata/sf0.001"
BUDGET = 256


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def test_firstfit_budget_and_coverage(spark):
    docs = _docs(spark)
    out = pack_documents_firstfit(docs, token_budget=BUDGET, buckets=8)
    rows = out.collect()
    assert len(rows) == docs.count()  # every doc packed exactly once
    assert len({r["doc_id"] for r in rows}) == len(rows)
    by_pack: dict[int, int] = {}
    for r in rows:
        by_pack[r["pack_id"]] = by_pack.get(r["pack_id"], 0) + r["n_tokens"]
    for pack, tot in by_pack.items():
        members = [r for r in rows if r["pack_id"] == pack]
        # a pack over budget must be a single oversized document
        assert tot <= BUDGET or len(members) == 1, (pack, tot, len(members))


def test_firstfit_deterministic_under_shuffle_width(spark):
    docs = _docs(spark)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = sorted(
            map(tuple, pack_documents_firstfit(docs, BUDGET, buckets=8).collect())
        )
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        many = sorted(
            map(tuple, pack_documents_firstfit(docs, BUDGET, buckets=8).collect())
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert one == many


def test_firstfit_never_packs_less_dense_than_contiguous(spark):
    """First-fit opens a new pack only on overflow, so within any bucket
    it uses at least as many packs as the contiguous-fill packer's
    straddle-free lower bound would — and the ORDER of documents is the
    same: a doc's first-fit pack ordinal is >= its contiguous pack
    ordinal (first-fit wastes the tail it refuses to straddle)."""
    docs = _docs(spark)
    ff = {
        r["doc_id"]: r["pack_id"] % (2**32)
        for r in pack_documents_firstfit(docs, BUDGET, buckets=8).collect()
    }
    cont = {
        r["doc_id"]: r["pack_id"] % (2**32)
        for r in pack_documents(docs, BUDGET, buckets=8).collect()
    }
    assert set(ff) == set(cont)
    assert all(ff[d] >= cont[d] for d in ff)

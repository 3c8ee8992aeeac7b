"""Sequence packing: assign documents to fixed-token-budget training
sequences ("packs").

Tokenized corpora are trained in fixed-length sequences; packing decides
which documents concatenate into which sequence. The relational form here
is contiguous-fill packing: documents take a deterministic order, the
running token count is a window cumulative sum, and a document's pack is
``floor(start_offset / budget)`` — documents may straddle a pack boundary
(split/truncated at materialization time), which is the streaming packer
most large-scale pipelines actually run (fill loss zero, no bin-packing
search). A no-straddle first-fit variant needs a sequential scan per
group — if required, run this same per-bucket layout through
``applyInPandas`` — but the relational form is the scale default.

Scale: packing is embarrassingly parallel ACROSS hash buckets — the
window cumulative sum runs per bucket, so no global single-partition
window ever exists; each bucket's packs are independent (the only cost is
one potentially short final pack per bucket). Order inside a bucket is
(md5(id), id) — engine-portable, partition-invariant, and stable under
reprocessing, so pack assignments are reproducible end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from flight_radar_pipeline_spark.functions.text import hash_bucket, token_count


def pack_documents(
    df: DataFrame,
    token_budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 32,
    token_count_col: str | None = None,
) -> DataFrame:
    """→ (id, bucket, n_tokens, start_offset, pack_id): contiguous-fill
    pack assignment per hash bucket.

    ``pack_id`` is globally unique: ``bucket * 2^32 + local_pack`` (local
    pack ordinals are far below 2^32 for any real bucket). Whitespace
    token counts of ``text_col`` stand in for trained-tokenizer counts;
    pass ``token_count_col`` when a real count column exists upstream
    (e.g. chunk rows that no longer carry text).
    """
    b = hash_bucket(id_col, buckets)
    n_tok = (
        F.col(token_count_col)
        if token_count_col is not None
        else token_count(text_col)
    )
    base = df.select(
        F.col(id_col),
        b.alias("bucket"),
        n_tok.cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("bucket").orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_offset")
    return base.select(
        id_col,
        "bucket",
        "n_tokens",
        start,
        (
            F.col("bucket") * F.lit(2**32).cast("bigint")
            + F.floor((cum - F.col("n_tokens")) / F.lit(token_budget))
        ).alias("pack_id"),
    )


_FIRSTFIT_OUT = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("bucket", LongType(), True),
        StructField("n_tokens", LongType(), True),
        StructField("pack_id", LongType(), True),
    ]
)


def pack_documents_firstfit(
    df: DataFrame,
    token_budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 32,
) -> DataFrame:
    """No-straddle greedy packing → (doc_id, bucket, n_tokens, pack_id):
    within each hash bucket, documents in (md5(id), id) order fill the
    current pack until the next document would overflow ``token_budget``,
    which opens a new pack; a document longer than the budget gets a pack
    of its own. No document ever straddles a pack boundary — the variant
    chosen when truncation at sequence edges is unacceptable.

    The open-pack recurrence ("reset the running sum when it would
    overflow") is inherently sequential per bucket — not statable as a
    window function — so this is the sanctioned Arrow-batched Python
    path: ``applyInPandas`` per bucket, one pass over the bucket's rows.
    Same deterministic layout and bucket-parallelism as
    ``pack_documents``; ``pack_id`` is ``bucket * 2^32 + local_pack``.
    The driver battery checks this rows-only (no SQL oracle for the
    recurrence); ``tests/test_packing.py`` pins the invariants: budget
    never exceeded by multi-doc packs, order respected, partitioning- and
    rerun-deterministic.
    """
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        hash_bucket(id_col, buckets).alias("bucket"),
        token_count(text_col).cast("long").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("__ord"),
    )

    def pack_bucket(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["__ord", "doc_id"], ignore_index=True)
        bucket = int(pdf["bucket"].iloc[0])
        packs = []
        pack, used = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if used > 0 and used + n > token_budget:
                pack += 1
                used = 0
            packs.append(bucket * 2**32 + pack)
            used += n
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "bucket": pdf["bucket"],
                "n_tokens": pdf["n_tokens"],
                "pack_id": packs,
            }
        )

    return base.groupBy("bucket").applyInPandas(pack_bucket, _FIRSTFIT_OUT)

"""Contiguous global row ids without a global window.

Training pipelines need dense 0..N-1 row ids (sample indexing, shard
addressing, id remapping after dedup). The naive Spark spelling —
``row_number()`` over an un-partitioned window — moves the ENTIRE table
through one task: the canonical scale-killer. ``monotonically_increasing_id``
is distributed but neither dense nor stable across partitioning.

This operator gets dense, deterministic ids with bounded parallelism:

1. approximate range boundaries of the order key (one aggregate; the
   boundaries only steer partitioning — final ids never depend on them);
2. map-side range-bucket assignment against the broadcast boundaries;
3. per-bucket ``row_number`` (windows run in parallel across buckets);
4. bucket offsets = cumulative counts (a ≤ ``buckets``-row frame — the
   only single-partition step touches one row per bucket, not the data);
5. id = offset + in-bucket rank − 1.

Because buckets are RANGES of the order key, in-bucket ranks + offsets
compose to exactly the global rank. Ids equal ``row_number() over
(order by key) − 1`` for ANY partitioning, shuffle width, or boundary
quality — skewed boundaries only unbalance bucket sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def contiguous_ids(
    df: DataFrame,
    order_col: str,
    buckets: int = 64,
    id_name: str = "row_id",
) -> DataFrame:
    """Append dense 0-based ``id_name`` ordered by ``order_col`` (must be
    non-null and unique — ties would make the global order, and thus the
    ids, ambiguous). See module docstring for the plan shape."""
    probs = [i / buckets for i in range(1, buckets)]
    bounds = df.agg(
        F.percentile_approx(order_col, probs, 10_000).alias("__bounds")
    )
    cols = df.columns
    bucketed = df.crossJoin(F.broadcast(bounds)).select(
        *cols,
        F.size(
            F.filter(F.col("__bounds"), lambda b: F.col(order_col) > b)
        ).alias("__bkt"),
    )
    counts = bucketed.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = (
        Window.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__bkt",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    w_rank = Window.partitionBy("__bkt").orderBy(order_col)
    return (
        bucketed.join(F.broadcast(offsets), "__bkt")
        .select(
            *cols,
            (F.col("__off") + F.row_number().over(w_rank) - 1)
            .cast("bigint")
            .alias(id_name),
        )
    )

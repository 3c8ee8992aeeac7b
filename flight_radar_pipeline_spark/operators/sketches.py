"""Count-min sketch: fixed-size frequency summaries of unbounded keys.

The frequency-sketch companion to HLL cardinality
(``approx_distinct_users``): a depth×width counter grid where each of
``depth`` md5-derived hash rows buckets every key occurrence; a key's
estimate is the MIN of its ``depth`` bucket counters. Estimates never
under-count, over-count by ≤ 2·N/width with probability 1−2⁻ᵈᵉᵖᵗʰ
(Cormode & Muthukrishnan), and the grid is linear — sketches of two
partitions/days/sources ADD, which is what makes the structure right for
100 TB: per-executor partial grids merge map-side, the final sketch is
depth·width counters regardless of key cardinality, and it broadcasts
for point queries.

Determinism: the hash family is md5-prefix arithmetic (engine-portable,
partition-invariant), so the sketch — and every estimate — is exactly
reproducible in SQL; the oracle states the identical grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key: F.Column, row: F.Column, width: int) -> F.Column:
    h = F.substring(
        F.md5(F.concat(row.cast("string"), F.lit("-"), key.cast("string"))), 1, 12
    )
    return F.conv(h, 16, 10).cast("bigint") % width


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """One occurrence-weighted counter grid over ``key_col`` →
    (row, bucket, c). One groupBy on (row, bucket) — ≤ depth·width output
    rows with full map-side partial aggregation; the row-replication
    explode is row-local."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    b = df.select(F.col(key_col).alias("__k"), rows).select(
        "row", _bucket(F.col("__k"), F.col("row"), width).alias("bucket")
    )
    return b.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-query the sketch for each key in ``keys`` → (key_col, est).
    The sketch broadcasts (it is at most depth·width rows); per key the
    estimate is min over its depth buckets."""
    kb = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(F.col(key_col), F.lit(i), width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__rb"),
    ).select(key_col, "__rb.row", "__rb.bucket")
    return (
        kb.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("c").alias("est"))
    )

"""Skew mitigation: salted equi-join (and the reasoning for when NOT to).

Spark's own answers to skew come first: map-side partial aggregation
already collapses hot GROUP BY keys per task, and AQE
(``spark.sql.adaptive.skewJoin``) splits oversized sort-merge partitions
at runtime. Reach for explicit salting when neither applies — a hot join
key against a side too big to broadcast, on an engine path where AQE
can't see the skew (e.g. a key that is hot only after a filter AQE
statistics missed).

``salted_join`` keeps the logical result identical to a plain equi-join
(same rows, same columns), so it is oracle-checkable against ordinary SQL
— the salt is pure physical strategy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[tuple[str, str]],
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Equi-join with hot-key spreading: each left row gets a
    deterministic salt (hash of its full row — skewed-key rows scatter
    uniformly), the right side is replicated ``buckets``×, and the join
    runs on (keys, salt) so no single reducer owns a hot key.

    ``on`` is a list of (left_col, right_col) pairs. Only ``inner`` and
    ``left`` joins are supported — replicating the right side breaks
    right/full-outer multiplicity. Cost model: right side pays a
    ``buckets``× blowup; worth it exactly when the hot key's partition
    would otherwise exceed an executor, and the right side is too big to
    broadcast (else just ``F.broadcast``).

    Salt is ``xxhash64`` of the left row — deterministic across runs and
    partitionings (no ``rand()``), so results are reproducible and
    oracle-checkable.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column names collide across sides: {sorted(overlap)}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(buckets))
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>"))
    )
    cond = F.col("l.__salt") == F.col("r.__salt")
    for lc, rc in on:
        cond = cond & (F.col(f"l.{lc}") == F.col(f"r.{rc}"))
    out = l.alias("l").join(r.alias("r"), cond, how)
    return out.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in right.columns],
    )

"""Change-data-capture between table snapshots.

The reference pipeline re-dumps whole snapshots every run
(``/root/reference/src/main.py:105-152``, hourly overwrite); this operator
turns two such versions into an increment — the added/removed/changed row
set a lakehouse emits between versions and an ingest job applies instead
of reprocessing the world.

Scale posture: each side collapses to (key, fingerprint) BEFORE the join,
so the one key-keyed full-outer exchange carries two narrow columns no
matter how wide the table is; unchanged rows (the overwhelming majority
between real versions) drop immediately after the join and are never
projected wide again. Fingerprint inputs must be rendered int/string-safe
by the caller (no raw doubles — float formatting is engine-specific; pin
prices to integer cents first).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_fingerprint(cols: Sequence[Column | str]) -> Column:
    """md5 over '|'-joined column renderings — the row-identity hash both
    sides of a diff share. Callers pre-cast floats to exact integers."""
    rendered = [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in cols
    ]
    return F.md5(F.concat_ws("|", *rendered))


def snapshot_changes(
    old: DataFrame,
    new: DataFrame,
    key: str,
    fingerprint: Column,
) -> DataFrame:
    """Diff two snapshot versions → (key, change_type ∈ added/removed/
    changed); unchanged rows are dropped. ``fingerprint`` is evaluated
    against each side's columns (build it with :func:`row_fingerprint`).
    """
    a = old.select(F.col(key), fingerprint.alias("__fp_a"))
    b = new.select(F.col(key), fingerprint.alias("__fp_b"))
    return (
        a.join(b, key, "full_outer")
        .filter(
            F.col("__fp_a").isNull()
            | F.col("__fp_b").isNull()
            | (F.col("__fp_a") != F.col("__fp_b"))
        )
        .select(
            key,
            F.when(F.col("__fp_a").isNull(), F.lit("added"))
            .when(F.col("__fp_b").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed"))
            .alias("change_type"),
        )
    )

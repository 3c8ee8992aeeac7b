"""Bronze → silver: schema enforcement, dedup, time normalization.

Reference behavior (``/root/reference/src/transform.py:156-194``):
explicit 10-column schema, ``dropDuplicates(["id"])``, then
``from_unixtime(time, 'yyyy-MM-dd HH:mm:ss')`` under session TZ
Europe/Paris rewriting ``time`` int→string.

Two deliberate divergences, both documented in SURVEY.md §2.3/§7:

- **Deterministic dedup.** ``dropDuplicates`` keeps an arbitrary row per
  key (whichever the hash-agg sees first) — output varies with partition
  layout. We rank rows per key by an explicit tiebreak and keep rank 1, so
  results are identical at 1 partition or 10,000.
- **Timestamps stay timestamps.** The formatted string is produced at the
  same point for parity, but from a typed column, so downstream range
  filters/partition pruning still work on a real timestamp at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str] | None = None,
) -> DataFrame:
    """Keep exactly one row per key, deterministically.

    ``order_by`` decides the winner (first row wins); defaults to the
    remaining columns ascending so any partitioning yields the same output.
    Implemented as a window ``row_number`` — one shuffle on the key, same
    cost class as ``dropDuplicates`` but reproducible.
    """
    if order_by is None:
        order_by = [c for c in df.columns if c not in keys]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def build_silver(
    flights_raw: DataFrame,
    time_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Silver flights: dedup on ``id``, unix-seconds → formatted time string.

    Input must match ``schemas.FLIGHTS_RAW`` (``time`` as int unix seconds).
    """
    deduped = dedup_by_key(flights_raw, ["id"], order_by=[F.col("time").desc_nulls_last()])
    return deduped.withColumn("time", F.from_unixtime(F.col("time"), time_format))


def merge_snapshot(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """SCD1 upsert over plain files (no table format needed): one row per
    key, update rows winning over current rows, deterministic. Union the
    tagged sides and keep rank 1 per key preferring the update side —
    one shuffle on the key, same cost class as the dedup it builds on.
    At scale this is the rewrite-on-merge pattern; with a transactional
    format (Delta/Iceberg) the same logical op becomes MERGE INTO."""
    cur = current.withColumn("__src", F.lit(0))
    upd = updates.withColumn("__src", F.lit(1))
    merged = cur.unionByName(upd)
    return dedup_by_key(merged, list(keys), order_by=[F.desc("__src")]).drop("__src")


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    effective: Column,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Type-2 slowly-changing-dimension apply over plain files: every
    updated key's CURRENT row (``valid_to`` null) is closed at
    ``effective``, and the update lands as the new current row
    (``valid_from = effective``, ``valid_to`` null); closed history and
    untouched current rows pass through unchanged. ``updates`` must carry
    the history schema minus the two validity columns.

    The full-history complement to ``merge_snapshot`` (SCD1): instead of
    overwriting, each key accumulates non-overlapping validity intervals,
    so any past state is reconstructable with
    ``valid_from <= ts AND (valid_to IS NULL OR ts < valid_to)``.

    Scale: one semi- and one anti-join of the current slice against the
    update keys (both key-shuffles; broadcast when the update batch is
    small — the common case for dimension feeds), plus a union — no
    window, no full-table rewrite of closed history. With a
    transactional table format the same logical op is MERGE INTO WHEN
    MATCHED UPDATE / WHEN NOT MATCHED INSERT.
    """
    key_list = list(keys)
    upd_keys = updates.select(*key_list).distinct()
    is_current = F.col(valid_to_col).isNull()
    current_slice = history.filter(is_current)
    closed = current_slice.join(upd_keys, key_list, "semi").withColumn(
        valid_to_col, effective
    )
    untouched_current = current_slice.join(upd_keys, key_list, "anti")
    past = history.filter(~is_current)
    fresh = updates.withColumn(valid_from_col, effective).withColumn(
        valid_to_col, F.lit(None).cast("timestamp")
    )
    return (
        past.unionByName(untouched_current)
        .unionByName(closed)
        .unionByName(fresh.select(*history.columns))
    )


def scd3_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    tracked: str,
    prev_col: str | None = None,
) -> DataFrame:
    """Type-3 slowly-changing-dimension apply: one row per key, with the
    ``tracked`` attribute keeping its PREVIOUS value in ``prev_col``
    (default ``prev_<tracked>``) — the limited-history middle ground
    between SCD1 (overwrite, no history) and SCD2 (full interval
    history). On update: a CHANGED tracked value pushes the old value
    into ``prev_col``; an unchanged one carries the existing previous
    value; a brand-new key starts with NULL. Non-tracked attributes
    refresh from the update (SCD1-style). ``current`` must already
    carry ``prev_col``; ``updates`` carries the schema without it.

    Scale: one key-shuffle left join of the update batch against the
    current slice's (key, tracked, prev) projection plus one anti-join
    for untouched rows — no window, no full rewrite; with a
    transactional format this is MERGE INTO with an UPDATE SET
    prev = old.tracked clause.
    """
    key_list = list(keys)
    pc = prev_col or f"prev_{tracked}"
    tracked_type = current.schema[tracked].dataType
    old = current.select(
        *key_list,
        F.col(tracked).alias("__old"),
        F.col(pc).alias("__oldprev"),
        F.lit(True).alias("__present"),
    )
    # New keys are detected by join-presence (__present null), NOT by
    # __old being null — an existing row whose tracked value is NULL must
    # still carry its previous value forward. Change detection is
    # null-safe so NULL→NULL counts as unchanged and NULL→value pushes
    # the (NULL) old value down, matching MERGE semantics. The NULL for
    # brand-new keys is cast to the tracked column's actual type so
    # non-string tracked columns don't coerce (or fail under ANSI).
    fresh = (
        updates.join(old, key_list, "left")
        .withColumn(
            pc,
            F.when(F.col("__present").isNull(), F.lit(None).cast(tracked_type))
            .when(~F.col("__old").eqNullSafe(F.col(tracked)), F.col("__old"))
            .otherwise(F.col("__oldprev")),
        )
        .drop("__old", "__oldprev", "__present")
    )
    untouched = current.join(
        updates.select(*key_list).distinct(), key_list, "anti"
    )
    return untouched.unionByName(fresh.select(*current.columns))


def merge_rollup(
    rollup: DataFrame,
    delta_rollup: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Incremental aggregate maintenance: combine an existing rollup with
    a new batch's rollup of the same shape — every non-key column must be
    a MERGEABLE partial (sums and counts; store (sum, count) pairs to
    maintain averages, min/max merge as themselves via a sum→min swap at
    the call site if needed).

    This is the reprocessing-free pattern for 100 TB rollups: aggregate
    only the delta (one small shuffle), then one |keys|-shuffle union+sum
    against the stored rollup — never re-scan history. Algebraic partials
    are exactly what Spark's own partial aggregation exploits inside one
    job; this operator applies the same idea ACROSS jobs with the rollup
    as durable state.
    """
    key_list = list(keys)
    merged = rollup.select(*key_list, *sum_cols).unionByName(
        delta_rollup.select(*key_list, *sum_cols)
    )
    return merged.groupBy(*key_list).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


def cdc_apply(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Materialize the final table state from a CDC change log
    (insert/update/delete rows): per key, the row with the highest
    ``seq_col`` wins, and keys whose winning operation is ``delete_op``
    are dropped entirely (tombstone semantics — the piece
    ``merge_snapshot`` SCD1 lacks).

    Contract: ``(keys, seq_col)`` is unique — a log that assigns the same
    sequence to two changes of one key has no defined winner, so ties are
    broken deterministically on ``op_col`` descending only to keep reruns
    stable, not to bless such logs. Sequence may be a commit LSN, a
    source-db transaction id, or an ingest timestamp — anything totally
    ordered per key.

    Scale: exactly the ``dedup_by_key`` window shape — one shuffle on the
    key, rank-1 per key, then the tombstone filter. Replaying a log
    segment is idempotent (same winners), and compaction = cdc_apply over
    (previous state tagged with seq −∞) ∪ (new log). With a transactional
    format the same logical op is MERGE INTO ... WHEN MATCHED [DELETE].
    """
    latest = dedup_by_key(
        changes, list(keys), order_by=[F.desc(seq_col), F.desc(op_col)]
    )
    return latest.filter(F.col(op_col) != delete_op).drop(seq_col, op_col)

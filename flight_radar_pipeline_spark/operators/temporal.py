"""Temporal joins Spark lacks as built-ins: as-of join and pure range join.

Both are implemented as compositions of existing DataFrame ops (SURVEY.md
§2 "custom operators" rule: composition first, Pandas UDF only when
semantics force it — here they don't):

- ``asof_join`` — pandas ``merge_asof`` semantics, distributed: tag both
  sides, union, ONE shuffle on the key, in-partition sort, then a
  ``last(ignorenulls)`` carry-forward window. No range cross product, no
  per-key collect.
- ``range_join_bucketed`` — inequality-only (no equi key) interval
  containment as an equi-join on coarse time buckets. Spark's planner
  falls back to BroadcastNestedLoopJoin for pure theta joins; bucketing
  restores hash-join scaling — shuffle volume follows bucket occupancy,
  not |events| × |intervals|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (backward, inclusive) within the same ``on``
    key; left rows with no prior right row keep nulls (left-outer).

    Right side contract: value columns must not collide with left column
    names (alias before calling), and (on, right_ts) must be unique —
    dedupe first, or the winner among equal timestamps is unspecified.
    Null-timestamp right rows never match; null-timestamp left rows match
    nothing.

    Scale: one shuffle keyed on ``on``; within each key partition the
    union is sorted once and scanned once (the window frame is
    unbounded-preceding ``last``, which Spark evaluates without
    re-scanning the frame per row). Hot keys are a data problem, not a
    plan problem — salt upstream if one key dominates.

    ``tolerance_seconds`` masks matches older than the given gap
    (pandas ``merge_asof(tolerance=...)``).
    """
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    collide = set(rcols) & set(left.columns)
    if collide:
        raise ValueError(f"right value columns collide with left: {sorted(collide)}")

    l = left.withColumn("__ats", F.col(left_ts)).withColumn("__side", F.lit(1))
    r = (
        right.filter(F.col(right_ts).isNotNull())
        .select(F.col(on), F.col(right_ts).alias("__ats"), *rcols)
        .withColumn("__side", F.lit(0))
        .withColumn("__rts", F.col("__ats"))
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.asc_nulls_first("__ats"), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(c, ignorenulls=True).over(w).alias(c) for c in rcols]
    matched_ts = F.last("__rts", ignorenulls=True).over(w).alias("__mts")
    out = (
        u.select(*left.columns, F.col("__side"), matched_ts, *carried)
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
    if tolerance_seconds is not None:
        ok = (
            F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col("__mts"))
        ) <= tolerance_seconds
        out = out.select(
            *left.columns,
            F.col("__mts"),
            *[F.when(ok, F.col(c)).alias(c) for c in rcols],
        )
    return out.drop("__mts")


def range_join_bucketed(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner containment join: event × interval pairs with
    ``start <= ts < end`` and NO equi key — distributed as an equi-join
    on coarse time buckets.

    Each interval explodes to every ``bucket_seconds`` bucket it covers
    (flooring only widens coverage — never misses an event); each event
    maps to exactly one bucket, so pairs are produced at most once and
    need no dedup. Pick ``bucket_seconds`` near the typical interval
    length: shorter → more interval replicas; longer → more
    false-candidate events per bucket.
    """
    b = int(bucket_seconds)
    ev = events.withColumn("__bucket", F.expr(f"unix_timestamp({ts_col}) div {b}"))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"unix_timestamp({start_col}) div {b}"),
                F.expr(f"unix_timestamp({end_col}) div {b}"),
            )
        ),
    )
    return (
        ev.join(iv, "__bucket")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bucket")
    )


def interval_overlap_pairs(
    intervals: DataFrame,
    id_col: str = "interval_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval–interval overlap self-join (``a.start < b.end AND
    b.start < a.end``, half-open) distributed as an equi-join on coarse
    time buckets — the interval analogue of ``range_join_bucketed``.

    Both sides explode to every bucket they cover, join on the bucket,
    and each overlapping pair is kept exactly ONCE: at the bucket
    containing the overlap's start instant (``greatest(a.start,
    b.start)``), which both intervals necessarily cover. That
    count-once filter replaces a post-join ``distinct`` — no second
    shuffle over the pair set.

    Returns ``(id_a, id_b, overlap_start, overlap_end)`` with
    ``id_a < id_b``. Candidate volume is bounded by per-bucket
    concurrency (peak overlapping intervals), not by the table size —
    the quantity ``peak_concurrent_sessions``-style sweeps measure.
    """
    b = int(bucket_seconds)
    iv = intervals.select(
        F.col(id_col).alias("__id"),
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
    ).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"unix_timestamp(__s) div {b}"),
                F.expr(f"unix_timestamp(__e) div {b}"),
            )
        ),
    )
    a = iv.select(
        F.col("__id").alias("id_a"),
        F.col("__s").alias("__sa"),
        F.col("__e").alias("__ea"),
        "__bucket",
    )
    c = iv.select(
        F.col("__id").alias("id_b"),
        F.col("__s").alias("__sb"),
        F.col("__e").alias("__eb"),
        "__bucket",
    )
    ov_start = F.greatest("__sa", "__sb")
    ov_end = F.least("__ea", "__eb")
    return (
        a.join(c, "__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter((F.col("__sa") < F.col("__eb")) & (F.col("__sb") < F.col("__ea")))
        .filter(F.expr(f"unix_timestamp(greatest(__sa, __sb)) div {b}") == F.col("__bucket"))
        .select(
            "id_a",
            "id_b",
            ov_start.alias("overlap_start"),
            ov_end.alias("overlap_end"),
        )
    )


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Ordered-sequence funnel progress per user → (user_col, stage):
    stage k means the user performed steps[0..k-1] at strictly increasing
    timestamps, earliest-first matching (the first qualifying event of
    each step advances the machine).

    One pass, one user-keyed shuffle: per-user events are collected into
    a time-sorted array and folded through a (stage, last_ts) state
    machine — no per-step self-join cascade over the fact table, which is
    the textbook SQL spelling and re-scans the facts once per step.
    Per-user arrays are bounded by user activity; for unbounded/streaming
    input the stateful sessionizer surface is the right tool.
    """
    per_user = events.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(F.struct(ts_col, order_tiebreak, type_col))
        ).alias("__seq")
    )
    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit("1900-01-01 00:00:00").cast("timestamp").alias("t"),
    )

    def advance(acc, e):
        # branches are mutually exclusive (each tests a distinct stage
        # value against the PRE-event acc), so one event advances at
        # most one stage
        out = acc
        for k, step in enumerate(steps):
            out = F.when(
                (acc["stage"] == k)
                & (e[type_col] == step)
                & (e[ts_col] > acc["t"]),
                F.struct(F.lit(k + 1).alias("stage"), e[ts_col].alias("t")),
            ).otherwise(out)
        return out

    return per_user.select(
        user_col,
        F.aggregate("__seq", init, advance)["stage"].alias("stage"),
    )


def interpolate_gaps(
    spine: DataFrame,
    key_col: str,
    t_col: str,
    v_col: str,
    decimals: int = 4,
) -> DataFrame:
    """Linear interpolation over a dense per-key time spine → adds
    ``v_filled`` (and ``fill_kind``: observed / interp / ffill / bfill).

    ``spine`` holds one row per (key, slot) with ``v_col`` NULL where the
    slot had no observations. Interior gaps fill linearly between the
    nearest observed anchors (weighted by epoch-second distance, so
    irregular spines work); leading/trailing gaps carry the nearest
    anchor (bfill/ffill); all-null keys stay NULL.

    Spark shape: two ``last/first(ignorenulls)`` carry windows per
    direction, both over the SAME (key, t) ordering — one shuffle, two
    in-partition sorts, no joins, no UDFs. Scale note: windows partition
    by ``key_col``; parallelism follows key cardinality (per-sensor /
    per-entity series at 100 TB — millions of keys), and a single global
    series should be bucketed by coarse time range first.
    """
    t, v = F.col(t_col), F.col(v_col)
    t_num = t.cast("double")
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(t_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(t_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    next_v = F.first(v, ignorenulls=True).over(w_next)
    prev_t = F.last(F.when(v.isNotNull(), t_num), ignorenulls=True).over(w_prev)
    next_t = F.first(F.when(v.isNotNull(), t_num), ignorenulls=True).over(w_next)
    frac = (t_num - prev_t) / (next_t - prev_t)
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    kind = (
        F.when(v.isNotNull(), F.lit("observed"))
        .when(prev_v.isNull() & next_v.isNull(), F.lit("empty"))
        .when(prev_v.isNull(), F.lit("bfill"))
        .when(next_v.isNull(), F.lit("ffill"))
        .otherwise(F.lit("interp"))
    )
    from flight_radar_pipeline_spark.operators.rounding import (
        expr_round_half_up,
    )

    return spine.select(
        key_col,
        t_col,
        # floor-based half-up rounding, NOT F.round: interpolation lands on
        # exact half-quanta whenever a gap midpoint splits two anchors, and
        # engines disagree on F.round/round ties (see rounding.py)
        expr_round_half_up(filled, decimals).alias("v_filled"),
        kind.alias("fill_kind"),
    )


def sessionize_capped(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    max_duration_seconds: int,
    max_events: int = 500,
) -> DataFrame:
    """Sessionization with BOTH an inactivity gap and a maximum session
    duration → (user, n_events, n_sessions, n_gap_breaks, n_cap_breaks):
    a new session starts when the gap to the previous event exceeds
    ``gap_seconds`` OR the span since the session's first event exceeds
    ``max_duration_seconds`` — the production rule (analytics stacks cap
    sessions at 4–24 h so a lunch-break keep-alive can't weld a day into
    one session) that the gap-only ``session_window`` / lag+cumsum
    rewrites CANNOT express: the duration test depends on the running
    session START, a data-dependent reset that is not a window frame.

    So the recursion folds JVM-side with ``F.aggregate`` over the
    per-user sorted timestamp array (the `user_balance_clamped` /
    Holt shape): state = (session_start, last_ts, counters), one pass,
    no Python. ``max_events`` bounds per-user state (documented cap, as
    Holt's 40-obs history) — beyond it, sessionize per (user, day)
    partitions upstream. Gap breaks use strict ``>`` (two events exactly
    ``gap`` apart stay together, matching the battery's lag+cumsum
    oracle convention)."""
    arr = F.slice(
        F.sort_array(F.collect_list(F.col(ts_col).cast("long"))),
        1,
        max_events,
    )
    per_user = events.groupBy(F.col(user_col).alias("user")).agg(
        arr.alias("__ts")
    )
    init = F.struct(
        F.lit(-1).cast("long").alias("start"),
        F.lit(-1).cast("long").alias("last"),
        F.lit(0).cast("long").alias("ns"),
        F.lit(0).cast("long").alias("ngap"),
        F.lit(0).cast("long").alias("ncap"),
    )

    def step(acc, t):
        first = acc["start"] < 0
        gap_brk = (~first) & ((t - acc["last"]) > gap_seconds)
        cap_brk = (
            (~first)
            & ~gap_brk
            & ((t - acc["start"]) > max_duration_seconds)
        )
        new_sess = first | gap_brk | cap_brk
        return F.struct(
            F.when(new_sess, t).otherwise(acc["start"]).alias("start"),
            t.alias("last"),
            (acc["ns"] + new_sess.cast("long")).alias("ns"),
            (acc["ngap"] + gap_brk.cast("long")).alias("ngap"),
            (acc["ncap"] + cap_brk.cast("long")).alias("ncap"),
        )

    folded = per_user.select(
        "user",
        F.size("__ts").cast("long").alias("n_events"),
        F.aggregate("__ts", init, step).alias("__st"),
    )
    return folded.select(
        "user",
        "n_events",
        F.col("__st.ns").alias("n_sessions"),
        F.col("__st.ngap").alias("n_gap_breaks"),
        F.col("__st.ncap").alias("n_cap_breaks"),
    )


def cusum_changepoint(
    series: DataFrame,
    group_col: str,
    t_col: str,
    value_col: str,
    value_dp: int = 6,
    z_dp: int = 4,
) -> DataFrame:
    """Offline CUSUM changepoint estimate per group → (group, n_points,
    change_t, cusum_peak, cusum_z): with S_t = Σ_{i≤t}(x_i − x̄), the
    estimated level-shift point is argmax_t |S_t| and the standardized
    peak z = max|S_t| / (σ·√n) grades its strength (≫1 ⇒ a real shift;
    ~0.5 under a stable mean). The monitoring staple for "did this
    metric change level, and when" — the retrospective dual of the
    streaming drift entries.

    ``series`` is the PRE-AGGREGATED (group, t, x) relation (e.g. daily
    means) — CUSUM is a property of the bucketed series, so the fact
    table never enters a window. Parity discipline: x and x̄ round to
    ``value_dp`` first, then the cumulative sum runs in t-order — a
    sequential fold both engines execute identically — so S_t is
    bit-identical cross-engine; argmax ties break on earliest t. One
    |groups|-keyed window over |series| rows; nothing fact-sized
    shuffles.
    """
    x = F.round(F.col(value_col).cast("double"), value_dp)
    g = F.col(group_col)
    # windows below partition on the post-alias "group"/"t" names, so they
    # are built inline after the aliasing select (group_col may differ)
    stats = series.select(
        g.alias("group"),
        F.col(t_col).alias("t"),
        x.alias("x"),
    ).select(
        "group",
        "t",
        "x",
        F.round(F.avg("x").over(Window.partitionBy("group")), value_dp).alias(
            "xbar"
        ),
        F.stddev_pop("x").over(Window.partitionBy("group")).alias("sd"),
        F.count(F.lit(1)).over(Window.partitionBy("group")).alias("n"),
    )
    cum = stats.select(
        "group",
        "t",
        "n",
        "sd",
        F.sum(F.col("x") - F.col("xbar"))
        .over(
            Window.partitionBy("group")
            .orderBy("t")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("s"),
    )
    ranked = cum.select(
        "group",
        "t",
        "n",
        "sd",
        "s",
        F.row_number()
        .over(
            Window.partitionBy("group").orderBy(
                F.abs(F.col("s")).desc(), F.col("t").asc()
            )
        )
        .alias("__rn"),
    )
    return ranked.filter(F.col("__rn") == 1).select(
        F.col("group"),
        F.col("n").cast("bigint").alias("n_points"),
        F.col("t").alias("change_t"),
        F.round(F.abs("s"), value_dp).alias("cusum_peak"),
        # a constant series has sd = 0 and nothing to grade: z is NULL
        # rather than an ANSI divide-by-zero
        F.when(
            F.col("sd") > 0,
            F.round(F.abs("s") / (F.col("sd") * F.sqrt(F.col("n"))), z_dp),
        ).alias("cusum_z"),
    )

"""Pin session boundary semantics at ``diff == gap`` exactly.

Verified empirically (Spark 4.1): ``F.session_window`` merges two events that
are exactly ``gap`` apart — window merge is ``next.start <= prev.end``
inclusive — so a new session starts only on a STRICT ``> gap`` silence.
The ``user_sessions`` oracle (lag + cumulative sum, break on ``>``) and the
streaming sessionizer (``streaming/events.py``, ``> gap_us`` mask) both
encode the same rule; this test locks all three together on a constructed
fixture that a random corpus would never exercise.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pyspark.sql.functions as F

GAP_MIN = 30

# u1: three events, each exactly 30:00 apart  -> ONE session of 3
# u2: two events 30:01 apart                  -> TWO sessions of 1
# u3: two events 29:59 apart                  -> ONE session of 2
ROWS = [
    (1, dt.datetime(2026, 1, 1, 0, 0, 0)),
    (1, dt.datetime(2026, 1, 1, 0, 30, 0)),
    (1, dt.datetime(2026, 1, 1, 1, 0, 0)),
    (2, dt.datetime(2026, 1, 1, 0, 0, 0)),
    (2, dt.datetime(2026, 1, 1, 0, 30, 1)),
    (3, dt.datetime(2026, 1, 1, 0, 0, 0)),
    (3, dt.datetime(2026, 1, 1, 0, 29, 59)),
]
EXPECTED = {1: [3], 2: [1, 1], 3: [2]}  # user -> per-session event counts


def _fixture_df(spark):
    return spark.createDataFrame(ROWS, "user_id bigint, ts timestamp")


def test_session_window_merges_at_exact_gap(spark):
    out = (
        _fixture_df(spark)
        .groupBy("user_id", F.session_window("ts", f"{GAP_MIN} minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("ts").alias("first_ts"))
        .orderBy("user_id", "first_ts")
        .collect()
    )
    got = {}
    for r in out:
        got.setdefault(r.user_id, []).append(r.n)
    assert got == EXPECTED


def test_oracle_formulation_matches_session_window(spark):
    """The lag+cumsum SQL with a strict ``>`` break reproduces
    ``session_window`` exactly on the boundary fixture (a ``>=`` break would
    split u1 into three sessions)."""
    con = duckdb.connect()
    con.sql("create table ev (user_id bigint, ts timestamp)")
    con.executemany("insert into ev values (?, ?)", ROWS)
    got_rows = con.sql(
        f"""
        with e as (
            select user_id, ts,
                   case when ts - lag(ts) over (partition by user_id order by ts)
                             > interval {GAP_MIN} minutes
                        then 1 else 0 end as brk
            from ev
        ), s as (
            select user_id, ts,
                   cast(sum(brk) over (
                       partition by user_id order by ts
                       rows between unbounded preceding and current row
                   ) as bigint) as session_id
            from e
        )
        select user_id, session_id, count(*) as n
        from s group by user_id, session_id
        order by user_id, session_id
        """
    ).fetchall()
    got = {}
    for user_id, _sid, n in got_rows:
        got.setdefault(user_id, []).append(n)
    assert got == EXPECTED


def test_stream_sessionizer_boundary(spark):
    """The vectorized per-group closer uses the same strict-> rule: feed the
    fixture plus a far-future flush event per user so every real session
    closes, then check emitted sessions."""
    from flight_radar_pipeline_spark.streaming.events import sessionize_stream

    flush = dt.datetime(2026, 6, 1)
    rows = ROWS + [(u, flush) for u in (1, 2, 3)]
    src = spark.createDataFrame(rows, "user_id bigint, ts timestamp")

    # Drive the stateful logic through a one-batch stream over a temp parquet.
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        src.coalesce(1).write.mode("overwrite").parquet(f"{d}/in")
        stream = spark.readStream.schema(src.schema).parquet(f"{d}/in")
        q = (
            sessionize_stream(stream, gap_minutes=GAP_MIN)
            .writeStream.format("memory")
            .queryName("boundary_sessions")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql(
            "select user_id, n_events from boundary_sessions order by user_id, session_start"
        ).collect()
    got = {}
    for r in out:
        got.setdefault(r.user_id, []).append(r.n_events)
    assert got == EXPECTED


def test_native_stream_emits_inclusive_of_watermark_boundary(spark):
    """Append-mode session_window finalization is boundary-INCLUSIVE: a
    session whose window end (last_ts + gap) equals the final watermark
    (max feed ts at delay 0) IS emitted. Constructed so user 1's lone
    session ends exactly 30:00 before the global max ts."""
    import tempfile

    from flight_radar_pipeline_spark.streaming.events import (
        run_stream_to_memory,
        sessionize_stream_native,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0)),  # window end 00:30 == watermark
        (2, dt.datetime(2024, 1, 1, 0, 30, 0)),  # sets max ts; own session open
    ]
    src = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    with tempfile.TemporaryDirectory() as d:
        src.coalesce(1).write.mode("overwrite").parquet(f"{d}/in")
        stream = spark.readStream.schema(src.schema).parquet(f"{d}/in")
        out = run_stream_to_memory(
            sessionize_stream_native(stream, gap_minutes=GAP_MIN),
            output_mode="append",
            state_partitions=2,
        ).collect()
    assert [(r.user_id, r.n_events) for r in out] == [(1, 1)]


def test_left_outer_stream_emission_boundary(spark):
    """Left-outer stream-stream join: unmatched left rows emit
    null-extended only when the final GLOBAL watermark — the MIN over
    both sides' event-time maxima (multipleWatermarkPolicy default) —
    passes the END of their match window EXCLUSIVELY. Both sides' maxima
    are pinned to 00:31 (late view D, late click 999), so the final
    watermark is 00:31: view A's window end 00:30 < 00:31 emits, view
    B's 00:31 equals it exactly (stays in state), view C has a real
    click match (emits immediately regardless of watermark), and D
    itself (window end 01:01) stays open."""
    import tempfile

    from flight_radar_pipeline_spark.streaming.events import (
        run_stream_to_memory,
        view_click_left_outer_stream,
    )

    rows = [
        # (event_id, user_id, event_type, ts)
        (100, 1, "view", dt.datetime(2024, 1, 1, 0, 0, 0)),   # A: end 00:30 < max
        (200, 2, "view", dt.datetime(2024, 1, 1, 0, 1, 0)),   # B: end 00:31 == max
        (300, 3, "view", dt.datetime(2024, 1, 1, 0, 2, 0)),   # C: matched
        (301, 3, "click", dt.datetime(2024, 1, 1, 0, 10, 0)),
        (400, 8, "view", dt.datetime(2024, 1, 1, 0, 31, 0)),   # D: sets view wm
        (999, 9, "click", dt.datetime(2024, 1, 1, 0, 31, 0)),  # sets click wm
    ]
    src = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    with tempfile.TemporaryDirectory() as d:
        src.coalesce(1).write.mode("overwrite").parquet(f"{d}/in")

        def stream():
            return spark.readStream.schema(src.schema).parquet(f"{d}/in")

        out = run_stream_to_memory(
            view_click_left_outer_stream(
                stream().filter(F.col("event_type") == "view"),
                stream().filter(F.col("event_type") == "click"),
            ),
            output_mode="append",
            state_partitions=2,
        ).collect()
    got = sorted((r.view_id, r.click_id) for r in out)
    assert got == [(100, None), (300, 301)]


def test_full_outer_stream_emission_boundary(spark):
    """Full-outer sibling: BOTH sides' orphans obey strict watermark
    boundaries. Final global watermark pinned to 00:31 as in the
    left-outer test. Views: A (window end 00:30 < wm) emits null-
    extended, B (00:31 == wm) stays in state. Clicks: X at 00:20 < wm
    emits null-extended (no view within its 30-minute lookback), Y at
    00:31 == wm stays (a view at exactly the watermark could still
    match it). C/301 is a real match and emits eagerly."""
    import tempfile

    from flight_radar_pipeline_spark.streaming.events import (
        run_stream_to_memory,
        view_click_full_outer_stream,
    )

    rows = [
        # (event_id, user_id, event_type, ts)
        (100, 1, "view", dt.datetime(2024, 1, 1, 0, 0, 0)),    # A: end 00:30 < wm
        (200, 2, "view", dt.datetime(2024, 1, 1, 0, 1, 0)),    # B: end 00:31 == wm
        (300, 3, "view", dt.datetime(2024, 1, 1, 0, 2, 0)),    # C: matched
        (301, 3, "click", dt.datetime(2024, 1, 1, 0, 10, 0)),
        (500, 5, "click", dt.datetime(2024, 1, 1, 0, 20, 0)),  # X: orphan, < wm
        (600, 6, "click", dt.datetime(2024, 1, 1, 0, 31, 0)),  # Y: orphan, == wm
        (400, 8, "view", dt.datetime(2024, 1, 1, 0, 31, 0)),   # sets view wm
    ]
    src = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    with tempfile.TemporaryDirectory() as d:
        src.coalesce(1).write.mode("overwrite").parquet(f"{d}/in")

        def stream():
            return spark.readStream.schema(src.schema).parquet(f"{d}/in")

        out = run_stream_to_memory(
            view_click_full_outer_stream(
                stream().filter(F.col("event_type") == "view"),
                stream().filter(F.col("event_type") == "click"),
            ),
            output_mode="append",
            state_partitions=2,
        ).collect()
    got = {(r.view_id, r.click_id) for r in out}
    assert got == {(None, 500), (100, None), (300, 301)}

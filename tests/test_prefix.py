"""`operators/prefix.ranged_cumulative` is an identity rewrite of the
global `Window.orderBy(...)` running sum — verify exactly that, against
the naive global-window spelling, across bucket counts, shuffle widths,
skewed key distributions, and the degenerate shapes (single row, fewer
distinct keys than buckets → empty buckets, boundary lead patching)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.prefix import ranged_cumulative


def _naive(df, order_col, sum_cols):
    w_cum = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_lead = Window.orderBy(order_col)
    w_all = Window.partitionBy()
    return df.select(
        order_col,
        *[F.sum(c).over(w_cum).alias(f"{c}_cum") for c in sum_cols],
        F.lead(order_col).over(w_lead).alias(f"{order_col}_next"),
        *[F.sum(c).over(w_all).alias(f"{c}_tot") for c in sum_cols],
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("buckets", [2, 7, 64])
def test_matches_global_window_on_skewed_keys(spark, buckets):
    rng = random.Random(10)
    # skewed: half the mass in a narrow band, plus outliers
    data = [
        Row(
            v=float(round(rng.gauss(100.0, 2.0), 2))
            if rng.random() < 0.5
            else float(round(rng.uniform(0, 10_000), 2)),
            a=rng.randrange(0, 50),
            b=rng.randrange(-5, 5),
        )
        for _ in range(500)
    ]
    # distinct-value grain: collapse duplicates like the call sites do
    df = (
        spark.createDataFrame(data)
        .groupBy("v")
        .agg(F.sum("a").alias("a"), F.sum("b").alias("b"))
    )
    got = ranged_cumulative(
        df, "v", ["a", "b"], buckets=buckets, with_lead=True, with_totals=True
    ).select("v", "a_cum", "b_cum", "v_next", "a_tot", "b_tot")
    want = _naive(df, "v", ["a", "b"])
    assert _rows(got) == _rows(want)


def test_empty_buckets_and_tiny_frames(spark):
    # 3 distinct keys, 64 buckets: most buckets empty; lead must still
    # patch across them
    df = spark.createDataFrame(
        [Row(v=1.0, a=5), Row(v=2.0, a=7), Row(v=100.0, a=-1)]
    )
    got = ranged_cumulative(
        df, "v", ["a"], buckets=64, with_lead=True, with_totals=True
    )
    rows = {r.v: r for r in got.collect()}
    assert rows[1.0].a_cum == 5 and rows[1.0].v_next == 2.0
    assert rows[2.0].a_cum == 12 and rows[2.0].v_next == 100.0
    assert rows[100.0].a_cum == 11 and rows[100.0].v_next is None
    assert all(r.a_tot == 11 for r in rows.values())
    # single row
    one = spark.createDataFrame([Row(v=3.0, a=4)])
    r = ranged_cumulative(
        one, "v", ["a"], buckets=8, with_lead=True, with_totals=True
    ).collect()[0]
    assert (r.a_cum, r.v_next, r.a_tot) == (4, None, 4)


def test_shuffle_width_invariance(spark):
    """Identical output at widths 1 and 16 — BOTH with pinned buckets
    and with the self-sized default (buckets = shuffle.partitions, so
    width 1 exercises the degenerate ≤2-bucket floor: an empty
    boundary-probe array would null the bucket ids and silently drop
    every row through the offsets join)."""
    rng = random.Random(11)
    df = (
        spark.createDataFrame(
            [Row(v=float(i), a=rng.randrange(0, 9)) for i in range(300)]
        )
        .repartition(13)
    )
    for buckets in (16, None):
        base = None
        for width in ("1", "16"):
            spark.conf.set("spark.sql.shuffle.partitions", width)
            try:
                rows = _rows(
                    ranged_cumulative(
                        df, "v", ["a"], buckets=buckets, with_lead=True,
                        with_totals=True,
                    )
                )
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", "32")
            assert len(rows) == 300
            if base is None:
                base = rows
            else:
                assert rows == base


def test_descending_with_tiebreak_and_rank(spark):
    """ABC/Lorenz shape: cumulative revenue + dense rank under
    (value desc, id asc) — vs the naive global window."""
    rng = random.Random(12)
    data = [
        Row(id=i, v=rng.randrange(0, 40))  # heavy ties
        for i in range(400)
    ]
    df = spark.createDataFrame(data)
    got = _rows(
        ranged_cumulative(
            df,
            "v",
            ["v"],
            buckets=16,
            ascending=False,
            tiebreakers=["id"],
            with_rank="rk",
            with_totals=True,
        ).select("id", "v", "v_cum", "rk", "v_tot")
    )
    w_cum = Window.orderBy(F.desc("v"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_row = Window.orderBy(F.desc("v"), F.asc("id"))
    w_all = Window.partitionBy()
    want = _rows(
        df.select(
            "id",
            "v",
            F.sum("v").over(w_cum).alias("v_cum"),
            F.row_number().over(w_row).cast("bigint").alias("rk"),
            F.sum("v").over(w_all).alias("v_tot"),
        )
    )
    assert got == want


def test_ascending_rank_matches_row_number(spark):
    rng = random.Random(13)
    df = spark.createDataFrame(
        [Row(id=i, v=float(rng.randrange(0, 25))) for i in range(200)]
    )
    got = _rows(
        ranged_cumulative(
            df, "v", [], buckets=8, tiebreakers=["id"], with_rank="i"
        ).select("id", "v", "i")
    )
    want = _rows(
        df.select(
            "id",
            "v",
            F.row_number()
            .over(Window.orderBy("v", "id"))
            .cast("bigint")
            .alias("i"),
        )
    )
    assert got == want


def test_running_max_matches_global_window(spark):
    """max_cols: inclusive and strictly-preceding running maxima equal
    the naive global-window spelling (incl. the null on the global
    first row)."""
    rng = random.Random(14)
    df = spark.createDataFrame(
        [Row(v=float(i), m=rng.randrange(-50, 50)) for i in range(300)]
    )
    got = _rows(
        ranged_cumulative(
            df, "v", [], buckets=7, max_cols=["m"]
        ).select("v", "m_runmax", "m_runmax_prev")
    )
    w_inc = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_exc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    want = _rows(
        df.select(
            "v",
            F.max("m").over(w_inc).alias("m_runmax"),
            F.max("m").over(w_exc).alias("m_runmax_prev"),
        )
    )
    assert got == want


def test_no_unpartitioned_data_window(spark):
    """The only ordered-unpartitioned window may run over the ≤buckets-row
    partials — the data-sized windows must all be partitioned by bucket."""
    df = spark.range(0, 1000).select(
        F.col("id").cast("double").alias("v"), F.lit(1).alias("a")
    )
    out = ranged_cumulative(df, "v", ["a"], buckets=16, with_lead=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every Window node over the bucketed data carries the bucket key in
    # its partition spec; the offsets window (no partition spec) is fed
    # by a HashAggregate keyed on the bucket — i.e. ≤buckets rows
    import re

    specs = re.findall(r"Window \[.*?\]", plan)
    assert specs, plan
    for s in specs:
        if "__pfx_bkt" not in s:
            pytest.fail(f"window without bucket partitioning: {s}")

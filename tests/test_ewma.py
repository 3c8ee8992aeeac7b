"""user_value_ewma pins pandas ``ewm(adjust=True)`` semantics: the
JVM-side (num, den) fold over the trailing frame must reproduce pandas
exactly while histories stay under the 20-row truncation, and must match
the truncated closed form beyond it."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F

ALPHA = 0.3
K = 20


def _spark_ewma(spark, rows):
    src = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, value double"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(K - 1), 0)
    )
    decay = F.lit(1.0 - ALPHA)
    folded = F.aggregate(
        F.col("f"),
        F.struct(F.lit(0.0).alias("num"), F.lit(0.0).alias("den")),
        lambda acc, v: F.struct(
            (acc["num"] * decay + v).alias("num"),
            (acc["den"] * decay + F.lit(1.0)).alias("den"),
        ),
    )
    out = (
        src.select(
            "user_id",
            "event_id",
            F.collect_list("value").over(w).alias("f"),
        )
        .select("user_id", "event_id", (folded["num"] / folded["den"]).alias("e"))
        .collect()
    )
    return {(r.user_id, r.event_id): r.e for r in out}


def test_matches_pandas_ewm_under_truncation(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    vals = [5.0, -1.5, 3.25, 0.0, 7.75, 2.5, -4.0, 1.125]
    for i, v in enumerate(vals):
        rows.append((1, i, t0 + dt.timedelta(minutes=i), v))
    got = _spark_ewma(spark, rows)
    expected = pd.Series(vals).ewm(alpha=ALPHA, adjust=True).mean()
    for i in range(len(vals)):
        assert abs(got[(1, i)] - expected[i]) < 1e-12


def test_truncated_closed_form_beyond_k(spark):
    """Past 20 rows the fold intentionally diverges from untruncated
    pandas by the (1-alpha)^20 tail; it must equal the truncated formula
    sum w_j v_{t-j} / sum w_j over the last K rows only."""
    t0 = dt.datetime(2024, 1, 1)
    vals = [float((7 * i) % 11 - 5) for i in range(30)]
    rows = [(1, i, t0 + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)]
    got = _spark_ewma(spark, rows)
    i = 29
    frame = vals[i - K + 1 : i + 1]
    num = sum(v * (1 - ALPHA) ** (K - 1 - j) for j, v in enumerate(frame))
    den = sum((1 - ALPHA) ** (K - 1 - j) for j in range(K))
    assert abs(got[(1, i)] - num / den) < 1e-12

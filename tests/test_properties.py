"""Property tests (SURVEY §5 tier 4) for the custom operators: each is
checked against an independent reference implementation on seeded random
data — pandas ``merge_asof`` for the as-of join, a brute-force filter for
the range join, union-find for connected components.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.graph import connected_components
from flight_radar_pipeline_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)

SEEDS = [7, 41, 1234]


def _random_events(rng, n, keys, t0=1_700_000_000):
    return pd.DataFrame(
        {
            "k": rng.integers(0, keys, n),
            "ts": pd.to_datetime(
                t0 + rng.integers(0, 3600 * 24, n), unit="s"
            ),
            "val": rng.integers(0, 1000, n),
        }
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_asof_matches_pandas_merge_asof(spark, seed):
    rng = np.random.default_rng(seed)
    left = _random_events(rng, 60, keys=4).rename(columns={"val": "lval"})
    right = _random_events(rng, 40, keys=4).rename(columns={"val": "rval"})
    # contract: unique (key, ts) on the right
    right = right.drop_duplicates(subset=["k", "ts"], keep="first")

    got_df = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
    )
    got = (
        got_df.select("k", "ts", "lval", "rval")
        .toPandas()
        .sort_values(["k", "ts", "lval"], ignore_index=True)
    )
    want = (
        pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts"),
            on="ts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        .sort_values(["k", "ts", "lval"], ignore_index=True)[
            ["k", "ts", "lval", "rval"]
        ]
    )
    pd.testing.assert_frame_equal(
        got.astype({"rval": "float64"}), want.astype({"rval": "float64"})
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_range_join_matches_bruteforce(spark, seed):
    rng = np.random.default_rng(seed)
    ev = _random_events(rng, 80, keys=1)[["ts"]].assign(eid=range(80))
    iv = pd.DataFrame(
        {
            "wid": range(10),
            "start_ts": pd.to_datetime(
                1_700_000_000 + rng.integers(0, 3600 * 20, 10), unit="s"
            ),
        }
    )
    iv["end_ts"] = iv["start_ts"] + pd.to_timedelta(
        rng.integers(600, 14_400, 10), unit="s"
    )
    got = (
        range_join_bucketed(
            spark.createDataFrame(ev),
            spark.createDataFrame(iv),
            ts_col="ts",
            bucket_seconds=1800,
        )
        .select("eid", "wid")
        .toPandas()
    )
    want = ev.merge(iv, how="cross")
    want = want[(want["ts"] >= want["start_ts"]) & (want["ts"] < want["end_ts"])][
        ["eid", "wid"]
    ]
    assert sorted(map(tuple, got.values)) == sorted(map(tuple, want.values))


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed", SEEDS)
def test_connected_components_matches_union_find(spark, seed):
    rng = np.random.default_rng(seed)
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 40, 30), rng.integers(0, 40, 30))
        if a != b
    ]
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a bigint, id_b bigint"
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()
    }
    assert got == _union_find_components(edges)

"""The self-sizing battery entries derive their scale parameters from the
corpus count on BOTH engines — the Spark side via the Python sizing rules
(``operators.similarity.recommended_planes`` / integer-ceil modulus), the
oracle via an equivalent SQL expression. These must agree EXACTLY at any
corpus count or the driver's value-hash gate diverges; pin the equality
over a wide n sweep (the measured scale-killer fix from SCALE_RUN r5)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flight_radar_pipeline_spark.operators.similarity import (
    recommended_planes,
    recommended_semantic_k,
)
from flight_radar_pipeline_spark.plans.battery_corpus import (
    _LSH_TARGET_OCC,
    _SEM_TARGET_CELL,
)
from flight_radar_pipeline_spark.plans.battery_prep import _CHIST_TARGET


@settings(max_examples=200, deadline=None)
@given(n=st.integers(min_value=1, max_value=10**12))
def test_planes_sql_mirror_matches_python(n):
    (got,) = duckdb.sql(
        f"select greatest(4, cast(ceil(log2({n} / {_LSH_TARGET_OCC}.0)) as int))"
    ).fetchone()
    assert got == recommended_planes(n, target_bucket_occupancy=_LSH_TARGET_OCC)


@settings(max_examples=200, deadline=None)
@given(n=st.integers(min_value=1, max_value=10**12))
def test_chist_modulus_sql_mirror_matches_python(n):
    (got,) = duckdb.sql(
        f"select greatest(1, ({n} + {_CHIST_TARGET} - 1) // {_CHIST_TARGET})"
    ).fetchone()
    assert got == max(1, -(-n // _CHIST_TARGET))


@pytest.mark.parametrize(
    "n,want",
    [(1, 4), (400, 4), (401, 4), (6400, 4), (6401, 5), (20_000, 6), (10**9, 22)],
)
def test_recommended_planes_landmarks(n, want):
    assert recommended_planes(n) == want


def test_recommended_semantic_k_grows_linearly():
    assert recommended_semantic_k(500) == 8  # floor
    assert recommended_semantic_k(20_000) == 20
    assert recommended_semantic_k(10**9) == 10**6


@settings(max_examples=200, deadline=None)
@given(n=st.integers(min_value=1, max_value=10**12))
def test_semantic_k_sql_mirror_matches_python(n):
    (got,) = duckdb.sql(
        f"select greatest(8, cast(ceil({n} / {_SEM_TARGET_CELL}.0) as bigint))"
    ).fetchone()
    assert got == recommended_semantic_k(n, target_cell_size=_SEM_TARGET_CELL)


def test_semantic_k_at_measured_landmarks():
    """The battery target reproduces the measured sf1 winner (k=80 at
    n=20 000 — SCALE_RUN.json semantic_dedup_sf1_scaled_k80) and keeps
    battery parity at the test scales (k=8 for n ≤ 2 000)."""
    assert recommended_semantic_k(500, target_cell_size=_SEM_TARGET_CELL) == 8
    assert recommended_semantic_k(2_000, target_cell_size=_SEM_TARGET_CELL) == 8
    assert recommended_semantic_k(20_000, target_cell_size=_SEM_TARGET_CELL) == 80

"""Accuracy contract for the approx_percentile twins.

The *_approx battery entries are rows-only at the driver gate (sketch
estimates are engine-specific), so their accuracy evidence lives here:
each is compared against its exact twin on the same data and must agree
within the sketch's rank-error bound.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def reg():
    import __spark_entry__ as e

    return e._registry()


def test_approx_deciles_are_near_equi_depth(spark, reg):
    exact = {
        r.decile: r for r in reg["order_price_deciles"].build(spark, SF_DIR).collect()
    }
    approx = {
        r.decile: r
        for r in reg["order_price_deciles_approx"].build(spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact) == set(range(1, 11))
    total = sum(r.n for r in exact.values())
    for d in range(1, 11):
        # rank error 1/accuracy=1e-4 of rows per boundary; allow 1% slack
        assert abs(approx[d].n - exact[d].n) <= max(5, 0.01 * total), (
            d,
            approx[d].n,
            exact[d].n,
        )
    # totals conserve: every order lands in exactly one bucket either way
    assert sum(r.n for r in approx.values()) == total


def test_approx_mad_flags_agree_with_exact(spark, reg):
    exact = {
        r.event_id
        for r in reg["event_value_mad_outliers"].build(spark, SF_DIR).collect()
    }
    approx = {
        r.event_id
        for r in reg["event_value_mad_outliers_approx"].build(spark, SF_DIR).collect()
    }
    # the flag sets may differ only at the |z| ≈ threshold margin; bound
    # the symmetric difference at 2% of the exact flag count
    assert exact, "exact twin flagged nothing — test is vacuous"
    sym = len(exact ^ approx)
    assert sym <= max(5, 0.02 * len(exact)), (sym, len(exact), len(approx))

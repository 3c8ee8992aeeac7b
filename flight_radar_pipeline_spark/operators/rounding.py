"""Shared numpy rounding helper for the Arrow fast paths.

Spark's ``F.round`` and DuckDB's ``round`` both round half-quanta
HALF_UP *away from zero* (round(-0.5) = -1).  ``np.floor(x*scale+0.5)``
rounds half-quanta toward +inf instead, so for negative values landing
exactly on a half-quantum (e.g. a cosine of -0.1235 at 4 decimals) an
Arrow fast path would disagree with both the expression implementation
and the SQL oracle.  Every Arrow path rounds through this helper so all
three conventions agree for all signs.
"""

from __future__ import annotations


def np_round_half_up(x, decimals: int):
    """Round ndarray ``x`` to ``decimals`` half-up away from zero,
    matching Spark ``F.round`` / DuckDB ``round`` semantics."""
    import numpy as np

    scale = 10.0**decimals
    return np.copysign(np.floor(np.abs(x) * scale + 0.5), x) / scale


# Formulas that GENERATE exact half-quanta (e.g. linear interpolation with
# frac = 1/2 between 4-decimal anchors) can't use F.round vs DuckDB round:
# the two engines detect "half" differently (exact-decimal expansion of the
# double vs a scaled float compare), so ties flip per engine. These two
# helpers emit the SAME IEEE double expression — abs/mult/add/floor — on
# both sides, so identical input bits give identical rounded output.

def expr_round_half_up(col, decimals: int):
    """Spark Column: round half-up away from zero via floor arithmetic."""
    from pyspark.sql import functions as F

    scale = 10.0**decimals
    mag = F.floor(F.abs(col) * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
    return F.when(col < 0, -mag).otherwise(mag)


def sql_round_half_up(expr: str, decimals: int) -> str:
    """DuckDB SQL fragment matching ``expr_round_half_up`` bit-for-bit."""
    scale = 10.0**decimals
    mag = f"floor(abs({expr}) * {scale} + 0.5) / {scale}"
    return f"(case when ({expr}) < 0 then -({mag}) else {mag} end)"

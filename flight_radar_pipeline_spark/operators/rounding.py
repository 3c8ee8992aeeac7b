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

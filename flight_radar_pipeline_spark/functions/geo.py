"""Geodesic distance as native Column expressions.

The reference computes haversine in a row-at-a-time Python UDF
(``/root/reference/src/transform.py:57-87``: r=6371 km, None-propagating,
``FloatType`` return). A Python UDF forces a ``BatchEvalPython`` node —
every row is pickled to a Python worker and back, breaking WholeStageCodegen.
Here the same formula is a pure Column expression: fully codegen'd JVM-side,
null-propagation for free, no serialization. At 100 TB this is the
difference between a scan-speed pipeline and a Python-bound one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def haversine_km(
    lat1: Column | str,
    lon1: Column | str,
    lat2: Column | str,
    lon2: Column | str,
    radius_km: float = EARTH_RADIUS_KM,
) -> Column:
    """Great-circle distance in km, computed in double precision.

    Same math as the reference UDF (2·r·asin(√(sin²(Δφ/2) +
    cosφ₁·cosφ₂·sin²(Δλ/2)))); any null input yields null, matching the
    UDF's explicit None check.
    """
    lat1, lon1, lat2, lon2 = (_col(c).cast("double") for c in (lat1, lon1, lat2, lon2))
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dphi / 2), 2) + F.cos(phi1) * F.cos(phi2) * F.pow(F.sin(dlmb / 2), 2)
    return F.lit(2.0 * radius_km) * F.asin(F.sqrt(a))


def haversine_km_f32(
    lat1: Column | str,
    lon1: Column | str,
    lat2: Column | str,
    lon2: Column | str,
) -> Column:
    """Haversine with the reference's exact type discipline: compute in
    double, cast the result to float32 — required for bit-exact parity with
    golden values like ``distance == 15340.56640625``
    (``/root/reference/tests/test_answers.py:49``; SURVEY.md §1.2)."""
    return haversine_km(lat1, lon1, lat2, lon2).cast("float")

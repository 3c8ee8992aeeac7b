"""DuckDB-oracle comparison helper (local mirror of the driver's t2 gate).

Canonicalization matches the driver contract: sort columns by name, sort
rows by all columns, then compare values. Exact for ints/strings; floats
compared bit-near (rtol=0) by default since oracle-facing queries round
in-plan on both sides.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import DataFrame


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    if len(out):
        out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def compare(
    spark_df: DataFrame,
    sql: str,
    con: duckdb.DuckDBPyConnection,
    float_rtol: float = 0.0,
) -> None:
    """Assert the Spark result and the DuckDB oracle result match."""
    got = canonical(spark_df.toPandas())
    want = canonical(con.sql(sql).df())
    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g.astype(float), w.astype(float))):
                na, nb = pd.isna(a), pd.isna(b)
                assert na == nb, f"{col}[{i}]: null mismatch {a!r} vs {b!r}"
                if not na:
                    ok = (a == b) or (
                        float_rtol > 0 and math.isclose(a, b, rel_tol=float_rtol)
                    )
                    assert ok, f"{col}[{i}]: {a!r} != {b!r}"
        else:
            # pandas object-dtype != treats None/NaN as missing and returns
            # True for null != null, so nulls must be compared via masks
            # (first bitten by the full-outer join's nullable string col)
            gn, wn = pd.isna(g), pd.isna(w)
            null_mism = gn != wn
            assert not null_mism.any(), (
                f"{col}: null-mask mismatch at row {null_mism.idxmax()}: "
                f"{g[null_mism.idxmax()]!r} vs {w[null_mism.idxmax()]!r}"
            )
            mism = (~gn) & (g.astype(object) != w.astype(object))
            assert not mism.any(), (
                f"{col}: first mismatch at row {mism.idxmax()}: "
                f"{g[mism.idxmax()]!r} vs {w[mism.idxmax()]!r}"
            )

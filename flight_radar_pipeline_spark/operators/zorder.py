"""Z-order (Morton) clustering keys for multi-column data skipping.

Sorting a table by one column gives perfect min/max pruning on that
column and none on others; sorting by the interleaved bits of several
quantized columns (the Z-order curve) gives good pruning on EACH of
them — the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``,
here as a plain column expression any writer can sort by.

Mechanics: each column is quantized to ``bits`` levels over a fixed
[lo, hi) domain (linear bucketing — rank-based quantization would need a
global sort; linear suffices for pruning and keeps the key a pure
per-row expression), then the level bits interleave column-round-robin
into one bigint. Everything is integer arithmetic — codegen'd,
engine-portable, exact SQL oracle.

Scale: the key costs nothing to compute (per-row shifts/ors); the value
is at WRITE time — ``df.repartitionByRange(F.col("zkey")).sortWithinPartitions("zkey")``
before a parquet write clusters row groups so min/max statistics prune
multi-column predicates. Domains (lo/hi) come from the caller: fixed
business domains beat data-derived ones (no extra pass, stable across
incremental writes).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear quantization of ``col`` to [0, 2^bits): values at or below
    ``lo`` map to 0, at or above ``hi`` to the top level. Integer output,
    null-safe (null → level 0, keeping the key total)."""
    levels = 1 << bits
    scaled = F.floor(
        (F.coalesce(col.cast("double"), F.lit(lo)) - F.lit(lo))
        / F.lit(hi - lo)
        * F.lit(levels)
    ).cast("bigint")
    return F.greatest(F.least(scaled, F.lit(levels - 1)), F.lit(0))


def zorder_key(
    cols: Sequence[Column],
    domains: Sequence[tuple[float, float]],
    bits: int = 8,
) -> Column:
    """Morton key: interleave the ``bits`` quantized bits of each column,
    round-robin (bit i of column c lands at position i·n_cols + c), as
    one bigint. ``n_cols · bits`` must fit in 63 bits."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"zorder key needs {n * bits} bits; max 63")
    qs = [quantize(c, lo, hi, bits) for c, (lo, hi) in zip(cols, domains)]
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        for c, q in enumerate(qs):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * n + c)
    return key

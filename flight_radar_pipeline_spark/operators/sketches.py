"""Count-min sketch: fixed-size frequency summaries of unbounded keys.

The frequency-sketch companion to HLL cardinality
(``approx_distinct_users``): a depth×width counter grid where each of
``depth`` md5-derived hash rows buckets every key occurrence; a key's
estimate is the MIN of its ``depth`` bucket counters. Estimates never
under-count, over-count by ≤ 2·N/width with probability 1−2⁻ᵈᵉᵖᵗʰ
(Cormode & Muthukrishnan), and the grid is linear — sketches of two
partitions/days/sources ADD, which is what makes the structure right for
100 TB: per-executor partial grids merge map-side, the final sketch is
depth·width counters regardless of key cardinality, and it broadcasts
for point queries.

Determinism: the hash family is md5-prefix arithmetic (engine-portable,
partition-invariant), so the sketch — and every estimate — is exactly
reproducible in SQL; the oracle states the identical grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key: F.Column, row: F.Column, width: int) -> F.Column:
    h = F.substring(
        F.md5(F.concat(row.cast("string"), F.lit("-"), key.cast("string"))), 1, 12
    )
    return F.conv(h, 16, 10).cast("bigint") % width


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """One occurrence-weighted counter grid over ``key_col`` →
    (row, bucket, c). One groupBy on (row, bucket) — ≤ depth·width output
    rows with full map-side partial aggregation; the row-replication
    explode is row-local."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    b = df.select(F.col(key_col).alias("__k"), rows).select(
        "row", _bucket(F.col("__k"), F.col("row"), width).alias("bucket")
    )
    return b.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-query the sketch for each key in ``keys`` → (key_col, est).
    The sketch broadcasts (it is at most depth·width rows); per key the
    estimate is min over its depth buckets."""
    kb = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(F.col(key_col), F.lit(i), width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__rb"),
    ).select(key_col, "__rb.row", "__rb.bucket")
    return (
        kb.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("c").alias("est"))
    )


def moment_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-group mergeable moment partials ``(n, mean, m2)`` — the
    Welford/Chan representation of count/mean/variance that ADDS like a
    sketch: partials of two days/partitions/sources combine exactly (see
    ``merge_moment_partials``), which is what lets a 100 TB rollup keep
    3 numbers per (day, key) and answer mean/variance over any day
    subset without touching raw history.

    Numerical note (deliberate trade-off): m2 is the one-pass grouped
    form Σx² − n·mean², NOT the two-pass centered Σ(x−mean)² — one scan
    instead of two, and the same arithmetic any SQL engine's var_samp
    restates, which is what the oracle parity checks rely on. The
    one-pass form can cancel catastrophically for large-mean/tiny-
    variance groups (Σx² and n·mean² agree to many digits), so the
    result is clamped at 0: variance can then round to 0 but never go
    negative / NaN downstream. Callers with |mean| ≫ std who need full
    precision should pre-center ``value_col`` by an approximate group
    mean first — shifting by a constant leaves m2 unchanged in exact
    arithmetic and removes the cancellation."""
    return df.groupBy(*group_cols).agg(
        F.count(value_col).alias("n"),
        F.avg(value_col).alias("mean"),
        F.greatest(
            F.lit(0.0),
            F.sum(F.col(value_col) * F.col(value_col))
            - F.count(value_col)
            * F.avg(value_col)
            * F.avg(value_col),
        ).alias("m2"),
    )


def merge_moment_partials(
    partials: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Combine per-slice moment partials into per-group totals with
    Chan's pairwise update, folded in a DETERMINISTIC order
    (``order_cols`` sorts the slices) so the float result is
    partition-invariant:

        n = n₁+n₂;  δ = mean₂−mean₁
        mean = mean₁ + δ·n₂/n;  m2 = m2₁ + m2₂ + δ²·n₁·n₂/n

    Output: (group..., n, mean, m2) — variance = m2/(n−1), std = √.
    The merge is exact in real arithmetic (≡ computing over the union),
    so a rounded comparison against the direct computation holds on any
    engine; per-group state is 3 numbers per slice during the fold."""
    acc0 = F.struct(
        F.lit(0.0).alias("n"), F.lit(0.0).alias("mean"), F.lit(0.0).alias("m2")
    )

    def step(acc, p):
        n = acc["n"] + p["n"]
        delta = p["mean"] - acc["mean"]
        safe = F.when(n > 0, n).otherwise(F.lit(1.0))
        return F.struct(
            n.alias("n"),
            (acc["mean"] + delta * p["n"] / safe).alias("mean"),
            (
                acc["m2"] + p["m2"] + delta * delta * acc["n"] * p["n"] / safe
            ).alias("m2"),
        )

    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
                F.col("n").cast("double").alias("n"),
                F.col("mean").cast("double").alias("mean"),
                F.col("m2").cast("double").alias("m2"),
            )
        )
    )
    fin = F.aggregate(ordered, acc0, step)
    g = partials.groupBy(*group_cols).agg(fin.alias("__m"))
    return g.select(
        *group_cols,
        F.col("__m.n").cast("bigint").alias("n"),
        F.col("__m.mean").alias("mean"),
        F.col("__m.m2").alias("m2"),
    )


def kmv_partials(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group KMV partial: the k smallest (unit-hash, key) structs
    over the group's DISTINCT keys → (group..., __mins array). Bounded
    state (≤ k structs per group), exactly mergeable
    (``merge_kmv_partials``) because the k smallest hashes of a union
    are each among the k smallest of their slice. The estimator reads
    (k−1)/h_k off the k-th struct. Dedupe keys per group FIRST when a
    key can repeat (same (hv, key) struct merges away on
    ``array_distinct``, so repeats across slices are harmless — only
    in-slice repeats inflate the partial build's input)."""
    from flight_radar_pipeline_spark.operators.corpus_prep import unit_hash

    return (
        df.select(*group_cols, F.col(key_col).alias("__k"))
        .distinct()
        .select(*group_cols, "__k", unit_hash("__k", salt).alias("__hv"))
        .groupBy(*group_cols)
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("__hv").alias("hv"), F.col("__k").alias("user_id"))
                    )
                ),
                1,
                k,
            ).alias("__mins")
        )
    )


def merge_kmv_partials(
    partials: DataFrame,
    group_cols: list[str],
    k: int,
    mins_col: str = "__mins",
) -> DataFrame:
    """Combine KMV partials into per-group partials of the union:
    flatten, struct-dedup (the same key arriving from several slices
    carries an identical (hv, key) struct), re-take the k smallest.
    Exact — the merged partial equals the partial computed from the
    union directly, on any split of the data (property-tested)."""
    return partials.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list(mins_col)))),
            1,
            k,
        ).alias(mins_col)
    )


def hist_partials(
    df: DataFrame,
    value_col: str,
    group_cols: list,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Equi-width histogram partials: per group, the count of values in
    each of ``nbins`` fixed [lo, hi) bins (out-of-range values clamp to
    the edge bins, so mass is never dropped). The quantile analogue of
    ``moment_partials``: partials over any partitioning of the data —
    per day, per source, per executor — MERGE by adding bin counts
    (``merge_hist_partials``), the merged state is ``nbins`` longs per
    group regardless of row count, and the whole build is one
    map-side-combinable groupBy. Fully deterministic (no sampling), so
    estimates restate exactly in SQL — the property ``approx_percentile``
    sketches can't give an oracle.

    NULL values are dropped before bucketing (they carry no position on
    the value axis). Without the explicit filter they would silently
    become bucket-0 mass: floor((NULL−lo)/w) is NULL, but Spark's
    ``greatest``/``least`` SKIP nulls, so greatest(0, NULL) = 0 — a
    phantom lo-edge count that would skew n and every quantile, and
    engines disagree on null handling in greatest, breaking oracle
    parity."""
    w = (hi - lo) / nbins
    bucket = F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - lo) / w).cast("int")),
    ).alias("bucket")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bucket)
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("bin_count"))
    )


def merge_hist_partials(partials: DataFrame, group_cols: list) -> DataFrame:
    """Add bin counts across partials that share a group — the linear
    merge that makes the histogram a distributed sketch."""
    return partials.groupBy(*group_cols, "bucket").agg(
        F.sum("bin_count").alias("bin_count")
    )


def hist_quantiles(
    merged: DataFrame,
    group_cols: list,
    probs: list,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Quantile estimates from merged histogram state: for each prob p,
    the FIRST bin whose cumulative count reaches p·n, linearly
    interpolated inside the bin — the classic equi-width estimator with
    error bounded by one bin width. Window cumsum per group (state is
    nbins rows/group, so the window is trivially small), then one
    row_number pick per (group, p). Returns (group..., p, quantile, n)."""
    from pyspark.sql import Window

    w = (hi - lo) / nbins
    cum_w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy(*group_cols)
    cums = merged.select(
        *group_cols,
        "bucket",
        "bin_count",
        F.sum("bin_count").over(cum_w).alias("cum"),
        F.sum("bin_count").over(tot_w).alias("n"),
    )
    probs_col = F.explode(
        F.array(*[F.lit(float(p)) for p in probs])
    ).alias("p")
    cand = cums.select(*group_cols, "bucket", "bin_count", "cum", "n", probs_col)
    target = F.col("p") * F.col("n")
    pick_w = Window.partitionBy(*group_cols, "p").orderBy("bucket")
    first_hit = (
        cand.filter(F.col("cum") >= target)
        .withColumn("__rn", F.row_number().over(pick_w))
        .filter(F.col("__rn") == 1)
    )
    est = F.lit(lo) + F.lit(w) * (
        F.col("bucket")
        + (target - (F.col("cum") - F.col("bin_count"))) / F.col("bin_count")
    )
    return first_hit.select(
        *group_cols,
        "p",
        est.alias("quantile"),
        F.col("n").cast("bigint").alias("n"),
    )

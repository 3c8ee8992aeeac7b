"""Round-10b battery additions — two supervised-learning-adjacent
families the registry genuinely lacks (pre-registration sweep per the
standing dedup-honesty rule: `grep @register` names + family keywords):

- CART root split / supervised discretization: the best single
  threshold on a continuous feature by weighted Gini impurity — the
  decision-tree primitive (and the supervised cousin of the registry's
  UNsupervised binning entries). Candidate thresholds are every
  distinct feature value, so the candidate grid GROWS with the data —
  the running class counts ride `operators/prefix.ranged_cumulative`
  (round-10's bucket-partials device), and the argmax is one
  map-side-combinable ``max(struct(...))`` aggregate, never a global
  sort.
- Isotonic (PAVA) probability calibration: the monotone recalibration
  FIT. Distinct from `event_score_calibration`, which is the
  reliability *diagnosis* (per-bin gap/Brier) — this entry solves the
  weighted isotonic-regression problem the diagnosis motivates. The
  fact collapses to a 20-bin integer grid; the pool-adjacent-violators
  walk runs on the driver over those ≤20 exact-integer pairs (the
  sanctioned bounded-grain class, the markov-stationary precedent),
  with every pooling comparison done by bigint cross-multiplication so
  the blocks are engine-independent by construction. The DuckDB oracle
  restates the fit through the minimax identity
  iso[i] = max_{j<=i} min_{k>=i} mean(j..k) — a genuinely different
  algorithm that must agree exactly.

Candidates DROPPED by the sweep before registration: Bloom-filter
membership (`orders_bloom_semi_join` covers the family), reservoir /
weighted sampling (round-9 drop list), decile binning (unsupervised
binning is `order_price_deciles_approx` + `event_value_histogram`
territory), and Platt scaling (a logistic fit on scores — the IRLS /
GD trainer family already covers parametric fits; isotonic is the
nonparametric member the registry lacked).

Registered into the shared REGISTRY on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.prefix import ranged_cumulative
from flight_radar_pipeline_spark.plans.battery import (
    register,
    register_grid_plans,
)
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# CART root split: best Gini threshold on o_totalprice for 'F' status
# --------------------------------------------------------------------------

_STUMP_ORACLE = """
    with g as (
        select o_totalprice as thr,
               count(*) as cnt,
               sum(case when o_orderstatus = 'F' then 1 else 0 end) as pos
        from orders group by 1
    ), c as (
        select thr,
               sum(cnt) over (order by thr) as nl,
               sum(pos) over (order by thr) as pl,
               sum(cnt) over () as n,
               sum(pos) over () as p
        from g
    ), cand as (
        select thr, nl, pl, n - nl as nr, p - pl as pr, n, p
        from c where nl < n
    ), scored as (
        select thr, nl, pl, nr, pr, n, p,
               cast(pl * pl + (nl - pl) * (nl - pl) as double)
                   / cast(nl as double)
               + cast(pr * pr + (nr - pr) * (nr - pr) as double)
                   / cast(nr as double) as score,
               1 - cast(p * p + (n - p) * (n - p) as double)
                   / cast(n * n as double) as parent
        from cand
    )
    select round(thr, 6) as threshold,
           cast(nl as bigint) as n_left, cast(pl as bigint) as pos_left,
           cast(nr as bigint) as n_right, cast(pr as bigint) as pos_right,
           round(parent, 6) as gini_parent,
           round(1 - score / cast(n as double), 6) as gini_split,
           round(parent - (1 - score / cast(n as double)), 6) as gini_gain
    from scored
    qualify row_number() over (order by score desc, thr asc) = 1
"""


@register("order_price_stump_split", _STUMP_ORACLE)
def order_price_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single-threshold split of orders on o_totalprice predicting
    o_orderstatus = 'F' by weighted Gini impurity → one row (threshold,
    n_left, pos_left, n_right, pos_right, gini_parent, gini_split,
    gini_gain): the CART root-node computation — the decision-tree /
    supervised-discretization primitive. Minimizing the weighted
    impurity Σ side n·(1 − Σ p²) is identical to maximizing
    score = (pos_L² + neg_L²)/n_L + (pos_R² + neg_R²)/n_R, so the split
    choice needs no per-candidate subtraction from the parent.

    Cross-engine exactness: class counts are bigint; pos², neg² and
    their sums are computed in decimal(38,0) (exact to ~10¹⁸ rows —
    DuckDB's sum() is already hugeint, so both engines square exact
    integers and never wrap); each candidate's score is then TWO
    correctly-rounded exact-integer→double casts and one IEEE division
    per side — a fixed expression with no aggregation order, so both
    engines produce bit-identical doubles and the
    (score desc, threshold asc) argmax can never diverge. Ties in
    score break on the smaller threshold.

    Scale: one fact scan → distinct-value (threshold) grid; running
    class counts via `operators/prefix.ranged_cumulative` (bucket
    partials + broadcast offsets — the grid grows with the data, so no
    single-task window); the argmax is one map-side-combinable
    max(struct) aggregate. Nothing fact-sized after the first
    groupBy."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("thr"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    grid = orders.groupBy("thr").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    # materialize_input (round-14): the threshold grid is NOT
    # exchange-reused in practice — the executed plan scanned orders 8×
    # across the device's three consumers (bounds probe, bucketed frame,
    # offsets broadcast); the lazy checkpoint collapses that to one
    # computation (interleaved A/B 3.04/2.67 → 2.46/2.24 s warm)
    c = ranged_cumulative(
        grid, "thr", ["cnt", "pos"], with_totals=True, materialize_input=True
    )
    nl, pl = F.col("cnt_cum"), F.col("pos_cum")
    n, p = F.col("cnt_tot"), F.col("pos_tot")
    nr, pr = n - nl, p - pl

    # squared class counts in decimal(19,0) → products widen to
    # decimal(38,0): exact (never wraps) to ~1e18 rows, matching the
    # DuckDB oracle's hugeint sum() arithmetic
    def _sq(x):
        d = x.cast("decimal(19,0)")
        return d * d

    score = (
        (_sq(pl) + _sq(nl - pl)).cast("double") / nl.cast("double")
        + (_sq(pr) + _sq(nr - pr)).cast("double") / nr.cast("double")
    )
    best = (
        c.filter(nl < n)
        .select(
            F.struct(
                score.alias("s"),
                (-F.col("thr")).alias("negthr"),
                F.col("thr").alias("thr"),
                nl.alias("nl"),
                pl.alias("pl"),
                nr.alias("nr"),
                pr.alias("pr"),
            ).alias("cand"),
            n.alias("n"),
            p.alias("p"),
        )
        .agg(
            F.max("cand").alias("b"),
            F.max("n").alias("n"),
            F.max("p").alias("p"),
        )
    )
    parent = 1 - (
        (_sq(F.col("p")) + _sq(F.col("n") - F.col("p"))).cast("double")
        / _sq(F.col("n")).cast("double")
    )
    split = 1 - F.col("b.s") / F.col("n").cast("double")
    return best.where(F.col("b").isNotNull()).select(
        F.round(F.col("b.thr"), 6).alias("threshold"),
        F.col("b.nl").cast("bigint").alias("n_left"),
        F.col("b.pl").cast("bigint").alias("pos_left"),
        F.col("b.nr").cast("bigint").alias("n_right"),
        F.col("b.pr").cast("bigint").alias("pos_right"),
        F.round(parent, 6).alias("gini_parent"),
        F.round(split, 6).alias("gini_split"),
        F.round(parent - split, 6).alias("gini_gain"),
    )


# --------------------------------------------------------------------------
# isotonic (PAVA) calibration of the sigmoid purchase score
# --------------------------------------------------------------------------

_ISO_BINS = 20

_ISO_ORACLE = f"""
    with s as (
        select round(1 / (1 + exp(-((value - 100.0) / 50.0))), 9) as sc,
               case when event_type = 'purchase' then 1 else 0 end as g
        from events
        where value is not null
    ), b as (
        select least(cast(floor(sc * {_ISO_BINS}) as int), {_ISO_BINS - 1})
                   as bin,
               count(*) as n, sum(g) as pos, round(avg(sc), 6) as mean_pred
        from s group by 1
    ), c as (
        select bin, n, pos,
               sum(pos) over (order by bin) as cp,
               sum(n) over (order by bin) as cn
        from b
    ), mn as (
        -- minimax identity: iso[i] = max over j<=i of
        --   min over k>=i of pooled mean(j..k)
        select i.bin as bin, j.bin as jb,
               min(cast(k.cp - j.cp + j.pos as double)
                   / cast(k.cn - j.cn + j.n as double)) as v
        from c i
        join c j on j.bin <= i.bin
        join c k on k.bin >= i.bin
        group by 1, 2
    ), iso as (
        select bin, max(v) as iso from mn group by 1
    )
    select cast(b.bin as bigint) as bin,
           cast(b.n as bigint) as n,
           cast(b.pos as bigint) as pos,
           b.mean_pred,
           round(cast(b.pos as double) / cast(b.n as double), 6) as frac_pos,
           round(iso.iso, 6) as iso_prob
    from b join iso using (bin)
    order by bin
"""


def _iso_bin_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-side subplan of `event_score_isotonic_fit`: sigmoid
    score → ≤`_ISO_BINS`-row exact-integer (n, pos, mean_pred) grid —
    collected for the driver-side PAVA walk AND broadcast-joined back
    in the final plan."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()  # a NULL score has no bin; mirrored
    )  # in the oracle's WHERE — keeps the driver-side sort total
    s = ev.select(
        F.round(
            1 / (1 + F.exp(-((F.col("value") - 100.0) / 50.0))), 9
        ).alias("sc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g"),
    )
    return (
        s.select(
            F.least(
                F.floor(F.col("sc") * _ISO_BINS).cast("int"),
                F.lit(_ISO_BINS - 1),
            ).alias("bin"),
            "sc",
            "g",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("g").alias("pos"),
            F.round(F.avg("sc"), 6).alias("mean_pred"),
        )
    )


@register_grid_plans("event_score_isotonic_fit")
def _iso_grid_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {"bin_grid": _iso_bin_grid(spark, sf_dir)}


@register("event_score_isotonic_fit", _ISO_ORACLE)
def event_score_isotonic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted isotonic (PAVA) calibration of the sigmoid purchase
    score → (bin, n, pos, mean_pred, frac_pos, iso_prob) over
    20 fixed-width score bins: the monotone nondecreasing
    probability fit minimizing the count-weighted L2 distance to the
    per-bin positive rates — the nonparametric recalibration transform
    (`event_score_calibration` is the diagnosis this fit answers; the
    trainer entries cover the parametric/Platt side).

    Cross-engine exactness: the fact collapses to per-bin exact integer
    (n, pos); the pool-adjacent-violators walk runs on the driver over
    those ≤20 pairs (bounded-grain class, the markov
    precedent) with every "previous block mean > current" comparison
    done by bigint cross-multiplication — the pooled blocks are
    therefore exact and engine-independent. Each bin's fitted value is
    ONE int→double division of its block's pooled integers; the DuckDB
    oracle instead evaluates the minimax identity
    iso[i] = max_(j≤i) min_(k≥i) mean(j..k) over the bounded bin grid —
    int→double casts preserve weak order, so the double min/max selects
    exactly the pooled block's rational and the two algorithms agree to
    the bit before the final 6dp round. mean_pred is the one
    order-sensitive double (avg of 9dp scores); its 6dp round absorbs
    the ulp, the established battery contract.

    Scale: one fact scan → 20-row integer grid; driver state
    is O(bins); the join-back is a broadcast. PAVA on an UNBINNED
    score column is inherently sequential — binning first is how
    production isotonic calibrators run at scale anyway (the fit is a
    step function; bins set its resolution)."""
    b = _iso_bin_grid(spark, sf_dir)
    rows = sorted((r.bin, r.n, r.pos) for r in b.collect())  # ≤ bins
    # pool-adjacent-violators on exact integers: a block is
    # (bins, pos_sum, n_sum); pool while the previous mean exceeds the
    # current (cross-multiplied — no division until the very end)
    blocks: list[list] = []  # [ [bin, ...], pos_sum, n_sum ]
    for bin_id, n_b, pos_b in rows:
        blocks.append([[bin_id], pos_b, n_b])
        while (
            len(blocks) >= 2
            and blocks[-2][1] * blocks[-1][2] > blocks[-1][1] * blocks[-2][2]
        ):
            last = blocks.pop()
            blocks[-1][0].extend(last[0])
            blocks[-1][1] += last[1]
            blocks[-1][2] += last[2]
    fitted = [
        (bin_id, float(pos_sum) / float(n_sum))
        for bins_, pos_sum, n_sum in blocks
        for bin_id in bins_
    ]
    v_df = spark.createDataFrame(fitted, "bin int, iso double")
    return (
        b.join(F.broadcast(v_df), "bin")
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            F.col("n").cast("bigint").alias("n"),
            F.col("pos").cast("bigint").alias("pos"),
            "mean_pred",
            F.round(
                F.col("pos").cast("double") / F.col("n").cast("double"), 6
            ).alias("frac_pos"),
            F.round("iso", 6).alias("iso_prob"),
        )
        .orderBy("bin")
    )

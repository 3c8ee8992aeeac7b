"""Pattern-mining operators: association rules, distribution-fit tests,
lag autocorrelation, blocked fuzzy linkage.

Library forms of the ``plans/battery_mining.py`` entries — reusable on any
DataFrame, each with the 100 TB posture at the definition site. The battery
wrappers pair every one with a DuckDB oracle; ``tests/test_mining_ops.py``
additionally brute-forces them on small random frames (shapes the synthetic
tables never produce).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def basket_association_rules(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    support_dp: int = 6,
    ratio_dp: int = 4,
) -> DataFrame:
    """Market-basket pair rules (Agrawal-Srikant A-priori's L2 step):
    for every unordered item pair {a < b} co-present in a basket, emit
    ``n_both`` (baskets containing both), ``support`` (n_both /
    n_baskets), ``conf_a_to_b`` (n_both / n_a) and ``lift``
    (n_both·n_baskets / (n_a·n_b)).

    Scale shape: ONE shuffle on the basket key builds deduped sorted item
    sets; a single row-local explode then emits pairs, per-item marginal
    sentinels on both sides, and a basket marker, so the fact scan is
    never repeated (three separate aggregates would each re-scan —
    ReuseExchange cannot help because filter pushdown de-unifies the
    subtrees). Marginals and the total resolve as window lookups over the
    aggregated frame, which is ≤ |items|² + 2|items| + 1 rows — bounded
    by the ITEM DIMENSION, not the facts. Per-basket pair fan-out is
    C(basket,2); cap basket size upstream if a degenerate basket can hold
    thousands of distinct items.

    Empty-string sentinels require non-empty item values (enforced by
    filter)."""
    it = F.col(item_col)
    clean = items.where(it.isNotNull() & (it != "")).select(
        F.col(basket_col).alias("__basket"), it.alias("__item")
    )
    baskets = clean.groupBy("__basket").agg(
        F.array_sort(F.collect_set("__item")).alias("items")
    )
    from flight_radar_pipeline_spark.functions.text import pair_combinations

    its = F.col("items")
    emit = F.concat(
        F.array(F.struct(F.lit("").alias("item_a"), F.lit("").alias("item_b"))),
        F.transform(
            its, lambda x: F.struct(x.alias("item_a"), F.lit("").alias("item_b"))
        ),
        F.transform(
            its, lambda x: F.struct(F.lit("").alias("item_a"), x.alias("item_b"))
        ),
        pair_combinations(its, "item_a", "item_b"),
    )
    counts = (
        baskets.select(F.explode(emit).alias("p"))
        .select("p.*")
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("cnt"))
    )
    is_marker = (F.col("item_a") == "") & (F.col("item_b") == "")
    is_single_a = (F.col("item_a") != "") & (F.col("item_b") == "")
    is_single_b = (F.col("item_a") == "") & (F.col("item_b") != "")
    enriched = counts.select(
        "item_a",
        "item_b",
        "cnt",
        F.max(F.when(is_marker, F.col("cnt")))
        .over(Window.partitionBy())
        .cast("double")
        .alias("n_baskets"),
        F.max(F.when(is_single_a, F.col("cnt")))
        .over(Window.partitionBy("item_a"))
        .cast("double")
        .alias("n_a"),
        F.max(F.when(is_single_b, F.col("cnt")))
        .over(Window.partitionBy("item_b"))
        .cast("double")
        .alias("n_b"),
    )
    return (
        enriched.where((F.col("item_a") != "") & (F.col("item_b") != ""))
        .select(
            "item_a",
            "item_b",
            F.col("cnt").alias("n_both"),
            F.round(F.col("cnt") / F.col("n_baskets"), support_dp).alias("support"),
            F.round(F.col("cnt") / F.col("n_a"), ratio_dp).alias("conf_a_to_b"),
            F.round(
                F.col("cnt") * F.col("n_baskets") / (F.col("n_a") * F.col("n_b")),
                ratio_dp,
            ).alias("lift"),
        )
        .orderBy("item_a", "item_b")
    )


def benford_digit_fit(
    amounts: DataFrame, amount_col: str, freq_dp: int = 6, chi2_dp: int = 4
) -> DataFrame:
    """Benford's-law screen: leading-digit frequencies of a positive
    amount column vs the log10(1 + 1/d) expectation, with per-digit χ²
    contributions. The digit comes from integer cents
    (floor(x·100) → string head) — never from double formatting, which
    differs across engines. One scan, a ≤9-row aggregate, one 1-row total
    broadcast; χ²-summing the terms against a χ²₈ table is the caller's
    significance test.

    Domain: amounts ≥ 0.01 — sub-cent values floor to 0 cents, whose
    leading "digit" 0 has no Benford expectation (log10(1 + 1/0) is a
    division by zero that Spark NULLs and DuckDB inf's), so the filter
    is on integer cents ≥ 1, not merely x > 0."""
    x = F.col(amount_col)
    d = amounts.where(F.floor(x * 100) >= 1).select(
        F.substring(F.floor(x * 100).cast("bigint").cast("string"), 1, 1).alias(
            "digit_s"
        )
    )
    obs = d.groupBy("digit_s").agg(F.count("*").alias("n_obs"))
    totals = d.agg(F.count("*").cast("double").alias("total"))
    exp_freq = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        obs.select(F.col("digit_s").cast("int").alias("digit"), "n_obs")
        .crossJoin(F.broadcast(totals))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs") / F.col("total"), freq_dp).alias("obs_freq"),
            F.round(exp_freq, freq_dp).alias("exp_freq"),
            F.round(
                F.pow(F.col("n_obs") - F.col("total") * exp_freq, 2)
                / (F.col("total") * exp_freq),
                chi2_dp,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


def lag_autocorr(
    series: DataFrame,
    key_col: str,
    value_col: str,
    order_cols: list[str],
    lags: tuple[int, ...] = (1, 2),
    dp: int = 4,
) -> DataFrame:
    """Per-key lag-k Pearson autocorrelation of ``value_col`` under the
    total order ``order_cols`` (include a tiebreaker column — a partial
    order makes lag() nondeterministic). One window shuffle on the key,
    then a hash aggregate; corr's null-pair skipping drops exactly the
    first k rows of each partition."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    cols: list[Column] = [F.col(key_col), F.col(value_col)]
    for k in lags:
        cols.append(F.lag(value_col, k).over(w).alias(f"__lag{k}"))
    lagged = series.select(*cols)
    aggs = [
        F.round(F.corr(value_col, f"__lag{k}"), dp).alias(f"lag{k}_autocorr")
        for k in lags
    ]
    return (
        lagged.groupBy(key_col)
        .agg(*aggs, F.count("*").alias("n_rows"))
        .orderBy(key_col)
    )


def blocked_fuzzy_pairs(
    names: DataFrame,
    name_col: str,
    block_fn,
    max_dist: int = 3,
) -> DataFrame:
    """Fellegi-Sunter record linkage: candidate pairs share a blocking key
    (``block_fn``, a Column → Column function over the name — or a LIST of
    them for multi-pass blocking), then Levenshtein distance ≤
    ``max_dist`` confirms. Run it over the DISTINCT-name dimension, never
    the fact table: cost is Σ|block|² per pass, so each block function
    must keep blocks small (the classic choice: a stable token, a
    phonetic code, a sorted-neighborhood window).

    Single-pass blocking MISSES pairs whose edits fall inside the
    blocking token itself (measured on the part-name universe:
    head-noun blocking recalls 78/94 of true ≤3-edit pairs — "blue
    bolt"/"blue rod" differ in the noun). Multi-pass blocking — one pass
    per token — is the standard mitigation and recalls 94/94 there
    (``tests/test_mining_ops.py``); candidates union before a single
    verify. Output: (name_a < name_b, dist)."""
    fns = block_fn if isinstance(block_fn, (list, tuple)) else [block_fn]
    if not fns:
        raise ValueError(
            "blocked_fuzzy_pairs: at least one blocking function required"
        )
    base = names.select(F.col(name_col).alias("name")).distinct()
    cands = None
    for fn in fns:
        keyed = base.select("name", fn(F.col("name")).alias("blk"))
        a, b = keyed.alias("a"), keyed.alias("b")
        pairs = a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.name") < F.col("b.name")),
        ).select(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )
        cands = pairs if cands is None else cands.unionByName(pairs)
    return (
        cands.distinct()
        .select(
            "name_a",
            "name_b",
            F.levenshtein(F.col("name_a"), F.col("name_b")).alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
        .orderBy("name_a", "name_b")
    )


def km_survival(
    durations: DataFrame,
    duration_col: str,
    event_col: str,
    dp: int = 6,
) -> DataFrame:
    """Kaplan-Meier product-limit estimator over (duration, is_event)
    rows — right-censored rows carry ``event_col = false`` with their
    censoring time as the duration. Output: one row per distinct EVENT
    time: (duration, n_risk, n_events, survival).

    Shape: one aggregate to (duration → d_i, c) — the only fact-sized
    step — then two windows over the |distinct durations| frame: a
    descending cumulative count gives the at-risk set (no correlated
    subquery), and survival is exp of an ascending log-sum. The terminal
    full-depletion event (d_i = n_risk, only possible at the last
    duration) would take ln(0): its term is excluded and its survival
    forced to 0, identically on any engine."""
    agg = durations.groupBy(F.col(duration_col).alias("dur")).agg(
        F.sum(F.when(F.col(event_col), 1).otherwise(0)).alias("d_i"),
        F.count("*").alias("c"),
    )
    w_desc = Window.orderBy(F.desc("dur"))
    w_asc = Window.orderBy(F.asc("dur"))
    km = (
        agg.withColumn("n_risk", F.sum("c").over(w_desc))
        .where(F.col("d_i") > 0)
        .withColumn(
            "__term",
            F.when(
                F.col("d_i") < F.col("n_risk"),
                F.log(F.lit(1) - F.col("d_i") / F.col("n_risk")),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "s",
            F.when(F.col("d_i") == F.col("n_risk"), F.lit(0.0)).otherwise(
                F.exp(F.sum("__term").over(w_asc))
            ),
        )
    )
    return km.select(
        F.col("dur").alias("duration"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d_i").cast("bigint").alias("n_events"),
        F.round("s", dp).alias("survival"),
    ).orderBy("duration")


def gini_coefficient(
    values: DataFrame,
    value_col: str,
    id_col: str,
    top_fraction: float = 0.1,
    dp: int = 6,
) -> DataFrame:
    """Gini coefficient + Lorenz top-share of a non-negative value
    column, via the rank formula G = 2·Σ(i·vᵢ)/(n·Σv) − (n+1)/n under
    the total (value, id) order. The global rank comes from
    ``operators/prefix.ranged_cumulative`` (round-10: range-bucket
    counts + broadcast offsets compose to exactly ``row_number() over
    (order by v, id)`` without funneling the value frame through one
    task); totals ride the same bucket partials. One bucket-parallel
    rank pass and one aggregate."""
    from flight_radar_pipeline_spark.operators.prefix import (
        ranged_cumulative,
    )

    # n = global row count: every row needs it for the top-decile fence,
    # so it rides the same bucket partials via a ones column
    vals = values.select(
        F.col(value_col).alias("v"),
        F.col(id_col).alias("k"),
        F.lit(1).alias("one"),
    )
    s = ranged_cumulative(
        vals,
        "v",
        ["v", "one"],
        tiebreakers=["k"],
        with_rank="i",
        with_totals=True,
        materialize_input=True,
    ).select(
        "v", "i", F.col("one_tot").alias("n"), F.col("v_tot").alias("tot")
    )
    is_top = F.col("i") > F.col("n") - F.floor(
        F.col("n") * F.lit(top_fraction)
    ).cast("bigint")
    a = s.agg(
        F.max("n").alias("n"),
        F.max("tot").alias("tot"),
        F.sum(F.col("i") * F.col("v")).alias("snum"),
        F.sum(F.when(is_top, F.col("v")).otherwise(F.lit(0.0))).alias("top_v"),
    )
    return a.select(
        F.col("n").alias("n_values"),
        F.round("tot", 2).alias("total"),
        F.round(
            F.lit(2.0) * F.col("snum") / (F.col("n") * F.col("tot"))
            - (F.col("n") + F.lit(1.0)) / F.col("n"),
            dp,
        ).alias("gini"),
        F.round(F.col("top_v") / F.col("tot"), dp).alias("top_share"),
    )


def fellegi_sunter_weights(
    records: DataFrame,
    id_col: str,
    block_cols: Sequence[str],
    field_mu: dict[str, tuple[float, float]],
    agree_fns: dict | None = None,
    log_base: float = 2.0,
) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage SCORING: candidate
    pairs share the blocking key, and each comparison field contributes
    log(m/u) on agreement, log((1−m)/(1−u)) on disagreement — the
    classic match weight whose sign/magnitude drives link / possible /
    non-link decisions. ``field_mu`` maps field → (m, u) priors (m =
    P(agree | match), u = P(agree | non-match)); supply EM-estimated or
    domain priors. ``agree_fns`` overrides the default equality
    agreement per field with ``fn(col_a, col_b) -> BooleanColumn`` (e.g.
    tolerance bands for numeric fields). Null comparisons count as
    disagreement (conservative).

    Complements ``blocked_fuzzy_pairs`` (which decides by a single edit
    distance): here evidence from MANY fields combines with calibrated
    weights. Scale: the quadratic step is confined inside blocks, so the
    blocking key must have cardinality that GROWS with the data (ids,
    names, phonetic codes — never a fixed-arity category alone); cost is
    Σ|block|², one self-join + pure column arithmetic, no shuffle after
    the join beyond the caller's sink.

    Returns (id_a, id_b, <field>_agree flags..., weight), id_a < id_b.
    """
    agree_fns = agree_fns or {}
    fields = list(field_mu)
    cols = [id_col, *block_cols, *fields]
    base = records.select(*dict.fromkeys(cols))
    a = base.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"__ba_{c}") for c in block_cols],
        *[F.col(c).alias(f"__fa_{c}") for c in fields],
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"__bb_{c}") for c in block_cols],
        *[F.col(c).alias(f"__fb_{c}") for c in fields],
    )
    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        cond = cond & (F.col(f"__ba_{c}") == F.col(f"__bb_{c}"))
    pairs = a.join(b, cond)
    ln_base = math.log(log_base)
    weight = F.lit(0.0)
    agree_cols = []
    for c in fields:
        m, u = field_mu[c]
        fn = agree_fns.get(c)
        agr = (
            fn(F.col(f"__fa_{c}"), F.col(f"__fb_{c}"))
            if fn is not None
            else (F.col(f"__fa_{c}") == F.col(f"__fb_{c}"))
        )
        agr = F.coalesce(agr, F.lit(False))
        agree_cols.append(agr.alias(f"{c}_agree"))
        weight = weight + F.when(
            agr, F.lit(math.log(m / u) / ln_base)
        ).otherwise(F.lit(math.log((1 - m) / (1 - u)) / ln_base))
    return pairs.select("id_a", "id_b", *agree_cols, weight.alias("weight"))


def logistic_irls(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    steps: int = 4,
    ridge: float = 1e-8,
    agg_dp: int | None = None,
    weight_dp: int | None = None,
) -> tuple[list[float], list[float]]:
    """Logistic regression by IRLS (Newton–Raphson) → (weights,
    per-step mean log-likelihoods); weights = [bias, w_1, ..., w_k].

    The second-order companion to the battery's unrolled first-order GD
    (`doc_domain_classifier_gd`): each step aggregates the gradient
    Σ(y−p)x and the Hessian ΣW xxᵀ (W = p(1−p)) in ONE
    map-side-combinable pass — (k+1)(k+4)/2 sums total — and solves the
    (k+1)×(k+1) normal system on the DRIVER (numpy, the bounded-driver-
    action class power-iteration PCA established: model state crossing
    the wire is O(k²), never rows). Newton converges quadratically near
    the optimum, so 3–4 steps reach what dozens of GD steps approach.

    ``ridge`` adds λI to the Hessian — numerical insurance for
    separable data where the MLE diverges. At 100 TB this is the
    full-batch second-order trainer: S scans, no parameter shuffle, no
    Python on the hot path.

    ``agg_dp`` / ``weight_dp`` are the cross-engine parity knobs (the
    `doc_domain_classifier_gd` discipline): when set, every gradient /
    Hessian / log-likelihood aggregate rounds IN-ENGINE to ``agg_dp``
    decimals before the solve, and updated weights round to
    ``weight_dp`` after it — so a SQL oracle aggregating in a different
    partial order and solving the (rounded, hence identical) normal
    system in closed form walks the same weight trajectory. None (the
    default) keeps full precision.
    """
    import numpy as np

    def _r(col, alias):
        return (F.round(col, agg_dp) if agg_dp is not None else col).alias(alias)

    k = len(feature_cols)
    w = [0.0] * (k + 1)
    liks: list[float] = []
    xs = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    for _ in range(steps):
        eta = F.lit(w[0])
        for j in range(1, k + 1):
            eta = eta + F.lit(w[j]) * xs[j]
        p = 1.0 / (1.0 + F.exp(-eta))
        wt = p * (1.0 - p)
        aggs = []
        for j in range(k + 1):
            aggs.append(_r(F.sum((y - p) * xs[j]), f"g{j}"))
        for j in range(k + 1):
            for l in range(j, k + 1):
                aggs.append(_r(F.sum(wt * xs[j] * xs[l]), f"h{j}_{l}"))
        aggs.append(
            _r(
                F.avg(
                    y * F.log(F.greatest(p, F.lit(1e-12)))
                    + (1.0 - y) * F.log(F.greatest(1.0 - p, F.lit(1e-12)))
                ),
                "loglik",
            )
        )
        row = df.agg(*aggs).collect()[0]
        g = np.array([row[f"g{j}"] for j in range(k + 1)])
        H = np.zeros((k + 1, k + 1))
        for j in range(k + 1):
            for l in range(j, k + 1):
                H[j, l] = H[l, j] = row[f"h{j}_{l}"]
        H += ridge * np.eye(k + 1)
        w = list(np.asarray(w) + np.linalg.solve(H, g))
        if weight_dp is not None:
            w = [round(v, weight_dp) for v in w]
        liks.append(float(row["loglik"]))
    return [float(v) for v in w], liks


def quantile_regression_gd(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    tau: float,
    steps: int = 40,
    lr: float = 0.5,
    agg_dp: int | None = None,
    weight_dp: int | None = None,
) -> tuple[list[float], list[float]]:
    """Linear quantile regression by subgradient descent on the pinball
    loss → (weights, per-step mean pinball losses); weights =
    [bias, w_1, ..., w_k]. Fits the conditional τ-quantile line — the
    regression OLS can't give you: τ = 0.5 is median (robust)
    regression, τ = 0.9/0.99 are the SLA/tail-latency curves capacity
    planning runs on.

    Subgradient: ∂ρ_τ/∂w = −mean(x · (τ − 1[y < w·x])) — one
    map-side-combinable (k+2)-sum pass per step, weights on the driver
    (the `logistic_irls` discipline). The pinball loss is piecewise
    linear, so plain GD with a modest fixed step converges to a
    neighborhood of the optimum; pass more ``steps``/smaller ``lr`` to
    tighten. Deterministic given deterministic input.

    ``agg_dp`` / ``weight_dp``: cross-engine parity knobs — round each
    step's subgradient/loss aggregates in-engine and the updated weights
    driver-side, so a SQL oracle walks the identical trajectory (same
    discipline as ``logistic_irls``). None keeps full precision.
    """
    k = len(feature_cols)
    w = [0.0] * (k + 1)
    losses: list[float] = []
    xs = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")

    def _r(col, alias):
        return (F.round(col, agg_dp) if agg_dp is not None else col).alias(alias)

    for _ in range(steps):
        pred = F.lit(w[0])
        for j in range(1, k + 1):
            pred = pred + F.lit(w[j]) * xs[j]
        below = F.when(y < pred, 1.0).otherwise(0.0)
        resid = y - pred
        aggs = [
            _r(F.avg(xs[j] * (F.lit(tau) - below)), f"g{j}")
            for j in range(k + 1)
        ]
        aggs.append(
            _r(
                F.avg(
                    F.when(resid >= 0, F.lit(tau) * resid).otherwise(
                        F.lit(tau - 1.0) * resid
                    )
                ),
                "pinball",
            )
        )
        row = df.agg(*aggs).collect()[0]
        w = [w[j] + lr * row[f"g{j}"] for j in range(k + 1)]
        if weight_dp is not None:
            w = [round(v, weight_dp) for v in w]
        losses.append(float(row["pinball"]))
    return [float(v) for v in w], losses


def benford_second_digit_fit(
    amounts: DataFrame, amount_col: str, freq_dp: int = 6, chi2_dp: int = 4
) -> DataFrame:
    """Second-digit Benford screen — the forensic follow-up to
    `benford_digit_fit`: fabricators who know the first-digit law
    rarely match the SECOND-digit distribution
    P(d₂ = d) = Σ_{d₁=1..9} log10(1 + 1/(10·d₁ + d)), d ∈ 0..9.
    Same parity discipline: digits from integer cents (never double
    formatting); domain = cents ≥ 10 so a second digit exists. One
    scan, a ≤10-row aggregate, one 1-row total broadcast."""
    import math

    x = F.col(amount_col)
    cents = F.floor(x * 100).cast("bigint")
    d = amounts.where(cents >= 10).select(
        F.substring(cents.cast("string"), 2, 1).alias("digit_s")
    )
    obs = d.groupBy("digit_s").agg(F.count("*").alias("n_obs"))
    totals = d.agg(F.count("*").cast("double").alias("total"))
    exp_map = {
        dd: sum(math.log10(1.0 + 1.0 / (10 * d1 + dd)) for d1 in range(1, 10))
        for dd in range(10)
    }
    expr = F.lit(None).cast("double")
    for dd, p in exp_map.items():
        expr = F.when(F.col("digit") == dd, F.lit(p)).otherwise(expr)
    return (
        obs.select(F.col("digit_s").cast("int").alias("digit"), "n_obs")
        .crossJoin(F.broadcast(totals))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs") / F.col("total"), freq_dp).alias(
                "obs_freq"
            ),
            F.round(expr, freq_dp).alias("exp_freq"),
            F.round(
                F.pow(F.col("n_obs") - F.col("total") * expr, 2)
                / (F.col("total") * expr),
                chi2_dp,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


def calibration_report(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Probability-calibration report → (bin, n, mean_pred, frac_pos,
    gap, brier_term): equal-width score bins with predicted-vs-observed
    positive rates — the reliability diagram as a relation — plus each
    bin's contribution to the Brier score. A well-calibrated scorer has
    |gap| ≈ 0 everywhere; a sharp-but-overconfident one (the classifier
    failure mode thresholds inherit) shows monotone gaps at the
    extremes. ECE = Σ (n/N)·|gap| and Brier = Σ brier_term·n/N are
    one-liner rollups of this output.

    One scan, an n_bins-row aggregate; scores clamp into [0, 1] and the
    top edge closes (score = 1.0 lands in the last bin)."""
    s = F.least(F.greatest(F.col(score_col), F.lit(0.0)), F.lit(1.0))
    y = F.col(label_col).cast("double")
    b = F.least(
        F.floor(s * n_bins).cast("int"), F.lit(n_bins - 1)
    ).alias("bin")
    return (
        scored.select(b, s.alias("s"), y.alias("y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("s"), 6).alias("mean_pred"),
            F.round(F.avg("y"), 6).alias("frac_pos"),
            F.round(F.avg("s") - F.avg("y"), 6).alias("gap"),
            F.round(F.avg(F.pow(F.col("s") - F.col("y"), 2)), 6).alias(
                "brier_term"
            ),
        )
        .orderBy("bin")
    )


def mixture_reweight_multiplicative(
    domain_losses: Sequence[tuple[str, float, float]],
    eta: float = 1.0,
    steps: int = 1,
    reference: Sequence[tuple[str, float]] | None = None,
) -> list[tuple[str, float]]:
    """DoReMi-style domain reweighting (Xie et al. 2023, simplified to
    the static-loss case) → [(domain, weight)]: starting from reference
    shares (uniform if None), apply ``steps`` multiplicative-weights
    updates w_d ∝ w_d · exp(η · excess_d) where excess_d = loss_d −
    baseline_d, then renormalize — domains where the proxy model is
    WORSE than baseline gain training share. With static losses the
    iteration collapses to softmax-tilting (documented); the step loop
    exists so a caller re-estimating losses per step (the real DoReMi
    inner loop) can drive it.

    Driver-side pure function by design: the inputs are |domains| rows
    — the per-domain losses come from corpus-scale jobs (e.g.
    `operators.lm.bigram_lm_scores` aggregated per domain), but the
    reweighting itself is O(|domains|) arithmetic that has no business
    on the cluster."""
    import math

    names = [d for d, _, _ in domain_losses]
    excess = {d: ls - bl for d, ls, bl in domain_losses}
    if reference is None:
        w = {d: 1.0 / len(names) for d in names}
    else:
        ref = dict(reference)
        tot = sum(ref[d] for d in names)
        w = {d: ref[d] / tot for d in names}
    for _ in range(steps):
        w = {d: w[d] * math.exp(eta * excess[d]) for d in names}
        z = sum(w.values())
        w = {d: v / z for d, v in w.items()}
    return [(d, w[d]) for d in names]

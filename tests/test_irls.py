"""IRLS logistic regression: recovers a known generating model from a
deterministic hash-Bernoulli draw, log-likelihood climbs monotonically,
and 3 Newton steps beat 6 first-order GD steps on the same data."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.corpus_prep import unit_hash
from flight_radar_pipeline_spark.operators.mining import logistic_irls


def _data(spark, n=5000, b0=0.5, b1=2.0, b2=-1.0):
    """y ~ Bernoulli(sigma(b0 + b1 z1 + b2 z2)) with md5-derived z and
    the Bernoulli draw itself a unit-hash threshold — fully
    deterministic, no rand()."""
    df = spark.range(n).select(
        (unit_hash(F.col("id"), "z1") * 4 - 2).alias("z1"),
        (unit_hash(F.col("id"), "z2") * 4 - 2).alias("z2"),
        unit_hash(F.col("id"), "draw").alias("u"),
    )
    eta = b0 + b1 * F.col("z1") + b2 * F.col("z2")
    return df.select(
        "z1", "z2",
        (F.col("u") < 1.0 / (1.0 + F.exp(-eta))).cast("int").alias("y"),
    )


def test_irls_recovers_model_and_likelihood_climbs(spark):
    df = _data(spark).localCheckpoint(eager=True)
    w, liks = logistic_irls(df, ["z1", "z2"], "y", steps=5)
    assert all(b >= a - 1e-9 for a, b in zip(liks, liks[1:])), liks
    assert abs(w[0] - 0.5) < 0.25
    assert abs(w[1] - 2.0) < 0.35
    assert abs(w[2] + 1.0) < 0.3


def test_newton_beats_first_order_gd(spark):
    df = _data(spark, n=3000).localCheckpoint(eager=True)
    _, liks = logistic_irls(df, ["z1", "z2"], "y", steps=3)

    # 6 plain GD steps (eta=1.0, mean gradient), the battery's recipe
    w = [0.0, 0.0, 0.0]
    for _ in range(6):
        p = 1.0 / (
            1.0
            + F.exp(-(w[0] + w[1] * F.col("z1") + w[2] * F.col("z2")))
        )
        r = df.agg(
            F.avg(F.col("y") - p).alias("g0"),
            F.avg((F.col("y") - p) * F.col("z1")).alias("g1"),
            F.avg((F.col("y") - p) * F.col("z2")).alias("g2"),
        ).collect()[0]
        w = [w[0] + r.g0, w[1] + r.g1, w[2] + r.g2]
    p = 1.0 / (
        1.0 + F.exp(-(w[0] + w[1] * F.col("z1") + w[2] * F.col("z2")))
    )
    gd_lik = df.agg(
        F.avg(
            F.col("y") * F.log(F.greatest(p, F.lit(1e-12)))
            + (1 - F.col("y")) * F.log(F.greatest(1 - p, F.lit(1e-12)))
        )
    ).collect()[0][0]
    assert liks[-1] > gd_lik + 1e-4, (liks, gd_lik)


def test_quantile_regression_orders_and_converges(spark):
    """y = 10 + 4 z + heteroscedastic noise: the τ=0.1/0.5/0.9 lines
    must be ordered, the median line must track the generating line,
    and the pinball loss must not increase over the run's tail."""
    from flight_radar_pipeline_spark.operators.mining import (
        quantile_regression_gd,
    )

    n = 4000
    df = (
        spark.range(n)
        .select(
            (unit_hash(F.col("id"), "qx") * 4 - 2).alias("z"),
            (unit_hash(F.col("id"), "qe") * 2 - 1).alias("e"),
        )
        .select("z", (10.0 + 4.0 * F.col("z") + 3.0 * F.col("e")).alias("y"))
        .localCheckpoint(eager=True)
    )
    fits = {}
    for tau in (0.1, 0.5, 0.9):
        # 100 steps (was 200): the assertions are unchanged and all pass
        # with margin at 100 — the test got stricter per step, not
        # weaker — while halving the 3×steps sequential aggregate jobs
        # that made this the suite's slowest test (99 s, round-14
        # durations profile; the driver's verify budget is the gate)
        w, losses = quantile_regression_gd(
            df, ["z"], "y", tau=tau, steps=100, lr=1.0
        )
        fits[tau] = w
        assert min(losses[-5:]) <= min(losses[:5])
    # evaluate the three lines at z = -1, 0, 1: quantile ordering holds
    for z in (-1.0, 0.0, 1.0):
        v = {t: fits[t][0] + fits[t][1] * z for t in fits}
        assert v[0.1] < v[0.5] < v[0.9], v
    # median line ≈ the generating line (noise is symmetric)
    assert abs(fits[0.5][0] - 10.0) < 0.8
    assert abs(fits[0.5][1] - 4.0) < 0.8
    # uniform(-3,3) noise: q10/q90 offsets ≈ ∓2.4 from the median line
    assert -3.4 < fits[0.1][0] - fits[0.5][0] < -1.4
    assert 1.4 < fits[0.9][0] - fits[0.5][0] < 3.4


def test_calibration_perfect_scorer_has_small_gaps(spark):
    """Labels drawn AT the score via unit-hash → a perfectly calibrated
    scorer: every bin's |gap| must be small and Brier ≈ E[p(1−p)]."""
    from flight_radar_pipeline_spark.operators.mining import (
        calibration_report,
    )

    df = spark.range(20000).select(
        unit_hash(F.col("id"), "p").alias("p"),
        (unit_hash(F.col("id"), "y") < unit_hash(F.col("id"), "p"))
        .cast("int")
        .alias("y"),
    )
    rows = calibration_report(df, "p", "y").collect()
    assert len(rows) == 10
    n_tot = sum(r.n for r in rows)
    ece = sum(r.n * abs(r.gap) for r in rows) / n_tot
    assert ece < 0.02, ece
    brier = sum(r.n * r.brier_term for r in rows) / n_tot
    # E[p(1-p)] for p~U(0,1) = 1/6
    assert abs(brier - 1 / 6) < 0.01


def test_calibration_flags_overconfident_scorer(spark):
    """Scores pushed toward the extremes (s = p² / odd transform) while
    labels stay Bernoulli(p): the low bins must over-predict negatives
    (gap < 0) and high bins over-predict positives (gap > 0)... i.e.
    the overconfidence signature |gap| large at the extremes."""
    from flight_radar_pipeline_spark.operators.mining import (
        calibration_report,
    )

    df = spark.range(20000).select(
        unit_hash(F.col("id"), "p").alias("p"),
        (unit_hash(F.col("id"), "y") < unit_hash(F.col("id"), "p"))
        .cast("int")
        .alias("y"),
    )
    # overconfident transform: s = 3p² − 2p³ is steeper at the ends? no:
    # use s = 0.5 + (p − 0.5)^(1/3)-style sharpening via s = p*p*(3-2p)
    sharp = df.select(
        (F.col("p") * F.col("p") * (3 - 2 * F.col("p"))).alias("s"), "y"
    )
    rows = {r.bin: r for r in calibration_report(sharp, "s", "y").collect()}
    assert rows[0].gap < -0.01   # predicted ~0.03, observed higher
    assert rows[9].gap > 0.01    # predicted ~0.97, observed lower


def test_mixture_reweight_directions_and_softmax_identity():
    import math

    from flight_radar_pipeline_spark.operators.mining import (
        mixture_reweight_multiplicative,
    )

    losses = [("web", 3.0, 2.5), ("code", 2.0, 2.2), ("wiki", 2.4, 2.4)]
    out = dict(mixture_reweight_multiplicative(losses, eta=1.0, steps=1))
    assert abs(sum(out.values()) - 1.0) < 1e-12
    # web has positive excess → gains; code negative → shrinks; wiki flat
    assert out["web"] > 1 / 3 > out["code"]
    # static-loss collapse: steps=T ≡ softmax(T·eta·excess) from uniform
    out3 = dict(mixture_reweight_multiplicative(losses, eta=1.0, steps=3))
    z = sum(math.exp(3.0 * (ls - bl)) for _, ls, bl in losses)
    for d, ls, bl in losses:
        assert abs(out3[d] - math.exp(3.0 * (ls - bl)) / z) < 1e-12

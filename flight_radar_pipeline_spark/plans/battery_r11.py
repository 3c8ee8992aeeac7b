"""Round-11 battery additions — two decision-layer families the registry
genuinely lacks (pre-registration sweep per the standing dedup-honesty
rule: `grep @register` names + family keywords):

- Bradley–Terry preference ranking (MM algorithm, Hunter 2004): latent
  strength scores from PAIRWISE WINS — the preference-modeling
  primitive behind RLHF reward models and paired human evals. Distinct
  from every existing ranking surface: PageRank/HITS rank by graph
  structure, `daily_type_rank_shift` by raw counts, the trainers fit
  pointwise losses; nothing fits a paired-comparison model.
- Off-policy replay evaluation (Li et al. 2011's replay method): what
  WOULD the greedy policy have earned — evaluated only on logged
  events where the logged action equals the policy's action. The
  counterfactual-evaluation family; the A/B entries (t-test, CUPED,
  SPRT, MDE) all evaluate RANDOMIZED exposure, not a learned policy
  against logs. (A separate IPS entry was drafted and DROPPED: with
  empirical propensities estimated from the same logs, per-context IPS
  algebraically reduces to the replay mean — it would be the same
  number twice.)

Candidates DROPPED by the sweep before registration: sample-ratio
mismatch (a chi-square on arm counts — `order_priority_chisq` owns the
family), Mann–Kendall trend (the `event_value_theil_sen` /
`event_value_spearman` rank-association family), Kaplan–Meier
(`order_gap_survival` owns censored survival), and Elo (the sequential
face of Bradley–Terry — one paired-comparison model is the family).

Registered into the shared REGISTRY on import.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.plans.battery import (
    register,
    register_grid_plans,
)
from flight_radar_pipeline_spark.sources.readers import load_table


def _r6(x: float) -> float:
    """Half-up rounding of the double's shortest decimal repr — F.round
    / DuckDB round semantics, the markov-stationary driver precedent."""
    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-6), rounding=ROUND_HALF_UP)
    )


# --------------------------------------------------------------------------
# Bradley–Terry preference ranking over event types
# --------------------------------------------------------------------------

_BT_ITERS = 3


def _bt_iter_cte(i: int) -> str:
    prev = f"p{i - 1}"
    return f"""p{i} as (
        select s.i as t,
               greatest(round(sum(s.w) / sum(s.n / (pa.pi + pb.pi)), 6),
                        0.000001) as pi
        from sym s
        join {prev} pa on pa.t = s.i
        join {prev} pb on pb.t = s.j
        group by s.i
    )"""


def _bt_oracle() -> str:
    ctes = ", ".join(_bt_iter_cte(i) for i in range(1, _BT_ITERS + 1))
    return f"""
    with c as (
        select user_id, cast(ts as date) as day, event_type, count(*) as n
        from events group by 1, 2, 3
    ), duel as (
        select a.event_type as ta, b.event_type as tb,
               case when a.n > b.n then 1 else 0 end as wa,
               case when b.n > a.n then 1 else 0 end as wb
        from c a join c b
          on a.user_id = b.user_id and a.day = b.day
         and a.event_type < b.event_type
    ), g as (
        select ta, tb, sum(wa)::bigint as w_ab, sum(wb)::bigint as w_ba,
               sum(wa + wb)::bigint as n_dec
        from duel group by 1, 2
        having sum(wa + wb) > 0
    ), sym as (
        select ta as i, tb as j, w_ab as w, n_dec as n from g
        union all
        select tb as i, ta as j, w_ba as w, n_dec as n from g
    ), p0 as (
        select distinct i as t, 1.0 as pi from sym
    ), {ctes}, tot as (
        select i as t, sum(w)::bigint as wins, sum(n)::bigint as games
        from sym group by i
    )
    select tot.t as event_type, tot.wins, tot.games,
           p{_BT_ITERS}.pi as pi,
           round(p{_BT_ITERS}.pi / (sum(p{_BT_ITERS}.pi) over ()), 6)
               as score,
           cast(row_number() over (order by p{_BT_ITERS}.pi desc, tot.t)
                as bigint) as rank
    from tot join p{_BT_ITERS} using (t)
    order by rank
"""


def _bt_duel_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE fact-side subplan of `event_type_bradley_terry`: user-day
    type counts → within-(user, day) duel join → the ≤|types|² decided
    ordered-pair grid the driver-side MM loop consumes."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    a = c.select("user_id", "day", F.col("event_type").alias("ta"),
                 F.col("n").alias("na"))
    b = c.select("user_id", "day", F.col("event_type").alias("tb"),
                 F.col("n").alias("nb"))
    duel = a.join(b, ["user_id", "day"]).filter(F.col("ta") < F.col("tb"))
    return (
        duel.groupBy("ta", "tb")
        .agg(
            F.sum(F.when(F.col("na") > F.col("nb"), 1).otherwise(0))
            .cast("bigint")
            .alias("w_ab"),
            F.sum(F.when(F.col("nb") > F.col("na"), 1).otherwise(0))
            .cast("bigint")
            .alias("w_ba"),
        )
        .withColumn("n_dec", F.col("w_ab") + F.col("w_ba"))
        .filter(F.col("n_dec") > 0)
    )


@register_grid_plans("event_type_bradley_terry")
def _bt_grid_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {"duel_grid": _bt_duel_grid(spark, sf_dir)}


@register("event_type_bradley_terry", _bt_oracle())
def event_type_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley–Terry strengths over event types from user-day duels →
    (event_type, wins, games, pi, score, rank): each (user, day) where
    two types both occur is one paired comparison, won by the type with
    MORE events that day (exact integer counts; ties are undecided and
    excluded, standard BT). Three minorization–maximization iterations
    (Hunter 2004): πᵢ ← Wᵢ / Σ_j n_ij/(πᵢ+π_j) from π⁰ = 1, each iterate
    rounded to 6dp so the trajectory is engine-pinned (the kmeans /
    markov-stationary rounding contract); `score` is the final L1
    normalization. This is the paired-comparison ranking family — the
    preference-model fit behind RLHF reward modeling — which no
    existing entry covers (PageRank/HITS rank graph structure, the
    trainers fit pointwise losses).

    Scale: one fact scan → (user, day, type) counts; the duel join is
    within-(user, day) only (fan-out ≤ |types|² per user-day, never a
    corpus self-join) and collapses immediately to the ≤|types|²
    ordered-pair grid; the MM loop runs on the driver over that
    bounded grid (O(k²) driver state by house discipline — the
    markov-stationary precedent), with every game count an exact
    bigint."""
    # bounded: ≤ |types|² ordered pairs — the ONE fact-side job;
    # wins/games/pi/score/rank all derive from this grid. The limit
    # sentinel makes an unexpectedly large type universe fail loudly
    # instead of OOMing the driver (round-14, verdict item 7 — same
    # guard class as mmr_rerank's collect_cap; limit+collect runs the
    # same single job, just capped).
    _cap = 65_536  # |types|² at |types| ≤ 256 — parameter-sized by contract
    rows = _bt_duel_grid(spark, sf_dir).limit(_cap + 1).collect()
    if len(rows) > _cap:
        raise ValueError(
            f"event_type_bradley_terry: duel grid exceeds {_cap} rows — "
            "the driver-side MM loop assumes a parameter-sized type set"
        )
    sym: dict[tuple[str, str], tuple[int, int]] = {}
    for r in rows:
        sym[(r.ta, r.tb)] = (r.w_ab, r.n_dec)
        sym[(r.tb, r.ta)] = (r.w_ba, r.n_dec)
    types = sorted({i for i, _ in sym})
    pi = {t: 1.0 for t in types}
    for _ in range(_BT_ITERS):
        nxt = {}
        for t in types:
            wins = sum(w for (i, _j), (w, _n) in sym.items() if i == t)
            denom = sum(
                n / (pi[t] + pi[j])
                for (i, j), (_w, n) in sym.items()
                if i == t
            )
            # floor at 1e-6 (mirrored by `greatest` in the oracle CTE):
            # an iterate that 6dp-rounds to exactly 0.0 — possible at
            # extreme skew, e.g. 1 win over >4M games — would otherwise
            # zero the (pi[t] + pi[j]) denominator next iteration
            nxt[t] = max(_r6(wins / denom), 1e-6)
        pi = nxt
    total = sum(pi.values())
    order = sorted(types, key=lambda t: (-pi[t], t))
    out = [
        (
            t,
            sum(w for (i, _j), (w, _n) in sym.items() if i == t),
            sum(n for (i, _j), (_w, n) in sym.items() if i == t),
            pi[t],
            _r6(pi[t] / total),
            order.index(t) + 1,
        )
        for t in order
    ]
    return spark.createDataFrame(
        out,
        "event_type string, wins bigint, games bigint, pi double,"
        " score double, rank bigint",
    ).orderBy("rank")


# --------------------------------------------------------------------------
# off-policy replay evaluation of the greedy per-hour policy
# --------------------------------------------------------------------------

_REPLAY_ORACLE = """
    with ev as (
        select hour(ts) as hr, event_type, value, cast(ts as date) as day
        from events
    ), span as (
        select min(day) as lo, max(day) as hi from ev
    ), lab as (
        select hr, event_type, value,
               case when date_diff('day', lo, day) * 2
                         < date_diff('day', lo, hi)
                    then 1 else 0 end as is_ref
        from ev, span
    ), grid as (
        select hr, event_type,
               sum(is_ref)::bigint as n_ref,
               sum(case when is_ref = 1 then value end) as s_ref,
               sum(1 - is_ref)::bigint as n_cur,
               sum(case when is_ref = 0 then value end) as s_cur
        from lab group by 1, 2
    ), pol as (
        select hr, event_type as action,
               round(s_ref / n_ref, 6) as ref_mean
        from (
            select *, row_number() over (
                partition by hr
                order by round(s_ref / n_ref, 6) desc, event_type
            ) as rn
            from grid where n_ref > 0
        ) where rn = 1
    ), cur as (
        select hr, sum(n_cur)::bigint as n_logged,
               sum(s_cur) as s_logged
        from grid group by hr
    )
    select pol.hr as hr, pol.action as policy_action, pol.ref_mean,
           cur.n_logged,
           coalesce(g.n_cur, 0)::bigint as n_matched,
           round(coalesce(g.n_cur, 0) / cur.n_logged, 6) as match_rate,
           round(g.s_cur / g.n_cur, 6) as replay_mean,
           round(cur.s_logged / cur.n_logged, 6) as logged_mean,
           round(g.s_cur / g.n_cur - cur.s_logged / cur.n_logged, 6)
               as uplift
    from pol
    join cur using (hr)
    left join grid g on g.hr = pol.hr and g.event_type = pol.action
    order by hr
"""


@register("event_type_policy_replay", _REPLAY_ORACLE)
def event_type_policy_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation by replay (Li et al. 2011): train the
    greedy per-hour-of-day policy on the REFERENCE period (argmax of the
    6dp-rounded mean value per (hour, type), ties to the lexicographic
    first type), then estimate its value on the CURRENT period using
    only logged events whose action matches the policy's — the unbiased
    counterfactual estimator when logging is uniform. → one row per
    hour: (hr, policy_action, ref_mean, n_logged, n_matched, match_rate,
    replay_mean, logged_mean, uplift). The A/B entries evaluate
    randomized exposure; this is the learned-policy-vs-logs family they
    don't cover. (IPS with empirical propensities from the same logs
    reduces per-context to exactly the replay mean, so it is not a
    second entry — see the module docstring.) Same integer-date period
    split as the drift entries.

    Scale: ONE fact scan → the (24 × |types|) conditional-count grid;
    everything after is TWO windows over that bounded grid and zero
    joins — the hour totals (n_logged, s_logged) are an hr-partition
    window sum and the matched stats are the policy argmax row's OWN
    (n_cur, s_cur), so pol/cur/matched never self-join (the round-11
    form referenced the grid three times and recomputed its fact
    subtree under each: 14 exchanges / 3 BNLJ → 5 / 1). Counts are
    exact bigints; value sums are the established 6dp-round contract."""
    ev = load_table(spark, sf_dir, "events").select(
        F.hour("ts").alias("hr"),
        "event_type",
        "value",
        F.to_date("ts").alias("day"),
    )
    span = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    lab = ev.crossJoin(F.broadcast(span)).select(
        "hr",
        "event_type",
        "value",
        F.when(
            F.datediff(F.col("day"), F.col("lo")) * 2
            < F.datediff(F.col("hi"), F.col("lo")),
            1,
        )
        .otherwise(0)
        .alias("is_ref"),
    )
    grid = lab.groupBy("hr", "event_type").agg(
        F.sum("is_ref").cast("bigint").alias("n_ref"),
        F.sum(F.when(F.col("is_ref") == 1, F.col("value"))).alias("s_ref"),
        F.sum(1 - F.col("is_ref")).cast("bigint").alias("n_cur"),
        F.sum(F.when(F.col("is_ref") == 0, F.col("value"))).alias("s_cur"),
    )
    # hour totals as a window sum; the policy argmax row's own
    # (n_cur, s_cur) ARE the matched stats — no pol/cur/matched joins
    w_hr = Window.partitionBy("hr")
    aug = grid.select(
        "hr",
        "event_type",
        "n_ref",
        "s_ref",
        "n_cur",
        "s_cur",
        F.sum("n_cur").over(w_hr).cast("bigint").alias("n_logged"),
        F.sum("s_cur").over(w_hr).alias("s_logged"),
    )
    w_pol = Window.partitionBy("hr").orderBy(
        F.desc(F.round(F.col("s_ref") / F.col("n_ref"), 6)),
        F.asc("event_type"),
    )
    return (
        aug.filter(F.col("n_ref") > 0)
        .withColumn("rn", F.row_number().over(w_pol))
        .filter(F.col("rn") == 1)
        .select(
            "hr",
            F.col("event_type").alias("policy_action"),
            F.round(F.col("s_ref") / F.col("n_ref"), 6).alias("ref_mean"),
            "n_logged",
            F.col("n_cur").cast("bigint").alias("n_matched"),
            F.round(F.col("n_cur") / F.col("n_logged"), 6).alias(
                "match_rate"
            ),
            F.round(F.col("s_cur") / F.col("n_cur"), 6).alias("replay_mean"),
            F.round(F.col("s_logged") / F.col("n_logged"), 6).alias(
                "logged_mean"
            ),
            F.round(
                F.col("s_cur") / F.col("n_cur")
                - F.col("s_logged") / F.col("n_logged"),
                6,
            ).alias("uplift"),
        )
        .orderBy("hr")
    )

"""Round-8b battery additions: the iterative trainers (IRLS logistic,
pinball-loss quantile regression) with unrolled-CTE oracles, geographic
DBSCAN with a naive-join + recursive-CC oracle, end-to-end entity
resolution to golden records, and the real BMP pixel-decode hot loop
with an oracle derived from the generator's closed-form pixel pattern.

Parity discipline for the trainers (the `doc_domain_classifier_gd`
convention): every per-step aggregate rounds IN-ENGINE to 6 decimals,
updated weights round to 8 driver-side / in-CTE, so both engines walk
the identical weight trajectory regardless of partial-aggregation
order. Registered into the shared REGISTRY on import.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.plans.battery import (
    register,
    register_grid_plans,
)
from flight_radar_pipeline_spark.plans.battery_extras import (
    _FS_MU,
    _GEO_LAT,
    _GEO_LON,
    _geo_coord,
    _hav_sql,
)
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# IRLS (Newton–Raphson) logistic regression: P(purchase | z-scored value)
# --------------------------------------------------------------------------

_IRLS_STEPS = 3
_IRLS_RIDGE = 1e-8


def _irls_oracle() -> str:
    """Newton steps unrolled as CTE pairs: one rounded 5-sum
    gradient+Hessian aggregate, then the closed-form 2×2 ridge solve
    (identical arithmetic to the operator's numpy solve after the
    6-decimal aggregate rounding; weights round to 8 per step)."""
    parts = ["""
    with feat as (
        select case when event_type = 'purchase' then 1.0 else 0.0 end as y,
               value as v
        from events
    ), st as (
        select avg(v) as m, stddev_pop(v) as s from feat
    ), z as materialized (
        select y, round((v - m) / s, 6) as z from feat, st
    ), ws0 as (
        select 0.0 as a, 0.0 as b
    )"""]
    r = _IRLS_RIDGE
    for t in range(1, _IRLS_STEPS + 1):
        parts.append(f""", g{t} as materialized (
        select round(sum(y - p), 6) as g0,
               round(sum((y - p) * z), 6) as g1v,
               round(sum(p * (1 - p)), 6) as h00,
               round(sum(p * (1 - p) * z), 6) as h01,
               round(sum(p * (1 - p) * z * z), 6) as h11
        from (
            select y, z, 1 / (1 + exp(-(a + b * z))) as p
            from z, ws{t - 1}
        )
    ), ws{t} as materialized (
        select round(a + ((h11 + {r!r}) * g0 - h01 * g1v)
                     / ((h00 + {r!r}) * (h11 + {r!r}) - h01 * h01), 8) as a,
               round(b + ((h00 + {r!r}) * g1v - h01 * g0)
                     / ((h00 + {r!r}) * (h11 + {r!r}) - h01 * h01), 8) as b
        from ws{t - 1}, g{t}
    )""")
    parts.append(f"""
    select (select cast(count(*) as bigint) from z) as n_events,
           (select a from ws{_IRLS_STEPS}) as w_bias,
           (select b from ws{_IRLS_STEPS}) as w_value,
           (select round(avg(y * ln(greatest(p, 1e-12))
                             + (1 - y) * ln(greatest(1 - p, 1e-12))), 6)
            from (select y, 1 / (1 + exp(-(a + b * z))) as p
                  from z, ws{_IRLS_STEPS})) as train_loglik
    """)
    return "".join(parts)


@register("event_value_irls_logistic", _irls_oracle())
def event_value_irls_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order logistic regression (``operators.mining.
    logistic_irls``): P(event is a purchase | z-scored value), {steps}
    Newton–Raphson steps — each ONE map-side-combinable 5-sum
    gradient+Hessian aggregate over the checkpointed feature relation,
    with the 2×2 ridge-stabilized normal system solved on the driver
    (O(k²) state crossing the wire, never rows). The companion to the
    first-order `doc_domain_classifier_gd`: Newton reaches in {steps}
    steps what dozens of GD steps approach. Oracle unrolls the same
    steps as CTE pairs with the closed-form 2×2 solve; the 6-decimal
    in-engine aggregate rounding + 8-decimal weight rounding make the
    trajectories engine-identical. Output re-scores the corpus once at
    the final weights for the training log-likelihood."""
    from flight_radar_pipeline_spark.operators.mining import logistic_irls

    ev = load_table(spark, sf_dir, "events")
    feat = ev.select(
        F.when(F.col("event_type") == "purchase", 1.0)
        .otherwise(0.0)
        .alias("y"),
        F.col("value").alias("v"),
    )
    st = feat.agg(
        F.avg("v").alias("m"), F.stddev_pop("v").alias("s")
    )
    z = (
        feat.crossJoin(F.broadcast(st))
        .select(
            "y", F.round((F.col("v") - F.col("m")) / F.col("s"), 6).alias("z")
        )
        .coalesce(8)
        .localCheckpoint(eager=True)
    )
    w, _liks = logistic_irls(
        z, ["z"], "y", steps=_IRLS_STEPS, ridge=_IRLS_RIDGE,
        agg_dp=6, weight_dp=8,
    )
    p = 1 / (1 + F.exp(-(F.lit(w[0]) + F.lit(w[1]) * F.col("z"))))
    return z.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.lit(w[0]).alias("w_bias"),
        F.lit(w[1]).alias("w_value"),
        F.round(
            F.avg(
                F.col("y") * F.log(F.greatest(p, F.lit(1e-12)))
                + (1 - F.col("y")) * F.log(F.greatest(1 - p, F.lit(1e-12)))
            ),
            6,
        ).alias("train_loglik"),
    )


event_value_irls_logistic.__doc__ = event_value_irls_logistic.__doc__.format(
    steps=_IRLS_STEPS
)


# --------------------------------------------------------------------------
# pinball-loss quantile regression: p90 of log-value vs hour of day
# --------------------------------------------------------------------------

_QR_TAU = 0.9
_QR_STEPS = 12
_QR_LR = 1.0


def _qr_oracle() -> str:
    tau = _QR_TAU
    parts = ["""
    with feat as (
        select round(ln(1 + value), 6) as lv,
               cast(hour(ts) as double) as hr
        from events
    ), st as (
        select avg(hr) as m, stddev_pop(hr) as s from feat
    ), z as materialized (
        select lv, round((hr - m) / s, 6) as z from feat, st
    ), ws0 as (
        select 0.0 as a, 0.0 as b
    )"""]
    for t in range(1, _QR_STEPS + 1):
        parts.append(f""", g{t} as materialized (
        select round(avg({tau!r} - below), 6) as g0,
               round(avg(z * ({tau!r} - below)), 6) as g1v
        from (
            select z, case when lv < a + b * z then 1.0 else 0.0 end as below
            from z, ws{t - 1}
        )
    ), ws{t} as materialized (
        select round(a + {_QR_LR!r} * g0, 8) as a,
               round(b + {_QR_LR!r} * g1v, 8) as b
        from ws{t - 1}, g{t}
    )""")
    parts.append(f"""
    select (select cast(count(*) as bigint) from z) as n_events,
           (select a from ws{_QR_STEPS}) as w_bias,
           (select b from ws{_QR_STEPS}) as w_hour,
           (select round(avg(case when lv - (a + b * z) >= 0
                                  then {tau!r} * (lv - (a + b * z))
                                  else {tau - 1.0!r} * (lv - (a + b * z))
                             end), 6)
            from z, ws{_QR_STEPS}) as pinball
    """)
    return "".join(parts)


@register("event_hour_pinball_p90", _qr_oracle())
def event_hour_pinball_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quantile regression (``operators.mining.
    quantile_regression_gd``): the conditional p{tau} line of
    ln(1+value) against the z-scored hour of day — the SLA/tail-latency
    curve OLS can't give you — fit by {steps} subgradient steps on the
    pinball loss (one map-side-combinable 2-avg pass per step, weights
    on the driver). Oracle unrolls the identical steps as CTE pairs;
    6-decimal aggregate + 8-decimal weight rounding pin the shared
    trajectory. Output re-scores once at the final weights for the
    training pinball loss."""
    from flight_radar_pipeline_spark.operators.mining import (
        quantile_regression_gd,
    )

    ev = load_table(spark, sf_dir, "events")
    feat = ev.select(
        F.round(F.log(1 + F.col("value")), 6).alias("lv"),
        F.hour("ts").cast("double").alias("hr"),
    )
    st = feat.agg(F.avg("hr").alias("m"), F.stddev_pop("hr").alias("s"))
    z = (
        feat.crossJoin(F.broadcast(st))
        .select(
            "lv",
            F.round((F.col("hr") - F.col("m")) / F.col("s"), 6).alias("z"),
        )
        .coalesce(8)
        .localCheckpoint(eager=True)
    )
    w, _losses = quantile_regression_gd(
        z, ["z"], "lv", tau=_QR_TAU, steps=_QR_STEPS, lr=_QR_LR,
        agg_dp=6, weight_dp=8,
    )
    resid = F.col("lv") - (F.lit(w[0]) + F.lit(w[1]) * F.col("z"))
    return z.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.lit(w[0]).alias("w_bias"),
        F.lit(w[1]).alias("w_hour"),
        F.round(
            F.avg(
                F.when(resid >= 0, F.lit(_QR_TAU) * resid).otherwise(
                    F.lit(_QR_TAU - 1.0) * resid
                )
            ),
            6,
        ).alias("pinball"),
    )


event_hour_pinball_p90.__doc__ = event_hour_pinball_p90.__doc__.format(
    tau=int(_QR_TAU * 100), steps=_QR_STEPS
)


# --------------------------------------------------------------------------
# geographic DBSCAN over the md5-coordinate customer points
# --------------------------------------------------------------------------

_DB_EPS_KM = 120.0

_DBSCAN_ORACLE = f"""
    with recursive p as (
        select c_custkey as id, {_GEO_LAT} as lat, {_GEO_LON} as lon
        from customer
    ), pr as (
        select a.id as ia, b.id as ib
        from p a join p b on a.id < b.id
        where {_hav_sql("a.lat", "a.lon", "b.lat", "b.lon")} <= {_DB_EPS_KM}
    ), k as (
        select greatest(
            3,
            cast(ceil(2.0 * (select count(*) from pr)
                      / (select count(*) from p)) as int) + 1
        ) as mp
    ), sym as (
        select ia as u, ib as v from pr
        union all
        select ib as u, ia as v from pr
    ), deg as (
        select u, count(*) + 1 as nin from sym group by u
    ), core as (
        select u from deg, k where nin >= mp
    ), ce as (
        select ia as u, ib as v from pr
        where ia in (select u from core) and ib in (select u from core)
    ), und as (
        select u, v from ce
        union
        select v, u from ce
    ), reach(u, v) as (
        select u, u from und
        union
        select r.u, e.v from reach r join und e on r.v = e.u
    ), cc as (
        select u, min(v) as cid from reach group by u
    ), corelab as (
        select core.u as id, coalesce(cc.cid, core.u) as cluster_id,
               'core' as role
        from core left join cc on cc.u = core.u
    ), border as (
        select s.u as id, min(cl.cluster_id) as cluster_id,
               'border' as role
        from sym s join corelab cl on cl.id = s.v
        where s.u not in (select id from corelab)
        group by s.u
    ), lab as (
        select * from corelab union all select * from border
    )
    select p.id as id, lab.cluster_id as cluster_id,
           coalesce(lab.role, 'noise') as role
    from p left join lab on lab.id = p.id
    order by p.id
"""


def _dbscan_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        _geo_coord("c_custkey", "lat", 900, 45.0).alias("lat"),
        _geo_coord("c_custkey", "lon", 600, 30.0).alias("lon"),
    )


@register_grid_plans("customer_geo_dbscan")
def _dbscan_grid_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The grid-bucketed pair join `customer_geo_dbscan` checkpoints at
    build time (it feeds both the min_pts sizing count and the
    clustering) — the fact-side subplan hidden from the final plan.
    `core_labels` restates the degree-filter → core-CC → core-label
    chain the operator materializes behind its round-13 eager
    localCheckpoint (blind-spot discipline; min_pts pinned to the
    sf-independent floor — the sizing rule only raises it, and the
    subplan SHAPE is what the audit bans run against)."""
    from flight_radar_pipeline_spark.operators.spatial import (
        dbscan_core_labels,
        geo_cell_pairs,
    )

    pts = _dbscan_points(spark, sf_dir)
    pairs = geo_cell_pairs(
        pts, "id", "lat", "lon",
        radius_km=_DB_EPS_KM, cell_deg=2.0, max_abs_lat=45.0,
    )
    p = pairs.select("id_a", "id_b")
    sym = p.union(
        p.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    ids = pts.select(F.col("id")).distinct()
    return {
        "cell_pairs": pairs,
        "core_labels": dbscan_core_labels(p, sym, ids, min_pts=3),
    }


@register("customer_geo_dbscan", _DBSCAN_ORACLE)
def customer_geo_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the md5-coordinate customer points (``operators.
    spatial.geo_dbscan_clusters``): {eps} km eps via the bucketed grid
    self-join (never all-pairs), core points by neighbor count,
    clusters = connected components of the core–core graph,
    deterministic min-cluster-id border attachment, noise NULL.
    min_pts SELF-SIZES from the measured mean pair degree
    (max(3, ⌈2·|pairs|/|points|⌉+1), integer arithmetic mirrored in the
    oracle CTE) so the core criterion keeps biting as density grows
    with scale — the sizing-rule discipline. Oracle: naive radius join
    + recursive-CTE transitive closure. The sizing count is one extra
    grid-join pass (the `semantic-dedup k` trade, measured there)."""
    from flight_radar_pipeline_spark.operators.spatial import (
        geo_cell_pairs,
        geo_dbscan_clusters,
    )

    pts = _dbscan_points(spark, sf_dir)
    n = pts.count()
    # one grid join serves BOTH the min_pts sizing count and the
    # clustering itself (checkpointed; the count materializes it)
    pairs = geo_cell_pairs(
        pts, "id", "lat", "lon",
        radius_km=_DB_EPS_KM, cell_deg=2.0, max_abs_lat=45.0,
    ).localCheckpoint(eager=True)
    npairs = pairs.count()
    mp = max(3, math.ceil(2.0 * npairs / n) + 1)
    out = geo_dbscan_clusters(
        pts, "id", "lat", "lon",
        eps_km=_DB_EPS_KM, min_pts=mp, cell_deg=2.0, max_abs_lat=45.0,
        pairs=pairs,
    )
    return out.orderBy("id")


customer_geo_dbscan.__doc__ = customer_geo_dbscan.__doc__.format(
    eps=int(_DB_EPS_KM)
)


# --------------------------------------------------------------------------
# end-to-end entity resolution → golden records
# --------------------------------------------------------------------------

_ER_THRESHOLD = 5.0  # any two field agreements clear it; one never does


def _fs_w(field: str) -> tuple[float, float]:
    m, u = _FS_MU[field]
    return (
        math.log(m / u) / math.log(2.0),
        math.log((1 - m) / (1 - u)) / math.log(2.0),
    )


def _er_oracle() -> str:
    wt, wtd = _fs_w("p_type")
    wn, wnd = _fs_w("p_name")
    wp, wpd = _fs_w("p_retailprice")
    return f"""
    with recursive b as (
        select p_partkey, p_brand, p_size, p_type, p_name, p_retailprice
        from part
    ), pairs as (
        select a.p_partkey as ia, c.p_partkey as ib,
               (case when coalesce(a.p_type = c.p_type, false)
                     then {wt!r} else {wtd!r} end)
             + (case when coalesce(split_part(a.p_name, ' ', 1)
                                   = split_part(c.p_name, ' ', 1), false)
                     then {wn!r} else {wnd!r} end)
             + (case when coalesce(abs(a.p_retailprice - c.p_retailprice)
                                   <= 10.0, false)
                     then {wp!r} else {wpd!r} end) as weight
        from b a join b c
          on a.p_brand = c.p_brand and a.p_size = c.p_size
         and a.p_partkey < c.p_partkey
    ), m as (
        select ia, ib from pairs where weight >= {_ER_THRESHOLD!r}
    ), und as (
        select ia as u, ib as v from m
        union
        select ib as u, ia as v from m
    ), reach(u, v) as (
        select u, u from und
        union
        select r.u, e.v from reach r join und e on r.v = e.u
    ), cc as (
        select u, min(v) as cid from reach group by u
    ), lab as (
        select b.*, coalesce(cc.cid, b.p_partkey) as ent
        from b left join cc on cc.u = b.p_partkey
    ), base as (
        select ent as entity_id,
               cast(count(*) as bigint) as n_members,
               string_agg(cast(p_partkey as varchar), ','
                          order by p_partkey) as member_ids,
               max(p_retailprice) as p_retailprice
        from lab group by ent
    ), nm as (
        select ent as entity_id, p_name from (
            select ent, p_name,
                   row_number() over (partition by ent
                       order by length(p_name) desc, p_name desc) as rr
            from lab
        ) where rr = 1
    ), tf as (
        select ent as entity_id, p_type from (
            select ent, p_type, count(*) as n,
                   row_number() over (partition by ent
                       order by count(*) desc, p_type desc) as rr
            from lab group by ent, p_type
        ) where rr = 1
    )
    select base.entity_id, n_members, member_ids,
           nm.p_name, base.p_retailprice, tf.p_type
    from base join nm using (entity_id) join tf using (entity_id)
    order by entity_id
    """


@register("part_golden_records", _er_oracle())
def part_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution (``operators.linkage.
    resolve_entities``): (brand, size)-blocked Fellegi–Sunter scoring
    with the `part_fs_match_weights` priors, match threshold
    {thr} (any two field agreements clear it), TRANSITIVE closure over
    match pairs (A–B, B–C ⇒ one entity even though A–C was never
    compared — the property pairwise thresholds alone get wrong),
    then survivorship: longest name, max price, modal type, each a
    deterministic aggregate. Output = one golden record per entity.
    Oracle: the FS pair SQL + recursive-CTE closure + window-ranked
    survivorship. Scale: Σ|block|² scoring, node-sized CC, one grouped
    aggregate — nothing quadratic beyond the blocks."""
    from flight_radar_pipeline_spark.operators.linkage import (
        resolve_entities,
    )

    part = load_table(spark, sf_dir, "part")
    golden = resolve_entities(
        part,
        "p_partkey",
        ["p_brand", "p_size"],
        _FS_MU,
        threshold=_ER_THRESHOLD,
        survivorship={
            "p_name": "longest",
            "p_retailprice": "max",
            "p_type": "most_frequent",
        },
        agree_fns={
            "p_name": lambda a, b: F.split_part(a, F.lit(" "), F.lit(1))
            == F.split_part(b, F.lit(" "), F.lit(1)),
            "p_retailprice": lambda a, b: F.abs(a - b) <= F.lit(10.0),
        },
    )
    return golden.select(
        "entity_id",
        "n_members",
        F.array_join(
            F.transform("member_ids", lambda x: x.cast("string")), ","
        ).alias("member_ids"),
        "p_name",
        "p_retailprice",
        "p_type",
    ).orderBy("entity_id")


part_golden_records.__doc__ = part_golden_records.__doc__.format(
    thr=_ER_THRESHOLD
)


# --------------------------------------------------------------------------
# BMP pixel decode: the real decode→feature hot loop, oracled
# --------------------------------------------------------------------------

# pixel pattern of multimodal.binary.synth_bmp_bytes — the oracle computes
# the SAME stats arithmetically from (seed, w, h) without touching bytes,
# so the byte-level decode (header walk, stride, bottom-up row order, BGR)
# is verified against an independent restatement
_BMP_ORACLE = """
    with spec as (
        select doc_id, cast(doc_id % 256 as int) as seed,
               cast(4 + doc_id % 9 as int) as w,
               cast(4 + doc_id % 7 as int) as h
        from documents
    ), gx as (
        select doc_id, seed, w, h,
               unnest(generate_series(0, w - 1)) as x
        from spec
    ), px as (
        select doc_id, seed, w, h, x,
               unnest(generate_series(0, h - 1)) as y
        from gx
    ), ch as (
        select doc_id, w, h,
               (seed + 3 * x + 7 * y) % 256 as b,
               (seed * 5 + x) % 256 as g,
               (seed * 11 + y) % 256 as r
        from px
    ), lm as (
        select doc_id, w, h, r, g, b,
               0.299::double * r + 0.587::double * g
                 + 0.114::double * b as luma
        from ch
    )
    select doc_id,
           max(w) as width, max(h) as height,
           round(avg(cast(r as double)), 4) as mean_r,
           round(avg(cast(g as double)), 4) as mean_g,
           round(avg(cast(b as double)), 4) as mean_b,
           round(stddev_pop(luma), 4) as std_luma,
           cast(count(*) filter (floor(luma / 32) = 0) as int) as h0,
           cast(count(*) filter (floor(luma / 32) = 1) as int) as h1,
           cast(count(*) filter (floor(luma / 32) = 2) as int) as h2,
           cast(count(*) filter (floor(luma / 32) = 3) as int) as h3,
           cast(count(*) filter (floor(luma / 32) = 4) as int) as h4,
           cast(count(*) filter (floor(luma / 32) = 5) as int) as h5,
           cast(count(*) filter (floor(luma / 32) = 6) as int) as h6,
           cast(count(*) filter (floor(luma / 32) = 7) as int) as h7
    from lm
    group by doc_id
    order by doc_id
"""


@register("multimodal_bmp_decode", _BMP_ORACLE)
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL image decode→feature hot loop, bench-tracked and
    oracled (round-7 verdict item 4): per document a 24-bpp BMP payload
    is synthesized DISTRIBUTED (``multimodal.binary.synth_bmp_payloads``,
    Arrow `mapInPandas`) with key-derived (seed, w, h), then decoded
    byte-for-byte by ``decode_bmp_stats`` — header walk, stride,
    bottom-up row order, BGR→channel means, Rec.601 luma std, 8-bin
    luminance histogram (numpy over Arrow batches). The oracle never
    touches bytes: it recomputes the stats arithmetically from the
    generator's closed-form pixel pattern, so any decode-path mistake
    (offset, stride, row order, channel order) breaks the hash. Linear
    in rows × pixels, partition-preserving, zero shuffle before the
    final sort."""
    from flight_radar_pipeline_spark.multimodal.binary import (
        decode_bmp_stats,
        synth_bmp_payloads,
    )

    docs = load_table(spark, sf_dir, "documents")
    spec = docs.select(
        "doc_id",
        (F.col("doc_id") % 256).cast("int").alias("seed"),
        (4 + F.col("doc_id") % 9).cast("int").alias("width"),
        (4 + F.col("doc_id") % 7).cast("int").alias("height"),
    )
    stats = decode_bmp_stats(
        synth_bmp_payloads(spec, "seed", "width", "height"),
        id_col="doc_id",
        payload_col="payload",
    )
    return stats.select(
        "doc_id",
        "width",
        "height",
        "mean_r",
        "mean_g",
        "mean_b",
        "std_luma",
        *[F.col("luma_hist")[i].alias(f"h{i}") for i in range(8)],
    ).orderBy("doc_id")

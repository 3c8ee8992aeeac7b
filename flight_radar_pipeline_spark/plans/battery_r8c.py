"""Round-8c battery additions: two new analytic families —

- retrospective CUSUM changepoint detection per event type (the
  level-shift "when did this metric change" monitoring staple; the
  offline dual of the streaming drift entries), and
- Johnson–Lindenstrauss random-projection with a distortion audit
  (dimensionality reduction as a first-class engine stage: the pre-ANN
  compaction pass, graded by how well cosine structure survives 64→16
  dims on exact query neighborhoods).

Both oracle-paired; registered into the shared REGISTRY on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.plans.battery import (
    register,
    register_grid_plans,
)
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# CUSUM changepoint per event type over the daily-mean series
# --------------------------------------------------------------------------

_CUSUM_ORACLE = """
    with s as (
        select event_type, cast(ts as date) as day,
               round(avg(value), 6) as x
        from events group by 1, 2
    ), st as (
        select event_type, day, x,
               round(avg(x) over (partition by event_type), 6) as xbar,
               stddev_pop(x) over (partition by event_type) as sd,
               count(*) over (partition by event_type) as n
        from s
    ), cum as (
        select event_type, day, n, sd,
               sum(x - xbar) over (partition by event_type order by day
                   rows between unbounded preceding and current row) as s2
        from st
    )
    select event_type, cast(n as bigint) as n_points,
           strftime(day, '%Y-%m-%d') as change_day,
           round(abs(s2), 6) as cusum_peak,
           round(abs(s2) / (sd * sqrt(n)), 4) as cusum_z
    from cum
    qualify row_number() over (partition by event_type
                               order by abs(s2) desc, day) = 1
    order by event_type
"""


@register("event_value_cusum_changepoint", _CUSUM_ORACLE)
def event_value_cusum_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Retrospective CUSUM changepoint per event type (``operators.
    temporal.cusum_changepoint``): on the daily-mean value series,
    S_t = Σ_{i≤t}(x_i − x̄); the estimated level-shift day is
    argmax|S_t| and z = max|S|/(σ√n) grades it (≫1 ⇒ real shift, ~0.5
    under a stable mean — the synthetic series should sit low). CUSUM
    is a property of the BUCKETED series, so the fact table never
    enters a window: one (type, day) pre-agg, then |days|-row windows.
    Parity: daily means and x̄ round to 6 first; the cumulative sum is
    a t-ordered sequential fold both engines execute identically, so
    the argmax row matches bit-for-bit; ties break on earliest day."""
    from flight_radar_pipeline_spark.operators.temporal import (
        cusum_changepoint,
    )

    ev = load_table(spark, sf_dir, "events")
    series = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("x"))
    out = cusum_changepoint(series, "event_type", "day", "x")
    return out.select(
        F.col("group").alias("event_type"),
        "n_points",
        F.date_format("change_t", "yyyy-MM-dd").alias("change_day"),
        "cusum_peak",
        "cusum_z",
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Johnson–Lindenstrauss projection distortion audit
# --------------------------------------------------------------------------

_JL_IN = 64
_JL_OUT = 16
_JL_QUERIES = 8
_JL_TOPK = 10


def _jl_oracle() -> str:
    """The SAME ±1 sign matrix as the operator (md5-derived, generated
    here from the shared builder) restated as 16 literal signed-sum
    expressions — strict left-to-right, matching the operator's fold
    order, so projected components are bit-identical."""
    from flight_radar_pipeline_spark.operators.linalg import jl_sign_matrix

    signs = jl_sign_matrix(_JL_IN, _JL_OUT)
    scale = 1.0 / float(_JL_OUT) ** 0.5
    comps = []
    for row in signs:
        terms = "".join(
            (" + " if s == 1 else " - ") + f"v[{d + 1}]"
            for d, s in enumerate(row)
        )
        comps.append(f"(0.0{terms}) * {scale!r}")
    wlist = "[" + ", ".join(comps) + "]"
    return f"""
    with e as (
        select vec_id, embedding::DOUBLE[] as v from embeddings
    ), p as (
        select vec_id, v, {wlist} as w from e
    ), n as (
        select vec_id, v, w,
               sqrt(list_inner_product(v, v)) as nv,
               sqrt(list_inner_product(w, w)) as nw
        from p
    ), cand as (
        select q.vec_id as query_id, c.vec_id as neighbor_id,
               round(list_inner_product(q.v, c.v) / (q.nv * c.nv), 6)
                   as cos64,
               round(list_inner_product(q.w, c.w) / (q.nw * c.nw), 6)
                   as cos16
        from n q join n c
          on q.vec_id < {_JL_QUERIES} and c.vec_id <> q.vec_id
    ), r as (
        select query_id, neighbor_id,
               row_number() over (partition by query_id
                   order by cos64 desc, neighbor_id) as r64,
               row_number() over (partition by query_id
                   order by cos16 desc, neighbor_id) as r16
        from cand
    ), agg as (
        select query_id, cast(count(*) as bigint) as n_neighbors,
               round(avg(abs(cos64 - cos16)), 4) as mean_abs_err,
               round(max(abs(cos64 - cos16)), 4) as max_abs_err
        from cand group by query_id
    ), ov as (
        select query_id, cast(count(*) as bigint) as topk_overlap
        from r where r64 <= {_JL_TOPK} and r16 <= {_JL_TOPK}
        group by query_id
    )
    select agg.query_id, n_neighbors, mean_abs_err, max_abs_err,
           coalesce(ov.topk_overlap, 0) as topk_overlap
    from agg left join ov using (query_id)
    order by query_id
    """


def _jl_cand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The candidate relation of `embedding_jl_distortion` (projection →
    bounded query-broadcast pair join) that the builder checkpoints —
    hidden from the final audited plan."""
    from flight_radar_pipeline_spark.operators.linalg import jl_project
    from flight_radar_pipeline_spark.operators.similarity import _dot

    emb = load_table(spark, sf_dir, "embeddings")
    proj = jl_project(
        emb, _JL_IN, _JL_OUT, id_col="vec_id", vec_col="embedding"
    )
    v = F.col("embedding").cast("array<double>")
    w = F.col("jl_vec")
    base = proj.select(
        "vec_id",
        v.alias("v"),
        w.alias("w"),
        F.sqrt(_dot(v, v)).alias("nv"),
        F.sqrt(_dot(w, w)).alias("nw"),
    )
    q = base.filter(F.col("vec_id") < _JL_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("w").alias("qw"),
        F.col("nv").alias("qnv"),
        F.col("nw").alias("qnw"),
    )
    return base.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("qv"), F.col("v")) / (F.col("qnv") * F.col("nv")),
            6,
        ).alias("cos64"),
        F.round(
            _dot(F.col("qw"), F.col("w")) / (F.col("qnw") * F.col("nw")),
            6,
        ).alias("cos16"),
    )


@register_grid_plans("embedding_jl_distortion")
def _jl_grid_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {"candidate_pairs": _jl_cand(spark, sf_dir)}


@register("embedding_jl_distortion", _jl_oracle())
def embedding_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss projection audit (``operators.linalg.
    jl_project``): embeddings compact {d_in}→{d_out} dims through the
    deterministic ±1/√k md5 sign matrix — the shuffle-free pre-ANN
    compaction pass — and each of {q} exact query neighborhoods grades
    the damage: mean/max |cos_64 − cos_16| and how many of the true
    top-{k} cosine neighbors survive in the projected top-{k}. The
    projection itself is one scan (each output component a row-local
    signed-sum fold, no multiply, no shuffle, no Python); the audit is
    a bounded {q}-query broadcast against the corpus (the ANN-baseline
    BNLJ class) plus two |cand|-row rank windows. The oracle restates
    the same sign matrix as literal signed sums — identical fold order,
    bit-identical components."""
    # agg + two rank windows consume it — checkpoint once (subplan
    # audited via GRID_PLANS / _jl_cand)
    cand = _jl_cand(spark, sf_dir).localCheckpoint(eager=True)
    w64 = Window.partitionBy("query_id").orderBy(
        F.desc("cos64"), F.asc("neighbor_id")
    )
    w16 = Window.partitionBy("query_id").orderBy(
        F.desc("cos16"), F.asc("neighbor_id")
    )
    ranked = cand.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(w64).alias("r64"),
        F.row_number().over(w16).alias("r16"),
    )
    agg = cand.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neighbors"),
        F.round(F.avg(F.abs(F.col("cos64") - F.col("cos16"))), 4).alias(
            "mean_abs_err"
        ),
        F.round(F.max(F.abs(F.col("cos64") - F.col("cos16"))), 4).alias(
            "max_abs_err"
        ),
    )
    ov = (
        ranked.filter(
            (F.col("r64") <= _JL_TOPK) & (F.col("r16") <= _JL_TOPK)
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("topk_overlap"))
    )
    return (
        agg.join(ov, "query_id", "left")
        .select(
            "query_id",
            "n_neighbors",
            "mean_abs_err",
            "max_abs_err",
            F.coalesce("topk_overlap", F.lit(0).cast("bigint")).alias(
                "topk_overlap"
            ),
        )
        .orderBy("query_id")
    )


embedding_jl_distortion.__doc__ = embedding_jl_distortion.__doc__.format(
    d_in=_JL_IN, d_out=_JL_OUT, q=_JL_QUERIES, k=_JL_TOPK
)

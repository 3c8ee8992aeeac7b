"""Round-7g battery additions: k-core graph peeling (the cohesion
filter that isolates the dense transactional core), positional
proximity search (the inverted-index NEAR operator), and
signup→purchase conversion-latency quantiles on the exact
distinct-value path.

Each entry pairs the Spark plan with a DuckDB oracle that restates the
semantics independently. Registered into the shared REGISTRY on import
(see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions.text import tokens
from flight_radar_pipeline_spark.plans.battery import (
    register,
    register_grid_plans,
)
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# k-core peeling on the customer–supplier graph
# --------------------------------------------------------------------------

_KCORE_ROUNDS = 4


def _kcore_oracle() -> str:
    parts = ["""
    with e0 as (
        select distinct 'c' || o_custkey as a, 's' || l_suppkey as b
        from orders join lineitem on l_orderkey = o_orderkey
    ), sym0 as (
        select a as src, b as dst from e0
        union all
        select b as src, a as dst from e0
    ), kk as (
        -- self-sized k = ceil(|E| / |V|) (half the symmetrized mean
        -- degree: the bipartite-robust threshold — the raw mean is
        -- dominated by the dense side and over-peels); exact integer
        -- arithmetic with explicit floor, mirrored in the Spark plan
        select cast(floor((count(*) + 2 * count(distinct src) - 1)
                          / (2.0 * count(distinct src))) as bigint) as k
        from sym0
    )"""]
    prev = "sym0"
    rounds = []
    for i in range(1, _KCORE_ROUNDS + 1):
        parts.append(f""", keep{i} as (
        select src as node from {prev}, kk
        group by src, kk.k having count(*) >= kk.k
    ), sym{i} as (
        select s.src, s.dst from {prev} s
        join keep{i} k1 on s.src = k1.node
        join keep{i} k2 on s.dst = k2.node
    )""")
        rounds.append(f"""
        select {i} as round,
               cast(count(distinct case when src like 'c%' then src end)
                    as bigint) as n_customers,
               cast(count(distinct case when src like 's%' then src end)
                    as bigint) as n_suppliers,
               cast(count(*) / 2 as bigint) as n_edges
        from sym{i}""")
        prev = f"sym{i}"
    parts.append("select * from (" + " union all ".join(rounds))
    parts.append(") order by round")
    return "".join(parts)


def _kcore_sym_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The edge-build subplan of `entity_kcore_peeling` (hidden from the
    final audited plan by the eager `localCheckpoint()`): lineitem ⋈
    orders → distinct customer–supplier pairs → symmetric edge list."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pair = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    return pair.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pair.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


@register_grid_plans("entity_kcore_peeling")
def _kcore_grid_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    sym = _kcore_sym_edges(spark, sf_dir)
    return {
        "edge_build": sym,
        "degree_probe": sym.agg(
            F.count(F.lit(1)).alias("m"), F.countDistinct("src").alias("v")
        ),
    }


@register("entity_kcore_peeling", _kcore_oracle())
def entity_kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling ({_KCORE_ROUNDS} rounds, k = ⌈|E|/|V|⌉ —
    SELF-SIZED from the graph so the filter bites at every scale
    factor without emptying the sparse side of a bipartite graph
    (the raw mean degree over-peels: it is dominated by the dense
    side) — the sizing-rule discipline) on the
    symmetrized customer–supplier graph → (round, n_customers,
    n_suppliers, n_edges): each round drops nodes with degree < k and
    the edges touching them — the cohesion filter that isolates the
    dense transactional core (fraud rings, power-trader communities)
    from the long tail PageRank smears over. A fixed round budget is
    the documented approximation of the fixpoint (the survivor curve
    flattening across rounds SHOWS convergence; equal consecutive
    rounds = fixpoint reached).

    Scale posture: each round is one degree aggregate (map-side
    combinable) + two semi-joins against the node-sized keep set; the
    edge list shrinks monotonically, so per-round cost falls. Edges
    checkpoint after each round to keep the static plan linear in
    rounds, not exponential. k derives from one exact integer
    aggregate (a bounded driver action, the `n_types` precedent).
    All-integer outputs: exact parity."""
    from flight_radar_pipeline_spark.operators.graph import kcore_peel

    sym = _kcore_sym_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg_row = sym.agg(
        F.count(F.lit(1)).alias("m"), F.countDistinct("src").alias("v")
    ).collect()[0]
    k = (deg_row.m + 2 * deg_row.v - 1) // (2 * deg_row.v)
    out = []
    for rnd, sym_r in enumerate(
        # input is symmetric + DISTINCT by construction (`pair` is a
        # distinct customer–supplier set and the two union branches are
        # disjoint: 'c…'→'s…' vs 's…'→'c…'), and the localCheckpoint
        # above already materialized it — pre_deduped=True skips the
        # operator's internal re-dedup + re-checkpoint, which re-shuffled
        # and re-copied the full edge list once per call (round-13)
        kcore_peel(
            sym, k=k, rounds=_KCORE_ROUNDS, symmetrize=False, pre_deduped=True
        ),
        start=1,
    ):
        out.append(
            sym_r.agg(
                F.lit(rnd).alias("round"),
                F.countDistinct(
                    F.when(F.col("src").startswith("c"), F.col("src"))
                )
                .cast("bigint")
                .alias("n_customers"),
                F.countDistinct(
                    F.when(F.col("src").startswith("s"), F.col("src"))
                )
                .cast("bigint")
                .alias("n_suppliers"),
                (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("round")


entity_kcore_peeling.__doc__ = entity_kcore_peeling.__doc__.format(
    _KCORE_ROUNDS=_KCORE_ROUNDS
)

# --------------------------------------------------------------------------
# positional proximity search (NEAR operator)
# --------------------------------------------------------------------------

_NEAR_A = "key"
_NEAR_B = "value"
_NEAR_W = 5

_NEAR_ORACLE = rf"""
    with t as (
        select doc_id, lang,
               regexp_split_to_array(trim(text), '\s+') as toks
        from documents
    ), pos as (
        select doc_id, lang, toks[i] as word, i
        from t, lateral (
            select unnest(range(1, len(toks) + 1)) as i
        )
        where toks[i] in ('{_NEAR_A}', '{_NEAR_B}')
    ), pairs as (
        select a.doc_id, a.lang
        from pos a join pos b
          on a.doc_id = b.doc_id
         and a.word = '{_NEAR_A}' and b.word = '{_NEAR_B}'
         and abs(a.i - b.i) <= {_NEAR_W}
    )
    select lang,
           cast(count(distinct doc_id) as bigint) as n_docs,
           cast(count(*) as bigint) as n_pairs
    from pairs group by lang order by lang
"""


@register("doc_proximity_search", _NEAR_ORACLE)
def doc_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional proximity search (the inverted-index NEAR operator) →
    (lang, n_docs, n_pairs): documents where '{_NEAR_A}' and
    '{_NEAR_B}' co-occur within {_NEAR_W} token positions, counted at
    the occurrence-pair grain — the retrieval primitive between bag-of-
    words (BM25, order-blind) and exact phrase match: NEAR queries are
    how legal/patent search and context-window mining are built.

    Scale: the positional index explodes ONLY the two query terms'
    postings (the `where word in (...)` filter rides the explode — the
    posting-list discipline: cost tracks matching positions, not corpus
    positions), and the pair join is doc-keyed with a band predicate on
    position. All-integer outputs."""
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        "lang",
        F.posexplode(tokens("text")).alias("i0", "word"),
    ).filter(F.col("word").isin(_NEAR_A, _NEAR_B)).select(
        "doc_id", "lang", "word", (F.col("i0") + 1).alias("i")
    )
    a = pos.filter(F.col("word") == _NEAR_A).select(
        "doc_id", "lang", F.col("i").alias("ia")
    )
    b = pos.filter(F.col("word") == _NEAR_B).select(
        F.col("doc_id").alias("doc_id_b"), F.col("i").alias("ib")
    )
    pairs = a.join(
        b,
        (a["doc_id"] == b["doc_id_b"])
        & (F.abs(F.col("ia") - F.col("ib")) <= _NEAR_W),
    )
    return (
        pairs.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
        .orderBy("lang")
    )


doc_proximity_search.__doc__ = doc_proximity_search.__doc__.format(
    _NEAR_A=_NEAR_A, _NEAR_B=_NEAR_B, _NEAR_W=_NEAR_W
)

# --------------------------------------------------------------------------
# signup → first-purchase conversion latency quantiles
# --------------------------------------------------------------------------

_LAT_ORACLE = """
    with su as (
        select user_id, min(ts) as t0 from events
        where event_type = 'signup' group by 1
    ), pu as (
        select e.user_id,
               cast(floor(date_diff('second', su.t0, min(e.ts)) / 60)
                    as bigint) as lat_min
        from events e join su on e.user_id = su.user_id
        where e.event_type = 'purchase' and e.ts >= su.t0
        group by e.user_id, su.t0
    ), dist as (
        select lat_min, count(*) as cnt from pu group by 1
    ), cum as (
        select lat_min,
               sum(cnt) over (order by lat_min
                              rows between unbounded preceding
                              and current row) as cum,
               sum(cnt) over () as n
        from dist
    )
    select cast(max(n) as bigint) as n_converted,
           cast(min(case when cum * 4 >= n then lat_min end) as bigint)
               as p25_min,
           cast(min(case when cum * 2 >= n then lat_min end) as bigint)
               as p50_min,
           cast(min(case when cum * 4 >= n * 3 then lat_min end) as bigint)
               as p75_min,
           cast(min(case when cum * 10 >= n * 9 then lat_min end) as bigint)
               as p90_min
    from cum
"""


@register("signup_purchase_latency_quantiles", _LAT_ORACLE)
def signup_purchase_latency_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Signup → first-purchase conversion latency → one row
    (n_converted, p25_min, p50_min, p75_min, p90_min): minutes from a
    user's first signup to their first subsequent purchase, with EXACT
    lower quantiles read off the cumulative distinct-latency
    distribution (the Mann–Whitney pre-aggregate shape: no fact-sized
    sort, no approx_percentile nondeterminism — the k·cum ≥ q·n
    crossing is pure integer arithmetic). The funnel entries count WHO
    converts; this is HOW FAST — the activation-latency readout
    product teams page on.

    Scale: two per-user min-aggregates, one user-keyed join, and a
    window over the distinct-minute relation (bounded by the latency
    range, not the user count)."""
    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id", "t0")
        .agg(F.min("ts").alias("t1"))
        .select(
            F.floor(
                (
                    F.col("t1").cast("long") - F.col("t0").cast("long")
                )
                / 60
            )
            .cast("bigint")
            .alias("lat_min")
        )
    )
    dist = pu.groupBy("lat_min").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.partitionBy().orderBy("lat_min").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = dist.select(
        "lat_min",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    q = lambda num, den: F.min(  # noqa: E731
        F.when(F.col("cum") * den >= F.col("n") * num, F.col("lat_min"))
    ).cast("bigint")
    return cum.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        q(1, 4).alias("p25_min"),
        q(1, 2).alias("p50_min"),
        q(3, 4).alias("p75_min"),
        q(9, 10).alias("p90_min"),
    )

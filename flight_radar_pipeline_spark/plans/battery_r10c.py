"""Round-10c battery addition — minimum spanning tree, the graph
family's one remaining classic (pre-registration sweep: the registry
has PageRank, HITS, k-core, connected components, label propagation,
reachability, Adamic–Adar — but no spanning-tree / graph-OPTIMIZATION
entry; candidates dropped by the same sweep: Hungarian assignment — no
tractable unrolled oracle — and single-linkage clustering, which IS
the MST plus a cut and would duplicate this entry's family).

`nation_profile_mst`: Kruskal over the complete 25-nation similarity
graph with EXACT integer weights (L1 distance between per-nation
(avg order cents, order count) profiles), so edge ordering can never
diverge cross-engine. The Spark side aggregates the fact to the
25-node profile relation and runs union-find Kruskal on the driver
(the sanctioned bounded-grain class — markov/PAVA precedent: the node
set is a DIMENSION here; a growing node set takes the Borůvka path —
per-component min-edge aggregates + pointer-jumping CC, one exchange
per O(log V) round — the same per-round shape as the k-core entry).
The DuckDB oracle unrolls the identical Kruskal as 24 materialized
pick/relabel CTE steps (the set-cover precedent), exhaustion-safe if a
tiny SF ever drops a nation. A third implementation (Prim's algorithm,
pure Python) guards both in tests/test_r10c_ops.py.

Registered into the shared REGISTRY on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.plans.battery import (
    register,
    register_grid_plans,
)
from flight_radar_pipeline_spark.sources.readers import load_table

_CNT_SCALE = 10000  # count-axis weight: comparable magnitude to avg cents
_MAX_STEPS = 24     # |nations| − 1 picks connect the complete graph


def _mst_oracle() -> str:
    """Unrolled Kruskal: each step picks the min-weight cross-component
    edge under the total (w, u, v) order, then relabels both touched
    components to their min label. Steps past exhaustion pick nothing."""
    parts = [f"""
    with prof as materialized (
        select n.n_name,
               sum(cast(round(o.o_totalprice * 100) as bigint)) as s_cents,
               count(*) as n_orders
        from orders o
        join customer c on o.o_custkey = c.c_custkey
        join nation n on c.c_nationkey = n.n_nationkey
        group by n.n_name
    ), e as materialized (
        select u.n_name as u, v.n_name as v,
               abs(u.s_cents // u.n_orders - v.s_cents // v.n_orders)
                 + {_CNT_SCALE} * abs(u.n_orders - v.n_orders) as w
        from prof u join prof v on u.n_name < v.n_name
    ), comp0 as materialized (
        select n_name, n_name as comp from prof
    )"""]
    for k in range(1, _MAX_STEPS + 1):
        prev = f"comp{k - 1}"
        parts.append(f""", pick{k} as materialized (
        select e.u, e.v, e.w from e
        join {prev} cu on cu.n_name = e.u
        join {prev} cv on cv.n_name = e.v
        where cu.comp <> cv.comp
        order by e.w, e.u, e.v limit 1
    ), touched{k} as materialized (
        select comp from {prev}
        where n_name in (select u from pick{k} union all
                         select v from pick{k})
    ), comp{k} as materialized (
        select c.n_name,
               case when c.comp in (select comp from touched{k})
                    then (select min(comp) from touched{k})
                    else c.comp end as comp
        from {prev} c
    )""")
    selects = [
        f"select cast({k} as bigint) as step, u as u_name, v as v_name,"
        f" cast(w as bigint) as w from pick{k}"
        for k in range(1, _MAX_STEPS + 1)
    ]
    parts.append(
        "\n    select * from ("
        + " union all ".join(selects)
        + ") order by step"
    )
    return "".join(parts)


def _mst_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-side subplan of `nation_profile_mst`: one order scan →
    two broadcast dim joins → the |nations|-row exact-integer profile
    the driver-side Kruskal consumes."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        orders.join(
            F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
        )
        .join(
            F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("s_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register_grid_plans("nation_profile_mst")
def _mst_grid_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {"nation_profile": _mst_profile(spark, sf_dir)}


@register("nation_profile_mst", _mst_oracle())
def nation_profile_mst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning tree of the complete nation-similarity graph →
    (step, u_name, v_name, w), one row per Kruskal pick in pick order:
    nodes are the 25 nations, each profiled by exact integers
    (avg order value in cents via bigint division, order count), edge
    weight = L1 distance |Δavg_cents| + 10000·|Δcount| — the backbone
    that reads as "which markets behave alike", and the algorithmic
    core single-linkage clustering cuts from. All weights are exact
    bigints, so the (w, u, v) edge order — and therefore the tree and
    its pick sequence — is engine-identical by construction; ties
    break on the lexicographic pair.

    Plan: one fact scan → two broadcast dim joins → a |nations|-row
    aggregate; the 300-edge Kruskal (union-find) runs on the driver —
    the sanctioned bounded-grain class (markov-stationary precedent),
    because the node set is a dimension. A node set that GROWS with
    the data takes the Borůvka path instead: per-component min-edge
    aggregate + min-label propagation per round, O(log V) rounds, the
    k-core entry's per-round shape. The DuckDB oracle unrolls the same
    Kruskal as 24 pick/relabel CTE steps and is exhaustion-safe (a
    step past connectivity picks nothing), mirroring the greedy
    set-cover contract."""
    rows = _mst_profile(spark, sf_dir).collect()  # |nations| — bounded dimension grain
    profile = {r.n_name: (r.s_cents // r.n_orders, r.n_orders) for r in rows}
    names = sorted(profile)
    edges = sorted(
        (
            abs(profile[u][0] - profile[v][0])
            + _CNT_SCALE * abs(profile[u][1] - profile[v][1]),
            u,
            v,
        )
        for i, u in enumerate(names)
        for v in names[i + 1:]
    )
    parent = {n: n for n in names}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    picks = []
    for w, u, v in edges:
        ru, rv = find(u), find(v)
        if ru == rv:
            continue
        # relabel to the min component label — same rule as the oracle
        lo, hi = sorted((ru, rv))
        parent[hi] = lo
        picks.append((len(picks) + 1, u, v, w))
        if len(picks) == len(names) - 1:
            break
    return spark.createDataFrame(
        picks, "step bigint, u_name string, v_name string, w bigint"
    ).orderBy("step")

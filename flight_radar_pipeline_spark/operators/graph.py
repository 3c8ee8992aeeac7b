"""Connected components over near-duplicate pair graphs.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS — one
winner per connected group of mutually-similar documents. This is the
iterative-algorithm class expressed on DataFrames: driver-coordinated
label propagation (each node repeatedly adopts the min label in its
neighborhood), the standard pattern for graph algorithms on Spark when
GraphFrames isn't available.

Scale: each iteration is one join + one aggregate (two shuffles keyed on
node id); iteration count is the graph diameter — near-dup clusters are
shallow (pairs/triangles/small chains), so 2-4 iterations in practice.
``localCheckpoint`` truncates the lineage each round so the plan doesn't
grow exponentially.

Label propagation moves the min label ONE HOP per iteration — right for
the shallow pair/triangle/short-chain graphs near-dup detection emits,
wrong for long chains (a length-d path needs d rounds). For those,
``connected_components_star`` implements the alternating
large-star/small-star contraction (Kiveris et al., "Connected
Components in MapReduce and Beyond"): each round re-points whole
neighborhoods at their minimum, so a 100-node path converges in a
handful of rounds instead of 99. Same edge-list in, same
(doc_id, cluster_id) out.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id_a, id_b) edge list → (doc_id, cluster_id) where ``cluster_id``
    is the minimum node id in the component. Deterministic; singletons
    (nodes with no edge) are the caller's concern — only nodes appearing
    in ``pairs`` are labeled.
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        # carry the previous label through the update so convergence is a
        # filter on the checkpointed frame, not another join + recompute
        stepped = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["u"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                F.col("label").alias("__prev"),
            )
            .localCheckpoint(eager=True)
        )
        changed = stepped.filter(F.col("label") != F.col("__prev")).limit(1).count()
        labels = stepped.drop("__prev")
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    decimals: int = 8,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list → (node, pr).

    The iterative-linear-algebra class on DataFrames: each iteration is
    one edge⋈rank join keyed on the SOURCE plus one destination-keyed
    sum — the sparse matrix-vector product, where the "matrix" stays a
    distributed edge table. Fixed iteration count (no convergence test)
    keeps the result deterministic and the job a static DAG.

    Semantics: pr₀ = 1/N; prₜ₊₁(v) = (1−d)/N + d·Σ_{u→v} prₜ(u)/outdeg(u).
    Nodes without in-edges keep the teleport term; mass from dangling
    nodes (no out-edges) is dropped, not redistributed — with a
    symmetrized edge list (the near-dup / co-occurrence use cases) there
    are none. Final ranks round in-plan: rank arithmetic is pure, so
    ``decimals`` only absorbs aggregation-order float noise.

    Scale posture: the edge list — the one big table — is deduped,
    repartitioned on ``src`` ONCE and checkpointed, so every iteration's
    edge⋈rank join reuses that layout instead of re-shuffling edges; the
    rank and out-degree tables are node-sized. The contribution sum has
    full map-side partial aggregation.

    The node table is materialized once too (round-13 optimization):
    every iteration's left join — and the teleport term — used to
    re-derive ``nodes`` (two scans of the edge table + a distinct) and
    the 1-row count aggregate per consumer, so the unrolled static plan
    re-scanned edges ~2× per iteration just to rebuild the same node
    set. One eager checkpoint + one bounded count action replaces those
    subplans with a materialized leaf and a literal N (bit-identical
    arithmetic: the same double division, now constant-folded).
    """
    dedup = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    deg_w = Window.partitionBy("src")
    # out-degree folds into the checkpointed edge table (a src-partition
    # window on the already-src-clustered layout), so each iteration is
    # ONE join instead of two
    e = (
        dedup.repartition("src")
        .select(
            "src",
            "dst",
            F.count(F.lit(1)).over(deg_w).cast("double").alias("__deg"),
        )
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # bounded driver action (node count, one bigint) — the same double
    # the old 1-row count aggregate carried, now a plan literal
    n_lit = F.lit(float(nodes.count()))
    pr = nodes.select("node", (F.lit(1.0) / n_lit).alias("pr"))
    for _ in range(iterations):
        contrib = (
            e.join(pr.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("__deg")).alias("__mass"))
        )
        pr = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    (1.0 - damping) / n_lit
                    + damping * F.coalesce(F.col("__mass"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr.select("node", F.round("pr", decimals).alias("pr"))


def star_contraction(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 16,
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star rounds until the edge set is
    stable → (star edges (u=center, v=node) with u < v, rounds used).

    One round:

    - **large-star**: per node u over its full (bidirectional)
      neighborhood, m = min(Γ(u) ∪ {u}); every neighbor v > u re-points
      to m. Strictly larger endpoints hop toward the minimum.
    - **small-star**: per node x over its smaller neighbors
      N⁻(x) = {u : u < x}, m = min(N⁻(x)); every u ∈ N⁻(x) and x itself
      re-point to m. Flattens chains of parents into stars.

    Both steps preserve connectivity and never raise a node's minimum
    reachable label, so the fixed point is a union of stars centered at
    each component's minimum id — reached in O(log n) practical rounds
    (O(log² n) worst case) versus diameter rounds for label propagation.

    Scale: each round computes the per-node minima as WINDOW minima over
    the same partitioning key the old groupBy+join-back pair used — one
    shuffle of the adjacency per star step instead of an aggregate
    exchange plus a join exchange (the round-13 `ngram_jaccard_pairs`
    rewrite, guide §2.2: never aggregate and join back on the same key);
    ``localCheckpoint`` truncates lineage per round; convergence is a
    (count, xxhash64 checksum) comparison — one tiny aggregate, no
    edge-set subtract.
    """
    e = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(edges: DataFrame) -> tuple:
        # xor-fold of per-edge hashes: a valid set checksum because the
        # edge set is distinct, and it cannot overflow under ANSI mode
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    sig = _sig(e)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star over the bidirectional adjacency: the neighborhood
        # minimum is a window min over u — same key, one shuffle, no
        # join-back (m = min(Γ(u) ∪ {u}))
        adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m_u = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
        large = (
            adj.withColumn("m", m_u)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("m").alias("u"), F.col("v").alias("v"))
            .distinct()
        )
        # small-star over parent edges (u < v by construction: m < v):
        # m = min(N⁻(v)) as a window min over v; every u re-points to m
        # and v itself re-points to m (emitted per row — the final
        # distinct collapses the per-group duplicates)
        m_v = F.min("u").over(Window.partitionBy("v"))
        small = (
            large.withColumn("m", m_v)
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("m").alias("a"), F.col("u").alias("b")),
                        F.struct(F.col("m").alias("a"), F.col("v").alias("b")),
                    )
                ).alias("__e")
            )
            .select("__e.a", "__e.b")
            .filter(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_sig = _sig(small)
        e = small
        if new_sig == sig:
            break
        sig = new_sig
    return e, rounds


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 16,
) -> DataFrame:
    """(id_a, id_b) edge list → (doc_id, cluster_id) via star contraction
    — same contract as ``connected_components`` (cluster_id = component
    minimum, only nodes appearing in ``pairs`` labeled), built for graphs
    with long chains where label propagation would need diameter rounds."""
    stars, _ = star_contraction(pairs, id_a, id_b, max_iter)
    return (
        stars.select(F.col("v").alias("node"), F.col("u").alias("label"))
        .union(stars.select(F.col("u").alias("node"), F.col("u").alias("label")))
        .groupBy("node")
        .agg(F.min("label").alias("label"))
        .select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
    )


def n_hop_reach(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Breadth-first reach from a seed set: every node within
    ``max_hops`` directed hops, labeled with its MINIMUM hop distance
    (seeds are hop 0). The bounded-iteration frontier-expansion class on
    DataFrames — blast-radius / influence-neighborhood queries.

    Each hop is one frontier→edges equi-join on ``src`` plus one
    left-anti join against the visited set, so per-round cost tracks the
    frontier size, not the graph size. ``edges`` is repartitioned on
    ``src`` ONCE and cached so every hop reuses the same partitioning;
    each hop's FRONTIER is localCheckpoint-ed (it feeds the next hop's
    join and the final union), while the visited set stays a shallow
    union of those materialized frontiers — checkpointing it too (the
    pre-round-13 shape) re-materialized all prior hops once per hop, a
    second eager driver action per round that bought nothing: the union
    is already flat. Hop count is a fixed small constant — this is NOT
    transitive closure; unbounded reachability wants
    ``connected_components_star``.
    """
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    e = e.repartition("__src").cache()
    visited = seeds.select(
        F.col(node).alias("__node"), F.lit(0).alias("hop")
    ).distinct()
    frontier = visited.select("__node")
    for hop in range(1, int(max_hops) + 1):
        nxt = (
            frontier.join(e, frontier["__node"] == e["__src"])
            .select(F.col("__dst").alias("__node"))
            .distinct()
            .join(visited.select("__node"), "__node", "left_anti")
        )
        nxt = nxt.localCheckpoint(eager=True)
        visited = visited.union(nxt.select("__node", F.lit(hop).alias("hop")))
        frontier = nxt
    e.unpersist()
    return visited.select(F.col("__node").alias(node), "hop")


def adamic_adar_pairs(
    membership: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    maxdf: int = 1000,
    min_common: int = 2,
    storage: StorageLevel | None = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Link prediction over a bipartite membership table: for every pair
    of users sharing ≥ ``min_common`` items, the common-neighbor count
    and the Adamic–Adar score Σ 1/ln(deg(item)) over the shared items —
    rare shared items weigh more than popular ones.

    Scale posture is the inverted-index one (same as n-gram Jaccard):
    candidate pairs are generated PER ITEM, quadratic in per-item
    degree, and ``maxdf`` drops hot items BEFORE any pair is emitted —
    bounding fan-out at ``maxdf``² per item and making the score a
    rare-item score by construction (the analysis restriction every
    at-scale common-neighbors system applies; the caller's oracle must
    restate the same cap). Degree-1 items can't form pairs and are
    dropped with the same filter.

    Pair generation is a-priori over the per-item sorted user SET, not
    an item-keyed self-join: the degree-capped membership groups to one
    sorted set per item (bounded at ``maxdf`` elements by the cap
    applied upstream, so the aggregation buffer is bounded at any
    scale), and every (a < b) combination is emitted by TWO codegen'd
    Generate steps — ``posexplode`` of the set, then ``explode`` of the
    tail ``slice`` past each element (round-14; the round-13 form built
    the O(maxdf²)-struct ``pair_combinations`` cell through nested
    CodegenFallback HOF lambdas before a single flatten-explode — every
    pair paid an interpreted lambda call plus a struct allocation, and
    the whole cell materialized per item). Round-13 exchange sweep
    still holds: the self-join's second exchange, its join, and the
    two-consumer persist are gone (the set aggregate reuses the cap
    join's item partitioning), 16 → 7 exchanges on the
    `customer_adamic_adar` plan, hash-identical. ``storage`` is kept
    for signature compatibility; the single-pass shape has no shared
    subtree left to persist. Per-row transient state is one O(maxdf)
    slice copy per lead element — no quadratic cell.
    """
    del storage  # single-consumer plan: nothing left worth persisting
    m = membership.select(
        F.col(user_col).alias("__u"), F.col(item_col).alias("__i")
    )
    # no standalone (u, i)-distinct exchange: collect_set dedups inside
    # the item group and count_distinct computes the post-dedup degree
    deg = (
        m.groupBy("__i")
        .agg(F.count_distinct("__u").alias("__d"))
        .filter((F.col("__d") >= 2) & (F.col("__d") <= maxdf))
    )
    sets = (
        m.join(deg, "__i")
        .groupBy("__i")
        .agg(
            F.max("__d").alias("__d"),  # constant per item — deterministic
            F.array_sort(F.collect_set("__u")).alias("__us"),
        )
    )
    # pair emission as TWO Generate steps (posexplode the sorted set,
    # then explode the tail slice per element) instead of the
    # pair_combinations flattened struct cell (round-14): the nested
    # transform/flatten HOF is CodegenFallback — every pair costs an
    # interpreted lambda call plus a named_struct allocation, and the
    # whole O(d²)-struct cell materializes per item before the explode.
    # posexplode+slice emit the identical (x before y) pairs through
    # codegen'd Generates, longs only, no struct cell. Same rows, same
    # aggregate, bit-identical scores.
    lead = sets.select(
        "__d",
        "__us",
        F.posexplode("__us").alias("__pos", "id_a"),
    )
    return (
        lead.select(
            "__d",
            "id_a",
            F.explode(
                F.slice(F.col("__us"), F.col("__pos") + 2, F.size("__us"))
            ).alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.round(F.sum(F.lit(1.0) / F.log(F.col("__d"))), 4).alias("adamic_adar"),
        )
        .filter(F.col("n_common") >= min_common)
    )


def time_respecting_reach(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    ts: str = "ts",
    node: str = "node",
    seed_ts: str = "ts0",
) -> DataFrame:
    """Temporal BFS: which nodes can be reached from the seeds through
    edges whose timestamps are NON-DECREASING along the path, starting
    no earlier than each seed's ``seed_ts`` — the information-flow /
    contact-tracing reachability that plain ``n_hop_reach`` overstates
    (a path that goes back in time carries nothing). Labels each reached
    node with its minimum hop and, at that hop, the EARLIEST arrival
    time (earlier arrival can only enable more onward edges, so
    min-arrival dominates any other same-hop state).

    Same frontier mechanics as ``n_hop_reach`` (edges repartitioned on
    ``src`` once; per-round localCheckpoint), with the frontier carrying
    ``(node, arrival)`` and the hop join demanding ``edge.ts >=
    arrival``. A node re-reachable at a later hop with an earlier
    arrival is NOT revisited — for min-HOP labeling the first visit
    wins; callers needing full earliest-arrival semantics should
    iterate to fixpoint instead of a hop cap.
    """
    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), F.col(ts).alias("__ts")
    )
    e = e.repartition("__src").cache()
    visited = seeds.select(
        F.col(node).alias("__node"),
        F.lit(0).alias("hop"),
        F.col(seed_ts).alias("arrival"),
    ).groupBy("__node", "hop").agg(F.min("arrival").alias("arrival"))
    frontier = visited.select("__node", "arrival")
    for hop in range(1, int(max_hops) + 1):
        nxt = (
            frontier.join(e, frontier["__node"] == e["__src"])
            .filter(F.col("__ts") >= F.col("arrival"))
            .groupBy(F.col("__dst").alias("__n2"))
            .agg(F.min("__ts").alias("arrival"))
            .select(F.col("__n2").alias("__node"), "arrival")
            .join(visited.select("__node"), "__node", "left_anti")
        )
        nxt = nxt.localCheckpoint(eager=True)
        visited = visited.unionByName(
            nxt.select("__node", F.lit(hop).alias("hop"), "arrival")
        )
        frontier = nxt
    e.unpersist()
    return visited.select(
        F.col("__node").alias(node), "hop", "arrival"
    )


def bounded_min_cost(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node: str = "node",
) -> DataFrame:
    """Weighted shortest distance from a seed set, bounded to paths of
    at most ``max_hops`` edges — delta-stepping-flavored Bellman–Ford on
    DataFrames. Returns every node whose bounded distance is finite with
    its minimum path cost (seeds are cost 0). Non-negative weights
    assumed (a negative edge makes "min over ≤k-hop paths" still
    well-defined, but the improved-only frontier below would remain
    correct only because every round re-relaxes all improved nodes —
    documented for k-bounded semantics, not general SSSP).

    Scale posture mirrors ``n_hop_reach``: ``edges`` is repartitioned on
    ``src`` once and cached so each relaxation round's join reuses the
    partitioning; each round joins only the IMPROVED frontier (nodes
    whose best-known cost changed last round) against the edges, does a
    map-side-combinable ``min`` per destination, and merges into the
    distance table via a full-outer coalesce-min. Rounds are a fixed
    small constant and both sides are localCheckpoint-ed per round, so
    lineage stays flat and per-round cost tracks the improved set, not
    the graph.
    """
    e = edges.select(
        F.col(src).alias("__src"),
        F.col(dst).alias("__dst"),
        F.col(weight).alias("__w"),
    )
    e = e.repartition("__src").cache()
    dist = seeds.select(F.col(node).alias("__node")).distinct().select(
        "__node", F.lit(0).cast("bigint").alias("cost")
    )
    frontier = dist
    for _ in range(int(max_hops)):
        cand = (
            frontier.join(e, frontier["__node"] == e["__src"])
            .groupBy(F.col("__dst").alias("__n2"))
            .agg(F.min(F.col("cost") + F.col("__w")).alias("new_cost"))
            .select(F.col("__n2").alias("__node"), "new_cost")
        )
        merged = (
            dist.join(cand, "__node", "full_outer")
            .select(
                "__node",
                F.least(
                    F.coalesce(F.col("cost"), F.col("new_cost")),
                    F.coalesce(F.col("new_cost"), F.col("cost")),
                ).alias("cost"),
                (
                    F.col("cost").isNull()
                    | (F.col("new_cost") < F.col("cost"))
                ).alias("__improved"),
            )
        )
        merged = merged.localCheckpoint(eager=True)
        frontier = merged.filter("__improved").select("__node", "cost")
        dist = merged.select("__node", "cost")
    e.unpersist()
    return dist.select(F.col("__node").alias(node), F.col("cost").alias("min_cost"))


def hits_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    decimals: int = 8,
) -> DataFrame:
    """HITS hubs-and-authorities over a directed bipartite edge list →
    (role, node, paths, score): role 'hub' scores source nodes, role
    'authority' scores destination nodes, after ``iterations`` rounds of
    the mutual-reinforcement recurrence a ← Aᵀh, h ← A a starting from
    h₀ ≡ 1.

    Parity-first formulation: iterations run UNNORMALIZED in bigint, so
    every intermediate is an exact integer — the number of alternating
    paths of the corresponding length ending at the node (h₀ = 1 makes
    a₁ the in-degree, h₁ the sum of neighbor in-degrees, and so on).
    Integer sums are associativity-free, so Spark's partial aggregation
    and any SQL oracle agree bit-for-bit — no per-iteration float
    normalization whose aggregation-order noise could flip a rounded
    digit. L1 normalization happens ONCE at the end (one exact-integer
    division per row, rounded to ``decimals``), and ranking ties break
    on the exact integer ``paths`` before node id.

    Magnitude bound, checked at the 100 TB design point: values grow ≤
    (max_deg)^iterations; with 3 iterations the worst term is
    in_deg²·out_deg·h₁ — for the order-graph battery use at sf1 that is
    ~10¹⁶ of bigint's 9.2·10¹⁸ headroom. For graphs hot enough to
    overflow, lower ``iterations`` or shift to the normalized-double
    variant (accepting per-iteration rounding pins).

    Scale posture mirrors ``pagerank``: edges dedupe and checkpoint once
    clustered on ``src``; each iteration is one src-keyed join + one
    dst-keyed map-side-combinable sum (then the transpose pair); score
    tables stay node-sized.

    Output coverage: hub rows cover nodes reachable as a SOURCE after
    the final iteration and authority rows nodes reachable as a
    DESTINATION — a dst-only node has hub score 0 by definition and is
    OMITTED from the hub rows rather than emitted with score 0 (and
    symmetrically for src-only nodes in the authority rows); left-join
    against a node table at the call site to densify if needed.
    """
    if iterations < 1:
        raise ValueError(f"hits_scores needs iterations >= 1, got {iterations}")
    dedup = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    # The edge dedup is the one fact-sized shuffle — checkpoint it once,
    # clustered on src (measured round-14: a fully-lazy e re-executed the
    # join+distinct under every iteration join — exchange reuse did NOT
    # close over the branches — 11.2 s for the output union vs ~2.5 s
    # with the checkpoint).
    e = dedup.repartition("src").localCheckpoint(eager=True)
    h = e.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(1).cast("long").alias("s")
    )
    a = None
    for _ in range(iterations):
        a = (
            e.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("s").cast("long").alias("s"))
            .withColumnRenamed("dst", "node")
        )
        h = (
            e.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("s").cast("long").alias("s"))
            .withColumnRenamed("src", "node")
        )
    # ONE materialization of both role tables in a single action —
    # node-sized. (Round-14 rework of the round-13 shape, which eagerly
    # checkpointed the authority AND hub tables and built a broadcast
    # total per branch: 5 sequential driver actions whose per-action
    # scheduling latency dominated the node-sized data — 6.9 s at sf0.1
    # vs 2.6 s for the r12 single-plan form. One action executes the
    # iteration chain over the checkpointed edges exactly once; the two
    # branches share everything up to the last authority table.)
    both = (
        a.select(F.lit("authority").alias("role"), "node", "s")
        .unionByName(h.select(F.lit("hub").alias("role"), "node", "s"))
        .localCheckpoint(eager=True)
    )
    # L1 totals: one bounded 2-row collect over the checkpoint, inlined
    # as plan literals (the pagerank count-literal pattern) — the same
    # exact long/long double division the 1-row crossJoin(broadcast)
    # carried, without the per-branch broadcast build jobs
    tots = {
        r["role"]: int(r["t"])
        for r in both.groupBy("role")
        .agg(F.sum("s").cast("long").alias("t"))
        .collect()
    }
    total = F.when(
        F.col("role") == "authority",
        F.lit(tots.get("authority", 0)).cast("long"),
    ).otherwise(F.lit(tots.get("hub", 0)).cast("long"))
    return both.select(
        "role",
        "node",
        F.col("s").alias("paths"),
        F.round(F.col("s") / total, decimals).alias("score"),
    )


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    symmetrize: bool = True,
    pre_deduped: bool = False,
) -> list[DataFrame]:
    """Fixed-round k-core peeling → list of per-round surviving edge
    DataFrames (round 1..rounds): each round drops nodes with degree < k
    and every edge touching them. A fixed round budget approximates the
    k-core fixpoint; two consecutive equal rounds prove the fixpoint was
    reached (peeling is monotone — the survivor sets only shrink).

    Degree is computed from the src side, which is only correct on a
    symmetric edge set — so by default the operator symmetrizes the
    input itself (union with the reversed edges). ``symmetrize=False``
    is for callers that already hold both directions. The edge set is
    deduplicated and materialized here by default: a multi-edge input
    would silently inflate degrees and yield wrong cores, so the
    precondition is enforced in code, not just the docstring.
    ``pre_deduped=True`` (only with ``symmetrize=False``) skips that
    dedup + checkpoint for callers whose edge table is ALREADY distinct
    and materialized — re-deduplicating an eager-checkpointed distinct
    edge list paid one full extra shuffle + copy of the largest table in
    the loop for nothing (round-13, guide §2.1); the precondition moves
    to the caller, so only pass it beside an explicit argument for why
    the input is distinct.

    Scale posture: one map-side-combinable degree aggregate + two
    node-keyed semi-joins per round on a monotonically shrinking edge
    list, checkpointed each round so the static plan stays linear in
    rounds. All-integer: exact cross-engine parity by construction.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if symmetrize:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    if pre_deduped:
        if symmetrize:
            raise ValueError(
                "kcore_peel: pre_deduped=True requires symmetrize=False "
                "(the symmetrizing union creates the duplicates the "
                "dedup exists to remove)"
            )
        sym = e
    else:
        sym = e.distinct().localCheckpoint(eager=True)
    out: list[DataFrame] = []
    for _ in range(rounds):
        keep = (
            sym.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select(F.col("src").alias("node"))
        )
        sym = (
            sym.join(keep.withColumnRenamed("node", "src"), "src")
            .join(keep.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        out.append(sym)
    return out

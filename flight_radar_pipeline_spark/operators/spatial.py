"""Spatial proximity without an all-pairs join: grid-cell bucketing.

Proximity self-joins ("every pair of points within R km") are the
spatial analogue of near-dup pair generation, and the same scale rule
applies: candidates must come from BUCKETS, never from a cross join.
The standard grid trick — snap each point to a lat/lon cell at least as
wide as the radius in every direction, then probe only the 3×3 cell
neighborhood — turns the O(n²) predicate into one equi-join whose
candidate volume is bounded by local point density.

Correctness guarantee: if every cell edge is >= the radius (in km, at
every latitude the data can reach), then any two points within the
radius land in the same or an adjacent cell, so the 3×3 probe misses
nothing — INCLUDING across the antimeridian: longitude cells are
indexed as ``pmod(floor((lon + 180) / cell_deg), n_lon)`` with
``n_lon = 360 / cell_deg`` cells around the globe, so the cell east of
lon +180 IS cell 0 and the probe neighborhood wraps. That wrap is only
coherent when ``cell_deg`` divides 360 into a whole number of
equal-width cells (a fractional seam cell would be narrower than the
radius, silently breaking adjacency), so ``geo_cell_pairs`` validates
divisibility and ``n_lon >= 3`` (with fewer than 3 lon cells the ±1
probe visits the same wrapped cell twice and pairs would duplicate).

Longitude degrees shrink with cos(lat), so the edge-width guarantee
must be checked at the MAX absolute latitude — ``geo_cell_pairs``
enforces that bound rather than silently under-covering near the poles.

100 TB posture: one explode (×9 on the probe side only), one equi-join
on (cell_x, cell_y), verification on candidates only. Urban-density
skew concentrates pairs in hot cells — that is data skew on the join
key, visible to ``operators.skew.skew_report`` and AQE, and cell size
is the knob (halving it quarters per-cell occupancy at the cost of a
wider probe pattern).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions.geo import haversine_km

_KM_PER_DEG = 111.195  # mean earth radius * pi / 180


def _validate_grid(radius_km: float, cell_deg: float, max_abs_lat: float) -> int:
    """Shared grid-coherence checks → the lon cell count ``n_lon``."""
    if max_abs_lat >= 90.0:
        raise ValueError(
            "geo_cell_pairs: max_abs_lat must be < 90 (longitude cells have "
            "zero width at the pole — no grid satisfies the radius there)"
        )
    narrowest_km = cell_deg * _KM_PER_DEG * math.cos(math.radians(max_abs_lat))
    if narrowest_km < radius_km:
        raise ValueError(
            f"geo_cell_pairs: cell_deg={cell_deg} gives {narrowest_km:.1f} km "
            f"cells at lat {max_abs_lat} — smaller than radius_km={radius_km}; "
            "the 3x3 probe would miss pairs. Grow cell_deg or bound the data."
        )
    n_lon_f = 360.0 / cell_deg
    n_lon = round(n_lon_f)
    if abs(n_lon_f - n_lon) > 1e-9:
        raise ValueError(
            f"geo_cell_pairs: cell_deg={cell_deg} does not divide 360 into "
            "equal cells — the seam cell at the antimeridian would be "
            "narrower than the radius guarantee allows. Pick a cell_deg "
            "that divides 360 (e.g. 0.5, 1, 2, 2.5, 3, 4, 5, ...)."
        )
    if n_lon < 3:
        raise ValueError(
            f"geo_cell_pairs: cell_deg={cell_deg} gives only {n_lon} "
            "longitude cells — the wrapped ±1 probe would visit a cell "
            "twice and duplicate pairs. Use cell_deg <= 120."
        )
    return n_lon


def geo_cell_pairs(
    points: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    cell_deg: float,
    max_abs_lat: float = 90.0,
) -> DataFrame:
    """All pairs of points within ``radius_km``, via grid-cell bucketing.

    Returns ``(id_a, id_b, distance_km)`` with ``id_a < id_b``, each
    qualifying pair exactly once: the left side explodes to its 3×3
    cell neighborhood, the right side keeps its home cell, and the
    ``id_a < id_b`` ordering keeps only one orientation (a pair's home
    cell appears in the other point's neighborhood at most once — the
    3 wrapped lon probe cells are distinct because ``n_lon >= 3``).

    ``cell_deg`` must give the adjacency guarantee at the data's
    latitude extreme: ``cell_deg * 111.195 * cos(max_abs_lat)`` (the
    narrowest edge a cell can have, km) must be >= ``radius_km``, and
    must divide 360 so the antimeridian wrap is seamless. Raises
    ``ValueError`` otherwise — a silently under-covered grid is a
    recall bug, not a tuning choice. Input longitudes are normalized to
    [-180, 180) first, so ``lon=180`` and ``lon=-180`` land in the same
    cell and pairs straddling the dateline are found.
    """
    n_lon = _validate_grid(radius_km, cell_deg, max_abs_lat)

    cx = F.floor(F.col(lat_col) / cell_deg).cast("long")
    # lon cell 0 starts at -180; pmod wraps any out-of-range longitude
    # (e.g. 180.0 ≡ -180.0) onto the same n_lon-cell ring
    cy = F.pmod(
        F.floor((F.col(lon_col) + F.lit(180.0)) / cell_deg).cast("long"),
        F.lit(n_lon),
    )
    base = points.select(
        F.col(id_col).alias("__id"),
        F.col(lat_col).cast("double").alias("__lat"),
        F.col(lon_col).cast("double").alias("__lon"),
        cx.alias("__cx"),
        cy.alias("__cy"),
    )
    probe = base.select(
        F.col("__id").alias("id_a"),
        F.col("__lat").alias("__lat_a"),
        F.col("__lon").alias("__lon_a"),
        F.explode(
            F.sequence(F.col("__cx") - 1, F.col("__cx") + 1)
        ).alias("__cx"),
        F.col("__cy").alias("__cy0"),
    ).select(
        "id_a",
        "__lat_a",
        "__lon_a",
        "__cx",
        # wrap the lon neighborhood: the cell east of the last ring cell
        # is cell 0, so dateline-straddling pairs share a probe cell
        F.explode(
            F.transform(
                F.sequence(F.col("__cy0") - 1, F.col("__cy0") + 1),
                lambda c: F.pmod(c, F.lit(n_lon)),
            )
        ).alias("__cy"),
    )
    home = base.select(
        F.col("__id").alias("id_b"),
        F.col("__lat").alias("__lat_b"),
        F.col("__lon").alias("__lon_b"),
        "__cx",
        "__cy",
    )
    dist = haversine_km(
        F.col("__lat_a"), F.col("__lon_a"), F.col("__lat_b"), F.col("__lon_b")
    )
    return (
        probe.join(home, ["__cx", "__cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance_km", dist)
        .filter(F.col("distance_km") <= F.lit(float(radius_km)))
        .select("id_a", "id_b", "distance_km")
    )


def geo_nearest_within(
    points: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    cell_deg: float,
    max_abs_lat: float = 90.0,
    tie_decimals: int = 6,
) -> DataFrame:
    """Each point's nearest OTHER point within ``radius_km`` →
    ``(id, nn_id, nn_km)``; points with no neighbor in range are absent
    (inner semantics — left-join against the input to keep them).

    Same grid device and adjacency guarantee as ``geo_cell_pairs``
    (``cell_deg`` is validated identically, including the antimeridian
    wrap), but candidates keep both orientations (each point must find
    ITS nearest, so the pair set is directed) and the argmin folds into
    one aggregate: ``min(struct(dist, nn_id))`` — distance first, id
    tiebreak, fully deterministic. The radius bound is what makes
    "nearest neighbor" grid-local and thus scalable: an unbounded NN
    would need expanding probes for isolated points — unbounded
    worst-case work per point.

    Distances are quantized to ``tie_decimals`` (default 1 mm) BEFORE
    the argmin so the id tiebreak — not last-bit float noise from a
    particular evaluation order of the haversine — decides between
    physically-equal candidates; any independent reimplementation (e.g.
    a SQL oracle) then agrees on the winner.
    """
    pairs = geo_cell_pairs(
        points, id_col, lat_col, lon_col, radius_km, cell_deg, max_abs_lat
    )
    directed = pairs.select(
        F.col("id_a").alias("id"),
        F.col("id_b").alias("__cand"),
        F.round("distance_km", tie_decimals).alias("__km"),
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("id"),
            F.col("id_a").alias("__cand"),
            F.round("distance_km", tie_decimals).alias("__km"),
        )
    )
    best = directed.groupBy("id").agg(
        F.min(F.struct(F.col("__km").alias("km"), F.col("__cand").alias("nn"))).alias("__best")
    )
    return best.select(
        "id",
        F.col("__best.nn").alias("nn_id"),
        F.col("__best.km").alias("nn_km"),
    )


def dbscan_core_labels(
    pairs: DataFrame,
    sym: DataFrame,
    ids: DataFrame,
    min_pts: int,
) -> DataFrame:
    """The core-point labeling subplan of ``geo_dbscan_clusters`` —
    degree filter → core–core CC (star contraction) → (id, cluster_id,
    'core') — factored out so the entry's grid-audit row can restate the
    plan that the operator's eager ``localCheckpoint`` hides from the
    final audited plan (the round-12 blind-spot discipline).

    Neighbor counts include the point itself (min_pts semantics match
    scikit-learn). ``deg`` only holds points with >= 1 pair, so
    ``min_pts <= 1`` short-circuits: every point (isolated ones
    included) has itself in its eps-neighborhood and is a core
    singleton."""
    if min_pts <= 1:
        core = ids
    else:
        deg = sym.groupBy(F.col("id_a").alias("id")).agg(
            (F.count(F.lit(1)) + 1).alias("n_in_eps")
        )
        core = deg.filter(F.col("n_in_eps") >= min_pts).select("id")
    core_edges = (
        pairs.join(core.withColumnRenamed("id", "id_a"), "id_a")
        .join(core.withColumnRenamed("id", "id_b"), "id_b")
        .select("id_a", "id_b")
    )
    from flight_radar_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    # star contraction, not label propagation: geographic eps-graphs are
    # long-diameter blobs (a connected coastline needs diameter rounds
    # under label prop; star contraction converges in O(log n) rounds)
    cc = connected_components_star(core_edges)  # (doc_id, cluster_id)
    return core.join(cc.withColumnRenamed("doc_id", "id"), "id", "left").select(
        "id",
        F.coalesce("cluster_id", F.col("id")).alias("cluster_id"),
        F.lit("core").alias("role"),
    )


def geo_dbscan_clusters(
    points: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    eps_km: float,
    min_pts: int,
    cell_deg: float,
    max_abs_lat: float = 90.0,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """DBSCAN over geographic points → (id, cluster_id, role): density
    clustering composed entirely from the library's bucketed primitives
    — ``geo_cell_pairs`` supplies every eps-neighborhood pair (grid
    equi-join, never all-pairs) and ``graph.connected_components``
    merges core points, so the classic algorithm inherits both scale
    postures unchanged.

    Semantics (standard DBSCAN, deterministic border attachment):
    - core: a point with ≥ ``min_pts`` neighbors within ``eps_km``
      (the point itself counts, matching scikit-learn).
    - clusters: connected components of the core–core eps-graph;
      ``cluster_id`` = min core id in the component (isolated cores —
      no core neighbor — form singleton clusters under their own id).
    - border: a non-core point within eps of ≥ 1 core joins its
      MINIMUM-cluster-id core neighbor (the arbitrary-assignment point
      of textbook DBSCAN pinned to a total order, so the labeling is
      partition/rerun/engine-invariant).
    - noise: everything else; returned with cluster_id NULL.

    Scale: one pair generation (grid-bounded), one |pairs| degree
    aggregate, CC on the core-core subgraph (label propagation,
    shallow geographic components), and two node-sized joins. The
    ``cell_deg`` adjacency contract is validated by ``geo_cell_pairs``
    (an undersized grid raises — silent recall loss is a bug).
    """
    ids = points.select(F.col(id_col).alias("id")).distinct()
    if pairs is None:
        pairs = geo_cell_pairs(
            points, id_col, lat_col, lon_col, eps_km, cell_deg, max_abs_lat
        )
    # callers that already computed (and e.g. counted, for min_pts
    # self-sizing) the eps-pair table pass it in — the grid join is the
    # second-most expensive stage and need not run twice
    pairs = pairs.select("id_a", "id_b")
    sym = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    core_labeled = dbscan_core_labels(pairs, sym, ids, min_pts)
    # three consumers below (border's lookup side, border's anti side,
    # the labeled union) — node-sized, materialize once so the CC +
    # degree pipeline doesn't execute under each branch (round-13,
    # guide §2.1); the hidden subplan stays auditable via
    # ``dbscan_core_labels`` in the entry's GRID_PLANS row
    core_labeled = core_labeled.localCheckpoint(eager=True)
    border = (
        sym.withColumnRenamed("id_a", "id")
        .join(
            core_labeled.select(
                F.col("id").alias("id_b"), F.col("cluster_id").alias("cid")
            ),
            "id_b",
        )
        .join(core_labeled.select("id"), "id", "left_anti")
        .groupBy("id")
        .agg(F.min("cid").alias("cluster_id"))
        .select("id", "cluster_id", F.lit("border").alias("role"))
    )
    labeled = core_labeled.unionByName(border)
    # every id is labeled at most once (core ids are distinct, border
    # excludes them and groups by id), so "noise = the unlabeled rest"
    # is one left join with a coalesce — not an anti-join branch PLUS a
    # union, which executed the labeled pipeline twice (round-13)
    return ids.join(labeled, "id", "left").select(
        "id",
        "cluster_id",
        F.coalesce("role", F.lit("noise")).alias("role"),
    )

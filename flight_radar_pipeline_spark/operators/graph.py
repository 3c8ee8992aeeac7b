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
grow exponentially. For web-scale graphs with long chains, swap the loop
body for the large-star/small-star algorithm (same harness, fewer
rounds); the API is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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

"""Large-star/small-star connected components: union-find parity and the
logarithmic-rounds property that motivates it over label propagation.

Label propagation moves the min label one hop per round, so a length-d
chain needs d rounds; star contraction re-points whole neighborhoods at
their minimum each round and converges in O(log n) practical rounds. The
100-node path is the adversarial case: diameter 99.
"""

from __future__ import annotations

import hashlib

from flight_radar_pipeline_spark.operators.graph import (
    connected_components,
    connected_components_star,
    star_contraction,
)


def _union_find(n_nodes: set[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {x: x for x in n_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id in component
    roots = {}
    for x in n_nodes:
        r = find(x)
        roots.setdefault(r, []).append(x)
    return {x: min(members) for r, members in roots.items() for x in members}


def _labels(df) -> dict[int, int]:
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


def test_path_graph_matches_union_find_in_log_rounds(spark):
    edges = [(i, i + 1) for i in range(99)]
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = _labels(connected_components_star(pairs))
    want = _union_find(set(range(100)), edges)
    assert got == want  # every node labeled 0
    _, rounds = star_contraction(pairs)
    # O(log n): a 100-node path must converge in far fewer rounds than
    # its diameter (99, what label propagation would need); observed 4-6
    assert rounds <= 10, f"path-100 took {rounds} star rounds"


def test_random_graph_matches_union_find(spark):
    # deterministic pseudo-random graph: md5-derived endpoints, 60 nodes
    edges = []
    for i in range(80):
        h = hashlib.md5(f"edge-{i}".encode()).hexdigest()
        a, b = int(h[:4], 16) % 60, int(h[4:8], 16) % 60
        if a != b:
            edges.append((a, b))
    nodes = {x for e in edges for x in e}
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = _labels(connected_components_star(pairs))
    want = _union_find(nodes, edges)
    assert got == want


def test_star_equals_label_prop_on_shallow_graphs(spark):
    # the near-dup shape: disjoint pairs, a triangle, a short chain
    edges = [(0, 1), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21), (21, 22)]
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    star = _labels(connected_components_star(pairs))
    prop = _labels(connected_components(pairs))
    assert star == prop

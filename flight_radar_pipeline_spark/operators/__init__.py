"""Scale-path operators the reference lacks: deduplication families and
similarity search — first-class components for training-data pipelines."""

from flight_radar_pipeline_spark.operators.dedup import (
    dedup_exact,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_pairs,
    shingles,
    simhash,
)
from flight_radar_pipeline_spark.operators.similarity import (
    cosine_similarity,
    hyperplane_signatures,
    topk_neighbors_bruteforce,
    topk_neighbors_lsh,
)

__all__ = [
    "dedup_exact",
    "shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "near_dup_pairs",
    "simhash",
    "cosine_similarity",
    "topk_neighbors_bruteforce",
    "hyperplane_signatures",
    "topk_neighbors_lsh",
]

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
from flight_radar_pipeline_spark.operators.packing import (
    pack_documents,
    pack_documents_firstfit,
)
from flight_radar_pipeline_spark.operators.similarity import (
    assign_cell,
    collect_centroids,
    cosine_near_dup_pairs,
    cosine_similarity,
    hyperplane_signatures,
    kmeans_centroids,
    probe_cells,
    topk_neighbors_bruteforce,
    topk_neighbors_ivf,
    topk_neighbors_lsh,
)
from flight_radar_pipeline_spark.operators.mining import (
    basket_association_rules,
    benford_digit_fit,
    blocked_fuzzy_pairs,
    gini_coefficient,
    km_survival,
    lag_autocorr,
)
from flight_radar_pipeline_spark.operators.lifecycle import (
    held,
    persisted_scope,
    release,
)
from flight_radar_pipeline_spark.operators.tfidf import bm25_scores, tfidf_top_terms

__all__ = [
    "basket_association_rules",
    "benford_digit_fit",
    "blocked_fuzzy_pairs",
    "gini_coefficient",
    "km_survival",
    "lag_autocorr",
    "dedup_exact",
    "shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "near_dup_pairs",
    "simhash",
    "cosine_similarity",
    "cosine_near_dup_pairs",
    "topk_neighbors_bruteforce",
    "hyperplane_signatures",
    "topk_neighbors_lsh",
    "topk_neighbors_ivf",
    "collect_centroids",
    "assign_cell",
    "probe_cells",
    "kmeans_centroids",
    "pack_documents",
    "pack_documents_firstfit",
    "tfidf_top_terms",
    "bm25_scores",
    "held",
    "persisted_scope",
    "release",
]

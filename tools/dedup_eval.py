"""Sketch-family dedup recall evaluation against an exact baseline.

Ground truth: the exact word-3-gram Jaccard pairs (τ = 0.5) from the
inverted-index operator — no sketching, exact verification. Each sketch
family (MinHash-LSH over k=8 word shingles, SimHash Hamming ≤ 3) then
reports how much of that exact pair set it surfaces (recall vs truth)
and how much of its own output lies inside it (agreement). The families
measure *different* similarity functions, so agreement < 1 is expected —
the number that matters operationally is recall: "of the pairs an exact
pass would flag, how many does the cheap sketch pass catch?"

Usage: python tools/dedup_eval.py [sf_dir]   (default /root/testdata/sf0.01)
Prints one JSON line; paste-ready markdown after it.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flight_radar_pipeline_spark.operators import dedup as D
from flight_radar_pipeline_spark.session import get_spark_session
from flight_radar_pipeline_spark.sources.readers import load_table


def pair_sets(spark, sf_dir: str) -> dict[str, set[tuple[int, int]]]:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def pairs(df) -> set[tuple[int, int]]:
        return {(r[0], r[1]) for r in df.select("id_a", "id_b").collect()}

    return {
        "exact_3gram_jaccard": pairs(
            D.ngram_jaccard_pairs(docs, n=3, jaccard_threshold=0.5)
        ),
        "minhash_lsh": pairs(
            D.near_dup_pairs(docs, jaccard_threshold=0.5)
        ),
        "simhash_h3": pairs(D.simhash_near_dup_pairs(docs, max_hamming=3)),
    }


def embedding_pair_sets(spark, sf_dir: str) -> dict[str, set[tuple[int, int]]]:
    """Exact cosine pairs (brute force over all vector pairs, DuckDB) vs
    the multi-table sign-LSH candidate pipeline at the battery's
    parameters — measures what the bucketed candidate generation loses
    against the corpus product it refuses to materialize."""
    import duckdb

    from flight_radar_pipeline_spark.operators import similarity as S

    threshold = 0.35
    con = duckdb.connect()
    con.sql(
        f"create view embeddings as select * from '{sf_dir}/embeddings.parquet'"
    )
    exact = {
        (a, b)
        for a, b in con.sql(f"""
            with v as (
                select vec_id, embedding::DOUBLE[] as e,
                       sqrt(list_inner_product(embedding::DOUBLE[],
                                               embedding::DOUBLE[])) as n
                from embeddings
            )
            select a.vec_id, b.vec_id
            from v a join v b on a.vec_id < b.vec_id
            where round(list_inner_product(a.e, b.e) / (a.n * b.n), 6)
                  >= {threshold}
        """).fetchall()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    lsh = {
        (r.id_a, r.id_b)
        for r in S.cosine_near_dup_pairs(
            emb, threshold=threshold, num_tables=4, planes_per_table=4,
            n_dims=64,
        ).collect()
    }
    return {"exact_cosine": exact, "cosine_lsh_4x4": lsh}


def evaluate(sets: dict[str, set]) -> dict:
    truth = sets["exact_3gram_jaccard"]
    out = {"n_truth_pairs": len(truth)}
    for fam in ("minhash_lsh", "simhash_h3"):
        found = sets[fam]
        inter = len(found & truth)
        out[fam] = {
            "n_pairs": len(found),
            "recall_vs_truth": round(inter / len(truth), 4) if truth else None,
            "agreement": round(inter / len(found), 4) if found else None,
        }
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark_session(app_name="dedup-eval", timezone="UTC")
    spark.sparkContext.setLogLevel("ERROR")
    report = evaluate(pair_sets(spark, sf_dir))
    esets = embedding_pair_sets(spark, sf_dir)
    exact, lsh = esets["exact_cosine"], esets["cosine_lsh_4x4"]
    inter = len(lsh & exact)
    report["embedding_cosine_lsh"] = {
        "n_exact_pairs": len(exact),
        "n_lsh_pairs": len(lsh),
        "recall_vs_exact": round(inter / len(exact), 4) if exact else None,
        # verified candidates can never exceed threshold-failures: the
        # pipeline's exact-cosine verify makes precision 1.0 by design
        "precision": round(inter / len(lsh), 4) if lsh else None,
    }
    print(json.dumps({"dedup_eval": report, "sf_dir": sf_dir}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

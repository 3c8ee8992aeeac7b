"""Exact distributed heavy hitters: Misra–Gries candidates + verify pass.

The classic two-pass frequent-items scheme (Misra & Gries 1982; merge
soundness from Agarwal et al. 2012, "Mergeable Summaries"): pass 1 runs a
k-counter Misra–Gries summary per partition — any term whose GLOBAL count
exceeds n/(k+1) must exceed n_p/(k+1) in at least one partition (the
threshold is linear in partition length, so pigeonhole applies), and MG
keeps every such term — so the union of per-partition summaries is a
guaranteed superset of the true heavy hitters. Pass 2 exact-counts ONLY
those candidates and filters by the true threshold, which removes every
false positive. The output is therefore EXACT and partition-layout
independent: precisely the terms with count > n/(k+1), with their exact
counts — which is what makes the operator SQL-oracle-able even though the
sketch pass is approximate.

Scale posture (100 TB): pass 1 is map-only (no shuffle, fixed k counters
per partition, Arrow-batched) and also carries each partition's token
count, so the global total needs no extra scan; the candidate set is
≤ k · n_partitions rows — the bounded broadcast-literal class, folded
into pass 2 as a codegen'd IN-set predicate; pass 2's groupBy therefore
shuffles only candidate occurrences, never the full vocabulary. Compare
a naive `groupBy(term).count().filter(...)`: correct but shuffles the
ENTIRE token stream's vocabulary; this shape shuffles only what can
possibly qualify. Two scans total.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions.text import tokens


def _mg_partition_summaries(k: int):
    """mapInPandas body: one Misra–Gries summary (≤ k counters) per
    partition. Emits candidate rows (term, NULL) plus one partition-count
    row (NULL, n_p) so the caller can derive the global total without a
    second full scan."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_part = 0
        for batch in batches:
            for term in batch["term"]:
                n_part += 1
                if term in counters:
                    counters[term] += 1
                elif len(counters) < k:
                    counters[term] = 1
                else:
                    # decrement-all step, dropping zeroed counters
                    dead = []
                    for t in counters:
                        counters[t] -= 1
                        if counters[t] == 0:
                            dead.append(t)
                    for t in dead:
                        del counters[t]
        yield pd.DataFrame(
            {
                "term": list(counters.keys()) + [None],
                "n_part": [None] * len(counters) + [n_part],
            }
        )

    return summarize


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    k: int = 30,
) -> DataFrame:
    """Terms with exact global count > n/(k+1) → (term, n_occ, n_total).

    Output is exact and deterministic under any partitioning (see module
    docstring); ordered (n_occ desc, term asc) for a total order.
    """
    tok = df.select(F.explode(tokens(text_col)).alias("term"))
    # Pass 1 (one scan): the summary output is ≤ k·n_partitions candidate
    # rows + n_partitions count rows — the bounded broadcast-literal class
    # (like k-means centroid collects), so it folds into pass 2's plan as
    # a literal IN-set + threshold instead of a second live subtree that
    # would re-run the scan per consumer.
    rows = tok.mapInPandas(
        _mg_partition_summaries(k), "term string, n_part bigint"
    ).collect()
    candidates = sorted({r["term"] for r in rows if r["term"] is not None})
    n_total = sum(r["n_part"] for r in rows if r["n_part"] is not None)
    # Pass 2 (one scan): exact counts of candidates only
    return (
        tok.filter(F.col("term").isin(candidates))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") * (k + 1) > F.lit(n_total))
        .select("term", "n_occ", F.lit(n_total).alias("n_total"))
        .orderBy(F.desc("n_occ"), F.asc("term"))
    )

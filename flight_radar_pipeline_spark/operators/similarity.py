"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs them:

- **Brute-force top-k** — exact cosine against every corpus vector.
  Correctness baseline and perfectly adequate when the query set is small:
  queries broadcast, corpus scanned once, per-query top-k via window.
- **LSH-bucketed ANN** — random-hyperplane signatures (deterministic,
  hash-derived planes), candidates restricted to matching buckets. The
  scale path: the corpus side is signed in one scan, bucket join replaces
  the cross product.

All vector math is native (``zip_with``/``aggregate`` over array<double>),
verified bit-exact against DuckDB's list functions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns, computed in double
    (element-wise cast) with left-to-right summation — the association
    order DuckDB's ``list_cosine_similarity`` also uses, so results match
    bit-for-bit."""
    ad, bd = a.cast("array<double>"), b.cast("array<double>")
    return _dot(ad, bd) / (F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd)))


def topk_neighbors_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector →
    (query_id, neighbor_id, cosine), excluding self-matches.

    Scale: broadcast the query set (small by construction), single corpus
    scan, per-query top-k via window over (rounded cosine, id) — the
    rounding makes ranking deterministic across engines at equal scores.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(cosine_similarity(F.col("__qvec"), F.col("__cvec")), decimals),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _plane_component_value(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-7.5, 7.5]:
    the value of the first hex nibble of md5(plane || '-' || dim), centered.
    The SQL oracle derives the identical value (same md5 + CASE nibble
    mapping), so signatures are engine-portable."""
    import hashlib

    nib = int(hashlib.md5(f"{plane}-{dim}".encode()).hexdigest()[0], 16)
    return float(nib) - 7.5


def _n_dims(df: DataFrame, vec_col: str) -> int:
    return df.select(F.size(F.col(vec_col)).alias("d")).limit(1).first().d


def _plane_bits(vec: Column, planes: list[list[float]]) -> list[Column]:
    """One sign bit per plane, each a per-row ``zip_with``/``aggregate`` dot
    against the plane's component literals — pure projection, no explode, no
    join, no shuffle. The plane table is tiny (planes × dims doubles) and
    folds into the expression tree as array literals; summation is strictly
    left-to-right, so bits are deterministic under any partitioning.

    This replaces the round-1 relational form (posexplode → broadcast join
    on dim → groupBy(id, plane)), which shuffled corpus × dims rows per
    signature build — ~800 rows per document at 768 dims. Per-row cost is
    identical arithmetic (planes × dims multiply-adds); the shuffle is gone.
    """
    bits = []
    for row in planes:
        comp = F.array(*[F.lit(c) for c in row])
        dot = F.aggregate(
            F.zip_with(vec, comp, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append((dot > 0).cast("int").cast("string"))
    return bits


def hyperplane_signatures(
    df: DataFrame,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH signature per vector → (id, signature string of 0/1),
    computed as one narrow projection over the input (see ``_plane_bits``)."""
    n_dims = _n_dims(df, vec_col)
    planes = [
        [_plane_component_value(p, d) for d in range(n_dims)]
        for p in range(num_planes)
    ]
    vec = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col), F.concat(*_plane_bits(vec, planes)).alias("signature")
    )


def multitable_signatures(
    df: DataFrame,
    num_tables: int = 4,
    planes_per_table: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-table sign-LSH signatures → (id, table, signature).

    ``num_tables`` independent hash tables of ``planes_per_table`` planes
    each (plane p belongs to table p div planes_per_table). Multiple short
    tables trade precision for recall: a pair colliding in ANY table
    becomes a candidate — the cosine analogue of MinHash banding.

    Signatures are per-row expressions (``_plane_bits``); the only
    non-projection step is a ``posexplode`` of the ``num_tables``-element
    signature array per row — a bounded row multiplier, not a shuffle.
    """
    n_dims = _n_dims(df, vec_col)
    total = num_tables * planes_per_table
    planes = [
        [_plane_component_value(p, d) for d in range(n_dims)] for p in range(total)
    ]
    vec = F.col(vec_col).cast("array<double>")
    bits = _plane_bits(vec, planes)
    table_sigs = [
        F.concat(*bits[t * planes_per_table : (t + 1) * planes_per_table])
        for t in range(num_tables)
    ]
    return df.select(
        F.col(id_col),
        F.posexplode(F.array(*table_sigs)).alias("table", "signature"),
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.35,
    num_tables: int = 4,
    planes_per_table: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs → (id_a, id_b, cosine),
    id_a < id_b, cosine ≥ threshold, candidates from multi-table sign-LSH.

    The dedup-shaped use of similarity search: pairs colliding in any of
    the LSH tables are verified with the exact cosine; the corpus-wide
    cross product never materializes. Recall rises with ``num_tables``
    (union of candidates) — the knob a 100 TB embedding-dedup job tunes.
    """
    sigs = multitable_signatures(df, num_tables, planes_per_table, id_col, vec_col)
    left = sigs.select(F.col(id_col).alias("id_a"), "table", "signature")
    right = sigs.select(F.col(id_col).alias("id_b"), "table", "signature")
    cands = (
        left.join(right, ["table", "signature"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # normalize once per vector (one corpus pass), so the per-pair verify
    # is a single dot product instead of dot + two norms — the candidate
    # verify is the dominant cost and this cuts its arithmetic 3×
    vd = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(_dot(vd, vd))
    unit = df.select(
        F.col(id_col),
        F.transform(vd, lambda x: x / norm).alias("__unit"),
    )
    va = unit.select(F.col(id_col).alias("id_a"), F.col("__unit").alias("__va"))
    vb = unit.select(F.col(id_col).alias("id_b"), F.col("__unit").alias("__vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("__va"), F.col("__vb")), decimals),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def topk_neighbors_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """IVF-style ANN → (query_id, neighbor_id, cosine): the corpus is
    partitioned into ``num_centroids`` cells by nearest centroid; each
    query probes its ``nprobe`` nearest cells and ranks exactly within
    them.

    The coarse quantizer here is deterministic (the first
    ``num_centroids`` corpus vectors by id) so the whole operator has an
    exact SQL oracle; a production build swaps in k-means centroids — the
    cell-assignment, probe, and in-cell search plans are unchanged. Scale:
    centroids broadcast twice (tiny), assignment is one corpus scan + a
    window, and search shuffles only probed cells — corpus never
    self-joins. Assignment/probe similarities are rounded before ranking
    so cell choices are engine-portable.
    """
    cents = corpus.filter(F.col(id_col) < num_centroids).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("__cent")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nvec")
    )
    w_assign = Window.partitionBy("neighbor_id").orderBy(
        F.desc("sim"), F.asc("cent_id")
    )
    assign = (
        c.crossJoin(F.broadcast(cents))
        .withColumn(
            "sim", F.round(cosine_similarity(F.col("__nvec"), F.col("__cent")), decimals)
        )
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select("neighbor_id", F.col("cent_id").alias("cell"), "__nvec")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cent_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "sim", F.round(cosine_similarity(F.col("__qvec"), F.col("__cent")), decimals)
        )
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", F.col("cent_id").alias("cell"), "__qvec")
    )
    scored = (
        probes.join(assign, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(cosine_similarity(F.col("__qvec"), F.col("__nvec")), decimals),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def topk_neighbors_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """ANN: per query, exact top-k among corpus vectors sharing its
    hyperplane signature bucket → (query_id, neighbor_id, cosine).

    Recall is governed by num_planes (fewer planes → bigger buckets →
    higher recall, more work). The bucket equi-join is the scale win: the
    cross product never materializes.
    """
    sig_c = hyperplane_signatures(corpus, num_planes, id_col, vec_col)
    sig_q = hyperplane_signatures(queries, num_planes, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    ).join(sig_c.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    ).join(sig_q.withColumnRenamed(id_col, "query_id"), "query_id")
    scored = (
        c.join(F.broadcast(q), "signature")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(cosine_similarity(F.col("__qvec"), F.col("__cvec")), decimals),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )

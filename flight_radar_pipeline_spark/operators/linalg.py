"""Distributed linear algebra on embedding columns: power iteration.

Top-principal-direction extraction is the building block behind PCA
whitening, spectral outlier detection, and embedding-drift monitoring in
training-data pipelines. Spark's ML package covers this only via RDD
RowMatrix; here it's pure DataFrame algebra so it composes with the rest
of the engine (and has an exact SQL oracle).

Power iteration on the uncentered second-moment matrix: v₀ is a fixed
md5-seeded unit vector; each step computes v ← normalize(Σᵣ xᵣ·(xᵣ·v)),
i.e. one pass computing per-row dots against the broadcast current
vector, then ONE global aggregate with 64 sum expressions — the same
shuffle-free wide-aggregate shape as ``embedding_dim_stats``. No
per-dimension explode, no windows, no driver actions; each iteration is
exactly one scan of the vector table.

Sign convention: the dominant eigenvector is defined up to ±; the
returned vector is flipped so its component sum is non-negative, making
the output engine- and seed-stable.

Assumes dense, non-null, fixed-width vectors (``zip_with`` propagates
nulls by design — see ``similarity.py``).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rounding import np_round_half_up


def _bq(name: str) -> str:
    """Backtick-quote an identifier for interpolation into parsed SQL
    fragments — embedded backticks double, per the SQL parser's escape —
    so caller-provided column names that need quoting (spaces, hyphens,
    keywords) behave exactly as ``F.col(name)`` did before the round-13
    parsed-SQL construction rewrites (round-14 ADVICE)."""
    return "`" + name.replace("`", "``") + "`"


def _seed_vector(n_dims: int, salt: str = "pca") -> list[float]:
    """Deterministic unit-norm init: component i is the first md5 nibble
    of ``{salt}-{i}`` centered at 7.5 — reproducible in any engine with
    md5 (the oracle states the same values in SQL)."""
    raw = [
        int(hashlib.md5(f"{salt}-{i}".encode()).hexdigest()[0], 16) - 7.5
        for i in range(n_dims)
    ]
    norm = sum(c * c for c in raw) ** 0.5
    return [c / norm for c in raw]


def _normalize(vec_df: DataFrame, col: str = "vraw") -> DataFrame:
    """1-row (vraw: array<double>) → (v) unit-normalized. The norm is
    materialized as a column BEFORE the transform lambda (HOF lambdas
    re-evaluate embedded outer expressions per element)."""
    norm = F.sqrt(
        F.aggregate(F.col(col), F.lit(0.0), lambda acc, e: acc + e * e)
    )
    return vec_df.select(F.col(col), norm.alias("__norm")).select(
        F.transform(col, lambda e: e / F.col("__norm")).alias("v")
    )


def top_principal_component(
    vectors: DataFrame,
    vec_col: str = "embedding",
    n_dims: int = 64,
    iterations: int = 3,
    decimals: int = 6,
) -> DataFrame:
    """Dominant eigenvector of XᵀX by ``iterations`` rounds of power
    iteration → (dim, loading), loadings rounded in-plan. Each round:
    broadcast the 1-row current vector, dot it against every row
    (``zip_with``/``aggregate`` fold), then one global aggregate of
    ``n_dims`` sums re-assembles the next vector.

    Construction-cost note (round-13, guide §1.3): the per-dimension sum
    expressions are built as ONE parsed SQL string per iteration (the
    codeword-table trick from the ANN family) instead of ``n_dims``
    nested Column operations — the py4j round-trips of ~200 Column calls
    per iteration dominated the entry's wall (3.2 s of pure plan
    construction, 1 Spark job). The parsed expressions are identical, so
    the evaluated plan — and every rounded loading — is unchanged."""
    x = vectors.select(
        F.transform(F.col(vec_col), lambda e: e.cast("double")).alias("x")
    )
    v = None
    for it in range(iterations):
        if it == 0:
            seed_sql = ", ".join(f"{c!r}D" for c in _seed_vector(n_dims))
            rows = x.select("x", F.expr(f"array({seed_sql})").alias("v"))
        else:
            rows = x.crossJoin(F.broadcast(v))
        dotted = rows.select(
            "x",
            F.aggregate(
                F.zip_with("x", "v", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, e: acc + e,
            ).alias("__dot"),
        )
        sums_sql = ", ".join(
            f"sum(x[{i}] * __dot)" for i in range(n_dims)
        )
        c = dotted.agg(F.expr(f"array({sums_sql})").alias("vraw"))
        v = _normalize(c)
    sgn = F.when(
        F.aggregate("v", F.lit(0.0), lambda acc, e: acc + e) < 0, F.lit(-1.0)
    ).otherwise(F.lit(1.0))
    return (
        v.select("v", sgn.alias("__sgn"))
        .select(F.posexplode("v").alias("dim", "__val"), "__sgn")
        .select(
            F.col("dim").cast("bigint").alias("dim"),
            F.round(F.col("__sgn") * F.col("__val"), decimals).alias("loading"),
        )
    )


def int8_quantization_error(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_dims: int = 64,
    decimals: int = 10,
) -> DataFrame:
    """Per-vector reconstruction MSE of symmetric-range int8 scalar
    quantization → (id, mse): each dimension maps its corpus [min, max]
    onto 256 levels (floor(v·255 + 0.5) — floor-plus-half instead of
    round() so the bit pattern is identical across engines' half-rounding
    modes), is dequantized, and the squared error averages over dims.

    The storage/serving question ANN indexes answer with int8: 4× smaller
    vectors at what recall-relevant error. Scale: per-dim ranges come
    from ONE global aggregate (2·n_dims min/max exprs, map-side partials,
    no shuffle of the table), broadcast back as two array literals-
    equivalent columns; the quantize/dequantize/error math is pure
    per-row array expressions at scan speed.

    Degenerate dimensions (min == max) quantize to level 0 and contribute
    zero error on both engines.
    """
    # both per-dim range arrays built as parsed SQL literals (round-13,
    # guide §1.3 construction fix — identical expressions, no per-dim
    # py4j Column round-trips); the interpolated identifier is
    # backtick-quoted so names F.col handled (spaces, keywords) keep
    # working (round-14 ADVICE)
    vq = _bq(vec_col)
    mins_sql = ", ".join(
        f"min(cast({vq}[{i}] as double))" for i in range(n_dims)
    )
    maxs_sql = ", ".join(
        f"max(cast({vq}[{i}] as double))" for i in range(n_dims)
    )
    stats = vectors.agg(
        F.expr(f"array({mins_sql})").alias("__mn"),
        F.expr(f"array({maxs_sql})").alias("__mx"),
    )
    x = vectors.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda e: e.cast("double")).alias("__x"),
    ).crossJoin(F.broadcast(stats))

    def err(xi, mm):
        mn, mx = mm["__mn"], mm["__mx"]
        scale = mx - mn
        q = F.least(
            F.greatest(
                F.floor((xi - mn) / scale * 255 + 0.5) - 128, F.lit(-128)
            ),
            F.lit(127),
        )
        deq = mn + (q + 128).cast("double") / 255.0 * scale
        e = F.when(scale == 0, F.lit(0.0)).otherwise(xi - deq)
        return e * e

    sq = F.zip_with("__x", F.arrays_zip("__mn", "__mx"), err)
    return x.select(
        id_col,
        F.round(
            F.aggregate(sq, F.lit(0.0), lambda acc, e: acc + e) / n_dims,
            decimals,
        ).alias("mse"),
    )


def pq_reconstruction_error(
    vectors: DataFrame,
    n_dims: int = 64,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
    impl: str = "arrow",
    books: list | None = None,
) -> DataFrame:
    """Product-quantization audit → (id, code0..code{m-1}, mse): the
    vector splits into ``m`` subspaces, each quantized to one of ``k``
    codewords from a deterministic spherical k-means codebook
    (``similarity.kmeans_centroids`` per subspace — cosine assignment,
    matching the engine's cosine ANN stack), and the L2 reconstruction
    error averages over all dims. log2(k)·m bits per vector — the
    compression step after int8 (``int8_quantization_error``) in an ANN
    serving stack.

    Scale posture: codebooks are m bounded driver collects (k × sub-dim
    floats each, the broadcast-literal class); the audit is one
    shuffle-free scan. ``impl="arrow"`` (default) computes codes +
    reconstruction as numpy per Arrow batch — one matmul-class pass, the
    production path (interpreted HOF folds cost ~m·k·sub lambda calls
    per row); ``impl="expr"`` is the pure-expression reference,
    bit-portable to the SQL oracle's stated fold order. Same
    association-order safety argument as ``similarity._rounded_sims``:
    rounding quanta sit ten orders above matmul reordering noise, and
    the impls are asserted identical in tests.
    """
    from flight_radar_pipeline_spark.operators.similarity import (
        assign_cell,
        train_pq_codebooks,
    )

    sub = n_dims // m
    vd = F.transform(F.col(vec_col), lambda e: e.cast("double"))
    if books is None:
        books = train_pq_codebooks(
            vectors, m=m, codebook_k=k, iters=iters,
            id_col=id_col, vec_col=vec_col, n_dims=n_dims,
        )

    if impl == "arrow":
        from pyspark.sql.functions import pandas_udf

        import numpy as np

        mats = [np.array([v for _, v in b], dtype=np.float64) for b in books]
        norms = [np.sqrt((c * c).sum(axis=1)) for c in mats]
        fields = ", ".join(f"code{s} bigint" for s in range(m))

        @pandas_udf(f"struct<{fields}, mse double>")
        def audit(vecs):
            import pandas as pd

            x = np.array(vecs.tolist(), dtype=np.float64)
            out = {}
            err = np.zeros(len(x))
            for s in range(m):
                xs = x[:, s * sub : (s + 1) * sub]
                vn = np.sqrt((xs * xs).sum(axis=1))
                sims = (xs @ mats[s].T) / (vn[:, None] * norms[s][None, :])
                sims = np_round_half_up(sims, decimals)
                codes = np.argmax(sims, axis=1)
                out[f"code{s}"] = codes
                diff = xs - mats[s][codes]
                err += (diff * diff).sum(axis=1)
            out["mse"] = np_round_half_up(err / n_dims, decimals)
            return pd.DataFrame(out)

        q = audit(F.col(vec_col))
        return vectors.select(
            F.col(id_col),
            *[q[f"code{s}"].alias(f"code{s}") for s in range(m)],
            q["mse"].alias("mse"),
        )

    out_cols = [F.col(id_col)]
    err_total = None
    for s in range(m):
        subvec = F.slice(vd, s * sub + 1, sub)
        cell = assign_cell(subvec, books[s], decimals)
        cents_arr = F.array(
            *[F.array(*[F.lit(float(x)) for x in v]) for _, v in books[s]]
        )
        recon = F.element_at(cents_arr, (cell + 1).cast("int"))
        sq = F.zip_with(subvec, recon, lambda a, b: (a - b) * (a - b))
        e_s = F.aggregate(sq, F.lit(0.0), lambda acc, e: acc + e)
        err_total = e_s if err_total is None else err_total + e_s
        out_cols.append(cell.cast("bigint").alias(f"code{s}"))
    out_cols.append(F.round(err_total / n_dims, decimals).alias("mse"))
    return vectors.select(*out_cols)


def second_moment_matrix(
    vectors: DataFrame,
    vec_col: str = "embedding",
    n_dims: int = 64,
) -> list[list[float]]:
    """Uncentered second-moment matrix E[xxᵀ] as a driver-side
    ``n_dims × n_dims`` list. Two-level aggregation: ``mapInPandas``
    reduces each Arrow batch to ONE row holding its partial XᵀX (a numpy
    matmul — n_dims² interpreted product-expressions per input row was
    ~10× slower, the usual arrow-vs-HOF gap), then n_dims² column sums
    combine the handful of batch rows. Map-side partials, no shuffle of
    the table; the result is n_dims² floats — the bounded
    broadcast-literal class, like a codebook or centroid collect."""

    def batch_moments(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            mat = x.T @ x
            yield pd.DataFrame(
                {"m": [mat.reshape(-1)], "n": [np.int64(len(x))]}
            )

    parts = vectors.select(
        F.transform(F.col(vec_col), lambda e: e.cast("double")).alias(vec_col)
    ).mapInPandas(batch_moments, "m array<double>, n bigint")
    # One fold expression, not n_dims² aggregate columns (4096 agg exprs
    # cost ~25s of Catalyst analysis alone): element-wise-add the per-batch
    # partial matrices. Single-reducer over #batches rows of n_dims²
    # doubles — at cluster scale this is the treeReduce-shaped step, sized
    # by task count, not data volume.
    row = parts.agg(
        F.aggregate(
            F.collect_list("m"),
            F.array_repeat(F.lit(0.0), n_dims * n_dims),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("m"),
        F.sum("n").alias("n"),
    ).first()
    total = float(row["n"])
    cov = [
        [row["m"][i * n_dims + j] / total for j in range(n_dims)]
        for i in range(n_dims)
    ]
    return cov


def opq_rotation(
    cov: list[list[float]],
    n_dims: int = 64,
    m: int = 4,
) -> list[list[float]]:
    """OPQ-NP rotation (Ge et al. 2013, "Optimized Product Quantization",
    non-parametric init): eigendecompose the second-moment matrix, then
    allocate eigen-directions to the ``m`` subspaces ROUND-ROBIN in
    descending-eigenvalue order (subspace s takes directions s, s+m,
    s+2m, …), so every subspace holds a comparable variance slice — the
    paper's simple balanced allocation. Returns the rotation R
    (columns = permuted eigenvectors) as a plain list — the 64×64 driver
    matrix is O(n_dims³) flops, data-volume-independent.

    Sign convention: each eigenvector is flipped so its component sum is
    non-negative (same rule as ``top_principal_component``), making R
    deterministic up to eigh's ordering of near-degenerate eigenvalues.
    """
    import numpy as np

    w, v = np.linalg.eigh(np.array(cov, dtype=np.float64))
    order = np.argsort(-w)
    v = v[:, order]
    flip = np.where(v.sum(axis=0) < 0, -1.0, 1.0)
    v = v * flip[None, :]
    perm = [d for s in range(m) for d in range(s, n_dims, m)]
    return [[float(c) for c in row] for row in v[:, perm]]


def rotate_vectors(
    vectors: DataFrame,
    rotation: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    impl: str = "arrow",
) -> DataFrame:
    """Apply an orthonormal rotation Rᵀx to every vector → (id, vec_col).
    ``impl="arrow"`` (default): one numpy matmul per Arrow batch — the
    production path for a dense n_dims² rotation. ``impl="expr"``: the
    pure-expression reference (n_dims dot-product folds against column
    literals) for engine-portability tests; costs n_dims² lambda calls
    per row interpreted."""
    n_dims = len(rotation)
    if impl == "arrow":
        from pyspark.sql.functions import pandas_udf

        import numpy as np

        R = np.array(rotation, dtype=np.float64)

        @pandas_udf("array<double>")
        def rot(vecs):
            import pandas as pd

            x = np.array(vecs.tolist(), dtype=np.float64)
            return pd.Series(list(x @ R))

        return vectors.select(
            F.col(id_col), rot(F.col(vec_col)).alias(vec_col)
        )
    x = F.transform(F.col(vec_col), lambda e: e.cast("double"))
    cols = []
    for j in range(n_dims):
        col_lits = F.array(*[F.lit(rotation[i][j]) for i in range(n_dims)])
        cols.append(
            F.aggregate(
                F.zip_with(F.col("__x"), col_lits, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, e: acc + e,
            )
        )
    return vectors.select(F.col(id_col), x.alias("__x")).select(
        F.col(id_col), F.array(*cols).alias(vec_col)
    )


def opq_reconstruction_error(
    vectors: DataFrame,
    n_dims: int = 64,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """``pq_reconstruction_error`` with the OPQ-NP rotation ahead of the
    subspace split: second-moment aggregate (one scan) → driver eigh +
    greedy eigenvalue allocation → rotate (Arrow matmul) → the identical
    PQ audit on the rotated corpus. Rotation is orthonormal, so the
    reported MSE is directly comparable to the raw PQ audit's; measured
    at sf0.01 the rotation cuts mean MSE ~3.6% (0.012782 → 0.012324,
    asserted in tests/test_opq.py — modest because the synthetic corpus
    is near-isotropic; the eigenvalue spread at 100 TB real-embedding
    scale is where OPQ pays).

    No SQL oracle: the eigendecomposition is not SQL-expressible, so the
    battery entry is rows-only at the driver gate; accuracy evidence is
    the improvement test against the hash-checked raw-PQ twin."""
    from pyspark import StorageLevel

    cov = second_moment_matrix(vectors, vec_col, n_dims)
    rot = opq_rotation(cov, n_dims, m)
    # materialize the rotation ONCE: the PQ audit's codebook training
    # re-scans its input every Lloyd's pass, and without the persist each
    # pass re-runs the rotation pandas_udf over the whole corpus
    # (measured at sf0.1: audit-on-rotated 6.1 s unpersisted vs the raw
    # audit's 3.3 s; persisted, the rotation is paid once). Same
    # materialize-the-expensive-projection knob as the dedup signature
    # tables; at 100 TB the persisted frame is the rotated copy a real
    # OPQ pipeline writes to storage between training and encoding.
    rotated = rotate_vectors(vectors, rot, vec_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return pq_reconstruction_error(
        rotated,
        n_dims=n_dims,
        m=m,
        k=k,
        iters=iters,
        id_col=id_col,
        vec_col=vec_col,
        decimals=decimals,
    )


def jl_sign_matrix(n_dims: int, out_dims: int, salt: str = "jl") -> list[list[int]]:
    """Deterministic ±1 Johnson–Lindenstrauss projection matrix: sign of
    output dim j × input dim d = +1 iff the first md5 nibble of
    ``{salt}-{j}-{d}`` is ≥ 8 — reproducible in any engine with md5, so
    an oracle can restate the SAME matrix as literals. Achlioptas
    (2001): ±1/√k entries satisfy the JL guarantee; the 1/√k scale is
    applied by :func:`jl_project` so the matrix itself stays integer."""
    return [
        [
            1
            if int(
                hashlib.md5(f"{salt}-{j}-{d}".encode()).hexdigest()[0], 16
            )
            >= 8
            else -1
            for d in range(n_dims)
        ]
        for j in range(out_dims)
    ]


def jl_project(
    df: DataFrame,
    n_dims: int,
    out_dims: int,
    id_col: str = "vec_id",  # retained for signature compatibility only:
    # since the all-columns-preserving rewrite, the id column needs no
    # special handling and the parameter is unused
    vec_col: str = "embedding",
    salt: str = "jl",
    out_col: str = "jl_vec",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: appends ``out_col`` =
    R·v/√k to the input (every input column is preserved; an existing
    ``out_col`` is replaced) — R the deterministic ±1 matrix of
    :func:`jl_sign_matrix`, k = ``out_dims`` — the shuffle-free
    dimensionality reducer that
    preserves pairwise inner products within (1±ε) at k = O(log n / ε²).
    At 100 TB this is the pre-ANN compaction pass: one scan, each output
    component a signed sum over the input array folded JVM-side
    (row-local ``F.aggregate``; signs are ±1 literals so the fold is
    adds/subtracts, no multiply) — no shuffle, no Python, plan stays one
    projection over the parquet scan.

    Component order: strict left-to-right over input dims (the
    ``_py_dot`` IEEE convention), so any engine restating the same
    signed sums agrees bit-for-bit before the single /√k scale — IEEE
    guarantees x + e·(±1.0) ≡ x ± e, so the zip_with/aggregate fold
    below equals the unrolled add/subtract chain bit-for-bit while
    generating loop code instead of a 64-term expression per component
    (measured: the unrolled form paid ~2× in codegen at 16×64)."""
    signs = jl_sign_matrix(n_dims, out_dims, salt)
    scale = 1.0 / math.sqrt(out_dims)
    # all out_dims signed-sum folds built as ONE parsed SQL array
    # literal (round-13, guide §1.3 construction fix): the per-component
    # Column loop paid ~n_dims py4j literal round-trips per component
    # (out_dims × n_dims total) of pure plan construction. The parsed
    # expressions are identical — same zip_with/aggregate fold, same
    # strict left-to-right order, same single ×scale — so every output
    # double is bit-identical.
    scale_lit = f"{scale!r}D"
    comps_sql = ", ".join(
        "aggregate(zip_with(cast({v} as array<double>), array({row}),"
        " (x, y) -> x * y), 0.0D, (acc, e) -> acc + e) * {s}".format(
            v=_bq(vec_col),
            row=", ".join(f"{float(x)!r}D" for x in signs[j]),
            s=scale_lit,
        )
        for j in range(out_dims)
    )
    # append out_col, preserving every input column (Catalyst prunes the
    # unused ones, so callers that select a subset pay nothing extra)
    keep = [F.col(c) for c in df.columns if c != out_col]
    return df.select(
        *keep, F.expr(f"array({comps_sql})").alias(out_col)
    )

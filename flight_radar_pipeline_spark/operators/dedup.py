"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The workhorse family of any 100 TB corpus pipeline. Design constraints:

- **Deterministic hashing only.** All "randomness" (minhash permutations,
  simhash bit mixing) is derived from md5 over seeded strings, so results
  are reproducible across runs, engines, and partitionings — and every
  operator has an exact DuckDB-SQL oracle.
- **No pairwise blowup.** Candidate generation is bucket-joined (LSH bands),
  never an n² cross join; the exact Jaccard verify runs only on candidates.
- **Everything keyed and shuffle-bounded.** Shingle explosion is the widest
  intermediate (docs × shingles); it aggregates straight back down by
  (doc, seed) with map-side partial min.
"""

from __future__ import annotations

from collections.abc import Sequence

from flight_radar_pipeline_spark.operators.lifecycle import hold
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from flight_radar_pipeline_spark.functions.text import (
    fingerprint,
    pair_combinations,
    tokens,
    word_ngrams,
)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "min",
) -> DataFrame:
    """Exact dedup on canonical content fingerprint (hash-groupBy).

    Returns one winner row per distinct content with ``dup_count``. Winner =
    min (or max) id — deterministic. Scale: one shuffle on the 128-bit
    fingerprint; no skew (hash keys are uniform).
    """
    agg_id = F.min(id_col) if keep == "min" else F.max(id_col)
    winners = (
        df.select(F.col(id_col), fingerprint(text_col).alias("__fp"))
        .groupBy("__fp")
        .agg(agg_id.alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )
    return (
        df.join(winners, on=id_col, how="inner")
        .drop("__fp")
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    history_fps: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Dedup an INCOMING batch against an already-ingested corpus without
    re-scanning the corpus text: ``history_fps`` is the fingerprint table
    the previous runs wrote (one 128-bit md5 per kept document — the only
    state incremental ingestion needs). Returns one decision row per new
    document: (id, keep, reason) with reason ∈ {'dup_of_history',
    'dup_in_batch', 'kept'} — history precedence, then keep-min within
    the batch.

    Scale: one fingerprint-keyed join against the history table (hash
    keys are uniform — no skew; at 100 TB this is the join a bloom/
    partition-pruned fingerprint index accelerates) plus one window over
    the batch's own fingerprints. The historical TEXT is never read.
    """
    fps = new_docs.select(
        F.col(id_col), fingerprint(text_col).alias("__fp")
    )
    hist = history_fps.select(F.col(fp_col).alias("__fp")).distinct().select(
        "__fp", F.lit(True).alias("__in_hist")
    )
    w = Window.partitionBy("__fp")
    marked = (
        fps.join(hist, "__fp", "left")
        .select(
            id_col,
            F.coalesce(F.col("__in_hist"), F.lit(False)).alias("__dup_hist"),
            (F.col(id_col) != F.min(id_col).over(w)).alias("__dup_batch"),
        )
    )
    return marked.select(
        id_col,
        (~F.col("__dup_hist") & ~F.col("__dup_batch")).alias("keep"),
        F.when(F.col("__dup_hist"), F.lit("dup_of_history"))
        .when(F.col("__dup_batch"), F.lit("dup_in_batch"))
        .otherwise(F.lit("kept"))
        .alias("reason"),
    )


# --------------------------------------------------------------------------
# shingling + MinHash + LSH
# --------------------------------------------------------------------------

def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Distinct character k-shingles per document → (id, shingle).

    Built with sequence+transform+explode — stays in the JVM; the
    array_distinct keeps the per-document set semantics Jaccard needs.
    """
    arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(text_col) - (k - 1), F.lit(1))),
            lambda i: F.substr(F.col(text_col), i, F.lit(k)),
        )
    )
    return df.select(F.col(id_col), F.explode(arr).alias("shingle"))


# Universal-hash family over the Mersenne prime 2^31-1: one md5 per shingle
# (the base integer H comes from its first 7 hex nibbles, < 2^28), then each
# seed s maps H through h_s = (a_s·H + b_s) mod P — two multiplies instead
# of an md5 per (shingle, seed). Constants are fixed odd mixers reduced mod
# P; products stay < 2^59, no int64 overflow.
MINHASH_P = 2_147_483_647
_MIX_A, _MIX_B = 0x9E3779B1, 0x85EBCA6B


def minhash_constants(num_hashes: int) -> list[tuple[int, int]]:
    return [
        ((_MIX_A * (s + 1)) % MINHASH_P, (_MIX_B * (s + 1)) % MINHASH_P)
        for s in range(num_hashes)
    ]


def _hex_prefix_long(m: Column, n: int = 7) -> Column:
    """First ``n`` hex nibbles of a hex-string column as a bigint (CASE
    cascade per nibble — portable to any SQL dialect)."""
    out = F.lit(0).cast("bigint")
    for i in range(n):
        out = out * 16 + _nibble_value(F.substr(m, F.lit(i + 1), F.lit(1))).cast(
            "bigint"
        )
    return out


def minhash_signatures(
    shingle_df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature per document → (id, minhashes array<bigint>).

    Deterministic and engine-portable: md5 hashes each shingle ONCE to a
    28-bit integer; the ``num_hashes`` family members are universal hashes
    (a_s·H + b_s) mod 2^31-1 — pure codegen'd integer arithmetic, stated
    identically in the SQL oracle.

    Scale: all hashes are expressions over the SAME (id, shingle) row,
    reduced by ``num_hashes`` parallel ``min`` aggregates in one doc-keyed
    pass — no seed explosion, one md5 per shingle instead of one per
    (shingle, seed), full map-side partial aggregation, long-typed agg
    buffers instead of strings. One shuffle, keyed on the doc id.
    """
    base = shingle_df.select(
        F.col(id_col), _hex_prefix_long(F.md5(F.col("shingle"))).alias("__H")
    )
    # all num_hashes min-aggregates built as ONE parsed SQL array
    # literal (round-13, guide §1.3 construction fix — identical
    # expressions, no per-member py4j Column round-trips)
    mins_sql = ", ".join(
        f"min(({a} * __H + {b}) % {MINHASH_P})"
        for a, b in minhash_constants(num_hashes)
    )
    return base.groupBy(id_col).agg(
        F.expr(f"array({mins_sql})").alias("minhashes")
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: docs agreeing on all hashes of any band become a
    candidate pair → (id_a, id_b), id_a < id_b, distinct.

    The band key is md5 over the band's slice of the signature; the
    self-join runs per (band, key) bucket — never across buckets, so cost
    follows collision structure, not n².
    """
    bands = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        F.transform(
                            F.slice(
                                F.col("minhashes"), b * rows_per_band + 1, rows_per_band
                            ),
                            lambda v: v.cast("string"),
                        ),
                    )
                ).alias("band_key"),
            ),
        )
    ).alias("bk")
    banded = sig_df.select(F.col(id_col), bands).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    num_hashes: int = 16,
    num_bands: int = 4,
    jaccard_threshold: float = 0.5,
    shingle_storage: StorageLevel | None = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline with exact verification:
    shingle → sign → band → candidate pairs → exact shingle-set Jaccard on
    candidates only → (id_a, id_b, jaccard) above threshold.

    This is the canonical corpus near-dedup at scale: the only all-pairs
    work happens inside LSH buckets, and the exact-Jaccard verify touches
    candidate pairs alone — each doc's (distinct) shingle set is collected
    once and the intersection is ``array_intersect`` per pair, so the
    verify cost is O(candidates × set size), never a corpus-wide
    shingle-level join.

    ``shingle_storage`` controls how the shingle explosion — the widest
    intermediate, corpus × shingles rows consumed by BOTH the signature
    and the verify pass — is materialized between its two consumers.
    Default ``MEMORY_AND_DISK`` suits test/interactive scale; at 100 TB
    pass ``StorageLevel.DISK_ONLY`` (the explosion is far beyond executor
    memory, and a disk materialization is a stable stage boundary that
    AQE can re-plan around), or ``None`` to skip persistence entirely and
    recompute the explosion per consumer (trades one extra scan for zero
    storage — right when the corpus scan is cheap relative to cluster
    memory pressure).
    """
    sh = shingles(df, text_col, id_col, k)
    if shingle_storage is not None:
        sh = sh.persist(shingle_storage)
    sigs = minhash_signatures(sh, id_col, num_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, num_bands, num_hashes // num_bands)

    sets_df = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("sh_set"))
    a_sets = sets_df.select(
        F.col(id_col).alias("id_a"), F.col("sh_set").alias("__set_a")
    )
    b_sets = sets_df.select(
        F.col(id_col).alias("id_b"), F.col("sh_set").alias("__set_b")
    )
    return hold(
        cands.join(a_sets, "id_a")
        .join(b_sets, "id_b")
        .withColumn("inter_sz", F.size(F.array_intersect("__set_a", "__set_b")))
        .withColumn("sz_a", F.size("__set_a"))
        .withColumn("sz_b", F.size("__set_b"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter_sz") / (F.col("sz_a") + F.col("sz_b") - F.col("inter_sz")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard"),
        sh,
    )


# --------------------------------------------------------------------------
# edit-distance verify (on sketch candidates)
# --------------------------------------------------------------------------

def edit_distance_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 200,
    max_dist: int = 40,
) -> DataFrame:
    """Levenshtein verification over candidate pairs →
    (id_a, id_b, edit_dist ≤ max_dist).

    Edit distance is O(len²) per pair — never run it corpus-wide; this
    takes a candidate set from a cheap sketch (MinHash-LSH, SimHash
    blocks) and verifies on canonicalized ``prefix_len``-char prefixes,
    bounding per-pair cost. The classic composite: sketch to block,
    edit distance to decide.
    """
    canon = F.substring(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "),
        1,
        prefix_len,
    )
    a = df.select(F.col(id_col).alias("id_a"), canon.alias("__ta"))
    b = df.select(F.col(id_col).alias("id_b"), canon.alias("__tb"))
    return (
        pairs.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .withColumn("edit_dist", F.levenshtein("__ta", "__tb").cast("bigint"))
        .filter(F.col("edit_dist") <= max_dist)
        .select("id_a", "id_b", "edit_dist")
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard (inverted index)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    jaccard_threshold: float = 0.5,
    maxdf: int | None = 1000,
    prefix_filter: bool = True,
    sets_storage: StorageLevel | None = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Exact word-n-gram Jaccard near-dup via inverted-index join →
    (id_a, id_b, jaccard), id_a < id_b, jaccard ≥ threshold.

    No sketching: candidate pairs are docs sharing ≥1 n-gram (the inverted
    index), and recall is exactly 1.0 at the threshold, unlike MinHash-LSH.

    Scale, two prunings that compose:

    - ``maxdf`` (stop-gram cap): the gram-keyed self-join is quadratic in
      per-gram document frequency, so stop-grams ("of the a") are the one
      true scale-killer — grams appearing in more than ``maxdf`` documents
      are dropped BEFORE the join, bounding per-gram fan-out at
      ``maxdf``². The similarity is then Jaccard over the *capped gram
      universe* (sizes and intersections both exclude hot grams — the
      standard rare-feature restriction, which the SQL oracle restates
      exactly). Pass ``None`` for the uncapped form on small corpora.
    - ``prefix_filter`` (AllPairs/PPJoin-style prefix filtering): under a
      global gram total order (ascending document frequency, gram string
      tiebreak — rarest first for maximum pruning), any pair with
      J ≥ t must share a gram within the first |g| − ⌈t·|g|⌉ + 1 grams of
      BOTH documents, so only those prefixes feed the candidate join; the
      verify then computes exact Jaccard from the full gram sets
      (``array_intersect`` per candidate, as the MinHash verify does).
      Pruning-only by construction — every pair it drops is provably
      below threshold — so the output (and the oracle) is identical to
      the unfiltered form; ``tests/test_ngram_maxdf.py`` asserts that.
      The ⌈t·|g|⌉ is computed with a 1e-9 slack so float rounding can
      only LENGTHEN a prefix (candidate superset, never a miss).

    ``sets_storage`` materializes the per-doc ordered gram lists once
    (the subtree is otherwise recomputed by the prefix explode and both
    verify sides — explode + df-agg + join, ×3); same knob semantics as
    ``near_dup_pairs``'s ``shingle_storage`` — ``DISK_ONLY`` at corpus
    scale, ``None`` to trade recompute for zero storage.

    Docs with fewer than ``n`` tokens produce no grams (and thus no pairs),
    identically on the SQL-oracle side.
    """
    grams_arr = F.array_distinct(word_ngrams(tokens(text_col), n))
    g = df.select(F.col(id_col), F.explode(grams_arr).alias("gram"))
    # grams are per-doc distinct, so count(*) per gram == doc frequency.
    # A gram-partition window (one shuffle of the exploded rows) instead
    # of the old agg + equi-join back: that shape shuffled the SAME
    # exploded rows twice and ran the gram explode once per consumer —
    # measured 3.47 -> 2.44 s median at sf0.1 on the standalone entry,
    # results identical (round-13 optimization, guide §2.2).
    g = g.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("gram"))
    )
    if maxdf is not None:
        g = g.filter(F.col("__df") <= maxdf)

    if not prefix_filter:
        sizes = g.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
        a = g.select(F.col(id_col).alias("id_a"), "gram").alias("l")
        b = g.select(F.col(id_col).alias("id_b"), "gram").alias("r")
        inter = (
            a.join(
                b,
                (F.col("l.gram") == F.col("r.gram"))
                & (F.col("id_a") < F.col("id_b")),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter_sz"))
        )
        return (
            inter.join(
                sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")),
                "id_a",
            )
            .join(
                sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")),
                "id_b",
            )
            .withColumn(
                "jaccard",
                F.round(
                    F.col("inter_sz")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("inter_sz")),
                    4,
                ),
            )
            .filter(F.col("jaccard") >= jaccard_threshold)
            .select("id_a", "id_b", "jaccard")
        )

    # one doc-keyed pass builds both the df-ordered gram list (prefixes
    # slice off its head) and the full set the verify intersects
    sets = (
        g.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("__df").alias("df"), F.col("gram").alias("gram"))
                )
            ).alias("__ord")
        )
        .select(
            F.col(id_col),
            F.transform("__ord", lambda s: s["gram"]).alias("__grams"),
            F.size("__ord").alias("sz"),
        )
    )
    if sets_storage is not None:
        sets = sets.persist(sets_storage)
    prefix_len = (
        F.col("sz")
        - F.ceil(F.col("sz") * F.lit(jaccard_threshold) - F.lit(1e-9))
        + 1
    ).cast("int")
    pref = sets.select(
        F.col(id_col), F.explode(F.slice("__grams", F.lit(1), prefix_len)).alias("gram")
    )
    a = pref.select(F.col(id_col).alias("id_a"), "gram").alias("l")
    b = pref.select(F.col(id_col).alias("id_b"), "gram").alias("r")
    cands = (
        a.join(
            b,
            (F.col("l.gram") == F.col("r.gram")) & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sets.select(
        F.col(id_col).alias("id_a"), F.col("__grams").alias("__ga"), F.col("sz").alias("sz_a")
    )
    sb = sets.select(
        F.col(id_col).alias("id_b"), F.col("__grams").alias("__gb"), F.col("sz").alias("sz_b")
    )
    return hold(
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("inter_sz", F.size(F.array_intersect("__ga", "__gb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter_sz") / (F.col("sz_a") + F.col("sz_b") - F.col("inter_sz")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard"),
        sets,
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

_HEX_NIBBLE = {c: i for i, c in enumerate("0123456789abcdef")}


def _nibble_value(col: Column) -> Column:
    """Map one lowercase hex char to its 0-15 value via a CASE cascade —
    portable to any SQL dialect (no hex-parse builtin needed)."""
    out = F.lit(None).cast("int")
    expr = F.when(col == "0", 0)
    for c, v in list(_HEX_NIBBLE.items())[1:]:
        expr = expr.when(col == c, v)
    return expr.otherwise(out)


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per document → (id, simhash 16-char hex string).

    Token-level: each distinct token votes its md5 bit pattern weighted by
    occurrence count; each output bit is the vote majority; the hex string
    is reassembled nibble-by-nibble. Entirely relational — no UDF, exact
    SQL oracle available.

    Scale: all ``num_bits`` bit votes are PARALLEL ``sum`` aggregates over
    the same (doc, token, weight, md5) row — the same no-explosion pattern
    as the MinHash signature pass. One token-count shuffle + one doc-keyed
    shuffle with full map-side partials, versus the naive form's
    token × num_bits row explosion through three successive groupBys.
    """
    nibbles = num_bits // 4
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    )
    tok_counts = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("w"))
    # parse the fingerprint into 32-bit halves ONCE per (doc, token); each
    # bit vote is then a shift+mask — not a per-bit hex-char CASE cascade
    # (that form cost 4× the row explosion it replaced)
    hashed = tok_counts.select(
        F.col(id_col),
        "w",
        _hex_to_long(F.md5(F.col("token")), 1, 8).alias("__h1"),
        _hex_to_long(F.md5(F.col("token")), 9, 8).alias("__h2"),
    )
    # one weighted-sum aggregate per output bit k (MSB-first): vote(k) =
    # Σ w · (2·bit − 1), bit = (half >> (31 − k%32)) & 1. All num_bits
    # vote sums are built as ONE parsed SQL array literal (round-13,
    # guide §1.3 — the linalg/codeword-table construction trick): the
    # previous per-bit Column loop paid ~6 py4j round-trips per bit of
    # pure plan construction; the parsed expressions are identical.
    votes_sql = ", ".join(
        f"sum(w * ((shiftright(__h{1 if k < 32 else 2},"
        f" {31 - (k % 32)}) & 1) * 2 - 1))"
        for k in range(num_bits)
    )
    agg = hashed.groupBy(id_col).agg(
        F.expr(f"array({votes_sql})").alias("__v")
    )
    # reassemble: nibble value = Σ (vote>0) << (3−bp), then hex-char
    # lookup — same single-parse construction
    nib_sql = []
    for np_ in range(nibbles):
        terms = " + ".join(
            f"(cast(__v[{np_ * 4 + bp}] > 0 as int) * {1 << (3 - bp)})"
            for bp in range(4)
        )
        nib_sql.append(
            f"substr('0123456789abcdef', cast(({terms}) + 1 as int), 1)"
        )
    return agg.select(
        F.col(id_col),
        F.expr("concat(" + ", ".join(nib_sql) + ")").alias("simhash"),
    )


def _hex_to_long(col: Column, start: int, length: int) -> Column:
    """Hex substring → bigint via base conversion (≤ 15 nibbles)."""
    return F.conv(F.substring(col, start, length), 16, 10).cast("bigint")


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_bits: int = 64,
    signature_storage: StorageLevel | None = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance →
    (id_a, id_b, hamming ≤ max_hamming), id_a < id_b.

    Pigeonhole blocking: split the 64-bit fingerprint into
    ``max_hamming + 1`` nibble blocks — any pair within distance k must
    agree EXACTLY on at least one block, so candidates come from a
    block-key equi-join (never n²). Verify is exact: xor + popcount over
    the fingerprint halves (two 32-bit loads keep the parse inside
    signed-int64, and xor/bit_count are bitwise-identical either way).
    The fingerprint → blocking → verify chain is the classic
    Charikar/Manku-Jain-Sarma web-dedup design, here as three DataFrame
    stages. ``signature_storage`` materializes the fingerprint table once
    (both sides of the block-key self-join consume it; computing it means
    the full token-vote aggregation) — same knob semantics as the other
    dedup operators.
    """
    sigs = simhash(df, text_col, id_col, num_bits)
    if signature_storage is not None:
        sigs = sigs.persist(signature_storage)
    nibbles = num_bits // 4
    n_blocks = max_hamming + 1
    block_nibs = nibbles // n_blocks
    blocks = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_blocks - 1)),
            lambda b: F.struct(
                b.alias("blk"),
                F.substring("simhash", b * block_nibs + 1, block_nibs).alias("bval"),
            ),
        )
    ).alias("bk")
    banded = sigs.select(F.col(id_col), F.col("simhash"), blocks).select(
        id_col, "simhash", F.col("bk.blk").alias("blk"), F.col("bk.bval").alias("bval")
    )
    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("__sig_a"), "blk", "bval"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("__sig_b"), "blk", "bval"
    )
    cands = (
        left.join(right, ["blk", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sig_a", "__sig_b")
        .distinct()
    )
    ham = (
        F.bit_count(
            _hex_to_long(F.col("__sig_a"), 1, 8).bitwiseXOR(
                _hex_to_long(F.col("__sig_b"), 1, 8)
            )
        )
        + F.bit_count(
            _hex_to_long(F.col("__sig_a"), 9, 8).bitwiseXOR(
                _hex_to_long(F.col("__sig_b"), 9, 8)
            )
        )
    )
    return hold(
        cands.withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming"),
        sigs,
    )


def keep_best_decisions(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "quality",
) -> DataFrame:
    """Quality-aware dedup policy: within each near-dup cluster keep the
    HIGHEST-scoring member (ties to the lowest id) instead of the
    keep-lowest-id default → (id, cluster, score, kept). What a
    production dedup actually ships: when near-duplicates differ in
    quality, discard the worse copies, not the higher-numbered ones.

    One broadcast-free equi-join (clusters ⋈ scores on id) and one
    cluster-partitioned window — group sizes are near-dup cluster sizes,
    inherently small, so the window never sees a skewed partition."""
    from pyspark.sql import Window

    w = Window.partitionBy(cluster_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        clusters.join(scores, id_col)
        .withColumn("kept", F.row_number().over(w) == 1)
        .select(id_col, cluster_col, score_col, "kept")
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    containment_threshold: float = 0.8,
    maxdf: int | None = 1000,
    grams_storage: StorageLevel | None = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Asymmetric n-gram containment near-dup via the same inverted-index
    device as ``ngram_jaccard_pairs`` → ``(src_id, dst_id, containment)``
    with ``containment = |src ∩ dst| / |src| ≥ threshold``, both
    directions emitted independently.

    Containment is what Jaccard misses: a short document wholly quoted
    inside a long one scores J ≈ |short|/|long| (tiny) but containment
    1.0 — the subset-copy / quotation / boilerplate-inclusion case a
    training-corpus dedup actually wants to catch (the relation behind
    suffix-array–based dedup pipelines, expressed over gram sets).

    Scale: identical to the Jaccard op's capped path — ``maxdf`` drops
    stop-grams BEFORE any candidate pair is emitted (fan-out ≤ maxdf²
    per gram), sizes and intersections both live in the capped gram
    universe (the oracle restates the cap), one pair-keyed aggregate.
    The Jaccard prefix filter does NOT apply here (a low-Jaccard pair
    can still have containment 1.0), so the candidate set is the full
    shared-gram relation — the cap is the one pruning that stays sound.

    Candidate generation is the a-priori array-combinations device
    (round-13 exchange sweep, same rewrite as ``adamic_adar_pairs``):
    the capped gram relation groups to one sorted doc-id SET per gram —
    bounded at ``maxdf`` elements by the upstream cap, so the
    aggregation buffer is bounded at any scale — and every (a < b)
    combination explodes out of the array, replacing the gram-keyed
    self-join (one exchange, one join, and one plan subtree fewer).
    When ``maxdf`` is None nothing bounds the per-gram set, so the
    operator refuses rather than build an unbounded aggregation buffer;
    note the per-gram combinations array cell is O(maxdf²) structs
    before the explode (≈ 500k at the default 1000 — bounded, but size
    the cap deliberately; review note, round 13).
    Directions are exploded BEFORE the size join, so the per-doc size
    relation joins ONCE (on src_id) instead of twice.
    """
    if maxdf is None:
        raise ValueError(
            "ngram_containment_pairs: maxdf=None would make the per-gram "
            "candidate set (and its aggregation buffer) unbounded; pass "
            "an explicit document-frequency cap"
        )
    grams_arr = F.array_distinct(word_ngrams(tokens(text_col), n))
    g = df.select(F.col(id_col), F.explode(grams_arr).alias("gram"))
    gram_df = (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= maxdf)
    )
    g = g.join(gram_df.select("gram"), "gram")
    # the capped gram relation feeds the size aggregate AND the gram-set
    # grouping; persist it so tokenize + explode + df-cap runs once (same
    # knob semantics as ngram_jaccard_pairs's sets_storage)
    if grams_storage is not None:
        g = g.persist(grams_storage)
    sizes = g.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sets = g.groupBy("gram").agg(F.array_sort(F.collect_set(id_col)).alias("__ds"))
    combos = pair_combinations(F.col("__ds"))
    inter = (
        sets.select(F.explode(combos).alias("__p"))
        .groupBy("__p.id_a", "__p.id_b")
        .agg(F.count(F.lit(1)).alias("inter_sz"))
    )
    # both directions from ONE pass over the pair set (explode of a
    # 2-struct array) — a union of two selects would make Catalyst
    # recompute the whole index subtree per direction; exploding before
    # the size join halves the join count (sizes joins once, on src_id)
    directed = inter.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src_id"),
                    F.col("id_b").alias("dst_id"),
                    F.col("inter_sz"),
                ),
                F.struct(
                    F.col("id_b").alias("src_id"),
                    F.col("id_a").alias("dst_id"),
                    F.col("inter_sz"),
                ),
            )
        ).alias("__d")
    ).select("__d.src_id", "__d.dst_id", "__d.inter_sz")
    scored = directed.join(
        sizes.select(F.col(id_col).alias("src_id"), "sz"), "src_id"
    ).select(
        "src_id", "dst_id", (F.col("inter_sz") / F.col("sz")).alias("__c")
    )
    return hold(
        scored.filter(F.col("__c") >= containment_threshold)
        .select("src_id", "dst_id", F.round("__c", 4).alias("containment")),
        g,
    )


def positional_token_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Positional ``k``-token span stream → ``(id, __start, __end,
    __span)``, one row per span occurrence (corpus-linear). The shared
    front half of ``duplicated_span_coverage`` and the incremental
    span-index maintenance its stream twin folds per batch."""
    toks = df.select(F.col(id_col), tokens(text_col).alias("__ts"))
    return (
        toks.filter(F.size("__ts") >= k)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(1), F.size("__ts") - k + 1)).alias(
                "__start"
            ),
            "__ts",
        )
        .select(
            id_col,
            "__start",
            (F.col("__start") + k).alias("__end"),
            F.array_join(F.slice("__ts", F.col("__start"), k), " ").alias(
                "__span"
            ),
        )
    )


def duplicated_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    spans_storage: StorageLevel | None = StorageLevel.MEMORY_AND_DISK,
    dup_spans: DataFrame | None = None,
) -> DataFrame:
    """Per-document duplicated-text coverage → ``(id, n_tokens,
    dup_tokens, coverage)``: every exact ``k``-token span occurring in
    ≥2 DISTINCT documents marks its token positions duplicated,
    overlapping marks merge (interval union), and ``coverage =
    dup_tokens / n_tokens``. The doc-grain decision input of
    exact-substring dedup (drop vs strip vs keep) — the span-grain
    counts live in the boilerplate-mining entry; intra-document repeats
    alone do NOT count (the contract is "appears elsewhere in the
    corpus").

    Device: positional span stream (one span per token, corpus-linear)
    → ONE span-keyed aggregate where ``min(id) <> max(id)`` detects
    cross-document duplication without a count-distinct expansion →
    positions join back on span → per-doc interval union as a
    cumulative-max window (contribution = ``end − max(start, running
    max of prior ends)`` — the sweep-line union; no pairwise overlap
    join exists). The positional relation feeds the aggregate and the
    join, so it persists under ``spans_storage`` (pass None at corpus
    scales where recomputing the explode beats caching a corpus-sized
    relation). Span keys stay plain text so SQL oracles are exactly
    relational; at 100 TB the group key would be ``xxhash64(span)``
    (8-byte shuffle keys, identical semantics).

    ``dup_spans`` (a one-column ``__span`` relation) substitutes an
    EXTERNALLY-maintained duplicate-span verdict for the internal
    aggregate — the incremental-index path: a stream fold maintains the
    span → (min id, max id) grid in O(batch) per batch (min/max are
    mergeable, so the verdict is exact under any batch split) and this
    function only scores positions against it. With ``dup_spans`` the
    positional relation has a single consumer, so ``spans_storage`` is
    ignored (nothing to share).
    """
    toks = df.select(F.col(id_col), tokens(text_col).alias("__ts"))
    occ = positional_token_spans(df, text_col, id_col, k)
    if dup_spans is not None:
        spans_storage = None  # single consumer — nothing to share
        dup = dup_spans.select("__span")
    else:
        if spans_storage is not None:
            occ = occ.persist(spans_storage)
        dup = (
            occ.groupBy("__span")
            .agg(F.min(id_col).alias("__lo"), F.max(id_col).alias("__hi"))
            .filter(F.col("__lo") != F.col("__hi"))
            .select("__span")
        )
    w = (
        Window.partitionBy(id_col)
        .orderBy("__start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = (
        occ.join(dup, "__span")
        .withColumn("__pe", F.max("__end").over(w))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.greatest(
                    F.lit(0),
                    F.col("__end")
                    - F.greatest(
                        F.col("__start"),
                        F.coalesce(F.col("__pe"), F.col("__start")),
                    ),
                )
            )
            .cast("bigint")
            .alias("dup_tokens")
        )
    )
    out = (
        toks.select(id_col, F.size("__ts").cast("bigint").alias("n_tokens"))
        .join(cov, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("bigint").alias(
                "dup_tokens"
            ),
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("n_tokens"),
                4,
            ).alias("coverage"),
        )
    )
    return hold(out, occ) if spans_storage is not None else out

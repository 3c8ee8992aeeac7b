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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions.text import fingerprint


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


def minhash_signatures(
    shingle_df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature per document → (id, minhashes array<string>).

    Hash family h_s(x) = md5(s || ':' || x) for seed s — deterministic and
    engine-portable; the signature entry for seed s is the lexicographic min
    over the document's shingles. One shuffle keyed on (id, seed) with
    partial min upstream, then one keyed on id to assemble the signature.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    long_form = (
        shingle_df.select(F.col(id_col), F.col("shingle"), seeds)
        .select(
            id_col,
            "seed",
            F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("shingle"))).alias("h"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("mh"))
    )
    return (
        long_form.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                lambda s: s["mh"],
            ).alias("minhashes")
        )
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
                        F.slice(F.col("minhashes"), b * rows_per_band + 1, rows_per_band),
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
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline with exact verification:
    shingle → sign → band → candidate pairs → exact shingle-set Jaccard on
    candidates only → (id_a, id_b, jaccard) above threshold.

    This is the canonical corpus near-dedup at scale: the only all-pairs
    work happens inside LSH buckets, and the expensive exact Jaccard join
    touches candidates alone.
    """
    sh = shingles(df, text_col, id_col, k).cache()
    sigs = minhash_signatures(sh, id_col, num_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, num_bands, num_hashes // num_bands)

    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a_sh = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b_sh = sh.select(F.col(id_col).alias("__b_id"), F.col("shingle").alias("shingle_b"))
    inter = (
        cands.join(a_sh, "id_a")
        .join(
            b_sh,
            (F.col("id_b") == F.col("__b_id")) & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter_sz"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter_sz") / (F.col("sz_a") + F.col("sz_b") - F.col("inter_sz")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
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
    is reassembled nibble-by-nibble. Entirely relational (explode + agg) —
    no UDF, exact SQL oracle available.
    """
    nibbles = num_bits // 4
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    )
    tok_counts = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("w"))
    hashed = tok_counts.withColumn("h", F.md5(F.col("token")))
    # explode nibble positions 0..15, then bit positions 0..3 within each
    nib = (
        hashed.select(
            id_col,
            "w",
            F.explode(F.sequence(F.lit(0), F.lit(nibbles - 1))).alias("np"),
            F.col("h"),
        )
        .withColumn("nib", _nibble_value(F.substr(F.col("h"), F.col("np") + 1, F.lit(1))))
    )
    bits = nib.select(
        id_col,
        "w",
        "np",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("bp"),
        F.col("nib"),
    ).withColumn("bit", F.expr("shiftright(nib, 3 - bp) % 2"))
    votes = (
        bits.groupBy(id_col, "np", "bp")
        .agg(F.sum(F.col("w") * (F.col("bit") * 2 - 1)).alias("vote"))
        .withColumn("outbit", (F.col("vote") > 0).cast("int"))
    )
    nib_vals = (
        votes.groupBy(id_col, "np")
        .agg(F.sum(F.expr("outbit * shiftleft(1, 3 - bp)")).alias("nv"))
    )
    hex_chars = nib_vals.withColumn(
        "hc",
        F.substr(F.lit("0123456789abcdef"), (F.col("nv") + 1).cast("int"), F.lit(1)),
    )
    return (
        hex_chars.groupBy(id_col)
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("np", "hc"))),
                    lambda s: s["hc"],
                ),
            ).alias("simhash")
        )
    )

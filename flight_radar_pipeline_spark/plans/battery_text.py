"""Training-data-pipeline battery: text analysis, dedup families,
similarity search, multimodal plumbing — over documents/embeddings.

Every query pairs the Spark operator (operators/, functions/text) with a
DuckDB oracle stating the SAME deterministic computation independently in
SQL. Hash-derived pseudo-randomness (md5) makes even MinHash-LSH and
hyperplane-LSH exactly reproducible cross-engine.

Registered into the same REGISTRY as the relational battery on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions import text as T
from flight_radar_pipeline_spark.operators import dedup as D
from flight_radar_pipeline_spark.operators import similarity as S
from flight_radar_pipeline_spark.plans.battery import register
from flight_radar_pipeline_spark.sources.readers import load_table

# SQL fragment: map a single lowercase hex char expression to its 0-15 value
# (mirrors operators.dedup._nibble_value / similarity._plane_component).
def _nibble_case(expr: str) -> str:
    whens = " ".join(
        f"WHEN '{c}' THEN {v}" for v, c in enumerate("0123456789abcdef")
    )
    return f"(CASE {expr} {whens} END)"


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

_STATS_ORACLE = r"""
    select doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) as token_count,
           length(text) as char_count,
           round(length(regexp_replace(text, '\s', '', 'g'))
                 / len(regexp_split_to_array(trim(text), '\s+')), 4) as avg_token_len,
           round((length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')))
                 / greatest(length(text), 1), 4) as punct_ratio,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) as fingerprint
    from documents
    order by doc_id
"""


@register("doc_text_stats", _STATS_ORACLE)
def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document corpus statistics (token/char counts, mean token length,
    punctuation density, content fingerprint) — all codegen'd column exprs,
    scan-speed at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("token_count"),
        T.char_count("text").alias("char_count"),
        T.avg_token_len("text").alias("avg_token_len"),
        T.punct_ratio("text").alias("punct_ratio"),
        T.fingerprint("text").alias("fingerprint"),
    ).orderBy("doc_id")


def _occ_sql(needle: str) -> str:
    pad = f"(' ' || trim(text) || ' ')"
    return (
        f"((length({pad}) - length(replace({pad}, ' {needle} ', ''))) / {len(needle) + 2}.0)"
    )


def _lang_score_sql(lang: str) -> str:
    return " + ".join(_occ_sql(w) for w in T.LANG_MARKERS[lang])


_LANG_ORACLE = f"""
    with s as (
        select doc_id, lang,
               {_lang_score_sql('en')} as s_en,
               {_lang_score_sql('es')} as s_es,
               {_lang_score_sql('fr')} as s_fr,
               {_lang_score_sql('de')} as s_de
        from documents
    ), p as (
        select doc_id, lang,
               greatest(s_en, s_es, s_fr, s_de) as best,
               case when greatest(s_en, s_es, s_fr, s_de) <= 0 then 'und'
                    when s_de = greatest(s_en, s_es, s_fr, s_de) then 'de'
                    when s_en = greatest(s_en, s_es, s_fr, s_de) then 'en'
                    when s_es = greatest(s_en, s_es, s_fr, s_de) then 'es'
                    when s_fr = greatest(s_en, s_es, s_fr, s_de) then 'fr'
                    else 'und' end as lang_pred
        from s
    )
    select lang, lang_pred, count(*) as n
    from p group by lang, lang_pred
    order by lang, lang_pred
"""


@register("doc_lang_id", _LANG_ORACLE)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (stopword-marker hit rates, deterministic tie
    priority) → confusion counts vs the labeled lang column."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "lang", T.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "lang_pred")
    )


@register(
    "doc_exact_dedup",
    r"""
    with corpus as (
        select doc_id, text from documents
        union all
        select doc_id + 100000 as doc_id, text from documents
    ), fp as (
        select doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) as fp
        from corpus
    )
    select min(doc_id) as doc_id, count(*) as dup_count
    from fp group by fp
    order by doc_id
    """,
)
def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash-groupBy on content fingerprint) over a corpus with
    constructed duplicates (the table unioned with itself under shifted
    ids); winner = min id. SURVEY §2.3 P6 generalized to content identity."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionAll(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    out = D.dedup_exact(corpus, "text", "doc_id", keep="min")
    return out.select("doc_id", "dup_count").orderBy("doc_id")


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------

_K, _NH, _NB = 8, 16, 4  # shingle chars, hashes, bands (4 rows/band)
_THRESH = 0.35


def _hex_prefix_sql(expr: str, n: int = 7) -> str:
    """First n hex nibbles of a hex-string SQL expression as a bigint —
    mirrors operators.dedup._hex_prefix_long."""
    out = "0"
    for i in range(n):
        out = f"({out} * 16 + {_nibble_case(f'substr({expr}, {i + 1}, 1)')})"
    return out


def _minhash_seed_values() -> str:
    from flight_radar_pipeline_spark.operators.dedup import minhash_constants

    return ", ".join(
        f"({s}, {a}, {b})" for s, (a, b) in enumerate(minhash_constants(_NH))
    )


_MINHASH_ORACLE = f"""
    with sh as (
        select doc_id, unnest(list_distinct(
            [substr(text, i, {_K}) for i in range(1, greatest(length(text) - {_K - 1}, 1) + 1)]
        )) as shingle
        from documents
    ), hashed as (
        select doc_id, shingle,
               {_hex_prefix_sql("md5(shingle)")}::bigint as H
        from sh
    ), seeds(seed, a, b) as (
        values {_minhash_seed_values()}
    ), mh as (
        select doc_id, seed, min((a * H + b) % 2147483647) as mh
        from hashed cross join seeds
        group by doc_id, seed
    ), sig as (
        select doc_id, list(mh order by seed) as minhashes from mh group by doc_id
    ), bands as (
        select doc_id, b,
               md5(array_to_string(minhashes[b * {_NH // _NB} + 1 : (b + 1) * {_NH // _NB}], '|')) as band_key
        from sig cross join (select unnest(range(0, {_NB})) as b)
    ), cand as (
        select distinct l.doc_id as id_a, r.doc_id as id_b
        from bands l join bands r
          on l.b = r.b and l.band_key = r.band_key and l.doc_id < r.doc_id
    ), sizes as (
        select doc_id, count(*) as sz from sh group by doc_id
    ), inter as (
        select c.id_a, c.id_b, count(*) as inter_sz
        from cand c
        join sh a on a.doc_id = c.id_a
        join sh b on b.doc_id = c.id_b and b.shingle = a.shingle
        group by c.id_a, c.id_b
    )
    select i.id_a, i.id_b,
           round(inter_sz / (sa.sz + sb.sz - inter_sz), 4) as jaccard
    from inter i
    join sizes sa on sa.doc_id = i.id_a
    join sizes sb on sb.doc_id = i.id_b
    where inter_sz / (sa.sz + sb.sz - inter_sz) >= {_THRESH}
    order by id_a, id_b
"""


# One verified near-dup pair table per (session, sf_dir): the minhash,
# edit-distance and clustering queries all consume the SAME
# shingle→signature→candidate→verify intermediate, so it is materialized
# once (eager localCheckpoint — the battery-local stand-in for the pair
# table a real pipeline writes to storage) instead of recomputing three
# corpus-wide sketch passes. Keyed by applicationId so a new session never
# sees a stale handle. Caveats, by design: localCheckpoint blocks lose
# their executor on failure (a real pipeline writes the pair table to
# storage), and entries live until ``clear_pair_cache`` — tests that need
# to re-prove properties of the UNDERLYING sketch computation (e.g.
# partition determinism) must clear between runs or the cache would
# satisfy them vacuously.
_PAIR_CACHE: dict[tuple[str, str], DataFrame] = {}


def clear_pair_cache() -> None:
    """Drop every materialized pair table (and unpersist its blocks) so
    the next battery call recomputes the sketch pipeline from scratch."""
    for df in _PAIR_CACHE.values():
        try:
            df.unpersist()
        except Exception:  # session may already be gone
            pass
    _PAIR_CACHE.clear()


def _shared_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PAIR_CACHE:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        pairs = D.near_dup_pairs(
            docs, "text", "doc_id",
            k=_K, num_hashes=_NH, num_bands=_NB, jaccard_threshold=_THRESH,
        )
        _PAIR_CACHE[key] = pairs.localCheckpoint(eager=True)
    return _PAIR_CACHE[key]


@register("minhash_near_dup_pairs", _MINHASH_ORACLE)
def minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline (shingle → 16 minhashes → 4 bands
    → bucket-joined candidates → exact Jaccard verify on candidates only).
    Deterministic md5 hash family ⇒ exact SQL oracle for the whole pipeline."""
    return _shared_near_dup_pairs(spark, sf_dir).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# edit-distance verify on minhash candidates
# --------------------------------------------------------------------------

_ED_PREFIX, _ED_MAX = 200, 40

_EDIT_ORACLE = rf"""
    with pairs as (
        {_MINHASH_ORACLE.replace("order by id_a, id_b", "")}
    ), c as (
        select doc_id,
               substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, {_ED_PREFIX}) as t
        from documents
    )
    select id_a, id_b, levenshtein(a.t, b.t)::bigint as edit_dist
    from pairs
    join c a on a.doc_id = id_a
    join c b on b.doc_id = id_b
    where levenshtein(a.t, b.t) <= {_ED_MAX}
    order by id_a, id_b
"""


@register("edit_distance_near_dup", _EDIT_ORACLE)
def edit_distance_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-block → edit-distance-verify composite: MinHash-LSH
    candidates re-verified by Levenshtein on 200-char canonical prefixes
    (O(len²) per pair, so candidates-only by construction). Consumes the
    materialized shared pair table — no second sketch pass."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cands = _shared_near_dup_pairs(spark, sf_dir)
    return D.edit_distance_pairs(
        docs, cands, "text", "doc_id", prefix_len=_ED_PREFIX, max_dist=_ED_MAX
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# near-dup clusters (connected components over the pair graph)
# --------------------------------------------------------------------------

# the pair graph is the minhash oracle's output; components via recursive
# CTE: reach(u,v) = v reachable from u over undirected edges, cluster id =
# min reachable node (incl. self)
_CLUSTERS_ORACLE = f"""
    with recursive pairs as (
        {_MINHASH_ORACLE.replace("order by id_a, id_b", "")}
    ), und as (
        select id_a as u, id_b as v from pairs
        union
        select id_b as u, id_a as v from pairs
    ), reach(u, v) as (
        select u, u from und
        union
        select r.u, e.v from reach r join und e on r.v = e.u
    )
    select u as doc_id, min(v) as cluster_id
    from reach group by u
    order by doc_id
"""


@register("near_dup_clusters", _CLUSTERS_ORACLE)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup clusters: driver-coordinated label
    propagation (operators/graph.py), the iterative-algorithm class on
    DataFrames. cluster_id = min doc id of the component, i.e. the row a
    dedup keep-min policy retains. Oracle: recursive-CTE transitive
    closure over the same pair graph. Consumes the materialized shared
    pair table — no second sketch pass."""
    pairs = _shared_near_dup_pairs(spark, sf_dir)
    from flight_radar_pipeline_spark.operators.graph import connected_components

    return connected_components(pairs).orderBy("doc_id")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def _simhash_cte(where_clause: str = "") -> str:
    """CTE chain ending in ``sim(doc_id, simhash)`` — shared by the
    fingerprint and hamming-pairs oracles."""
    return rf"""tok as (
        select doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) as token
        from documents {where_clause}
    ), tc as (
        select doc_id, token, count(*) as w, md5(token) as h
        from tok group by doc_id, token
    ), nib as (
        select doc_id, w, np, {_nibble_case("substr(h, np + 1, 1)")} as nib
        from tc cross join (select unnest(range(0, 16)) as np)
    ), bits as (
        select doc_id, w, np, bp, (nib >> (3 - bp)) % 2 as bit
        from nib cross join (select unnest(range(0, 4)) as bp)
    ), votes as (
        select doc_id, np, bp, sum(w * (bit * 2 - 1)) as vote
        from bits group by doc_id, np, bp
    ), nv as (
        select doc_id, np,
               sum((case when vote > 0 then 1 else 0 end) * (1 << (3 - bp))) as nv
        from votes group by doc_id, np
    ), sim as (
        select doc_id,
               string_agg(substr('0123456789abcdef', (nv + 1)::bigint, 1), '' order by np) as simhash
        from nv group by doc_id
    )"""


_SIMHASH_ORACLE = f"""
    with {_simhash_cte("where doc_id < 100")}
    select doc_id, simhash from sim
    order by doc_id
"""

_HAM = (
    "(bit_count(xor(('0x' || substr(sig_a, 1, 8))::bigint,"
    " ('0x' || substr(sig_b, 1, 8))::bigint))"
    " + bit_count(xor(('0x' || substr(sig_a, 9, 8))::bigint,"
    " ('0x' || substr(sig_b, 9, 8))::bigint)))"
)

_SIMHASH_PAIRS_ORACLE = f"""
    with {_simhash_cte()}, blocks as (
        select doc_id, simhash, b as blk, substr(simhash, b * 4 + 1, 4) as bval
        from sim cross join (select unnest(range(0, 4)) as b)
    ), cand as (
        select distinct l.doc_id as id_a, r.doc_id as id_b,
                        l.simhash as sig_a, r.simhash as sig_b
        from blocks l join blocks r
          on l.blk = r.blk and l.bval = r.bval and l.doc_id < r.doc_id
    )
    select id_a, id_b, {_HAM}::bigint as hamming
    from cand
    where {_HAM} <= 3
    order by id_a, id_b
"""


@register("doc_simhash", _SIMHASH_ORACLE)
def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints (token votes from md5 bit patterns,
    majority per bit) — fully relational, no UDF, exact SQL oracle."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return D.simhash(docs, "text", "doc_id").orderBy("doc_id")


@register("simhash_near_dup_pairs", _SIMHASH_PAIRS_ORACLE)
def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-distance near-dup (the Charikar/web-dedup design):
    pigeonhole nibble blocks generate candidates by equi-join, exact
    xor+popcount verifies distance ≤ 3. Completes the fingerprint → pairs
    path for the SimHash family."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return D.simhash_near_dup_pairs(
        docs, "text", "doc_id", max_hamming=3
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# n-gram profile
# --------------------------------------------------------------------------

@register(
    "top_bigrams_per_lang",
    r"""
    with t as (
        select lang, regexp_split_to_array(trim(text), '\s+') as toks
        from documents
    ), bg as (
        select lang, unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) as bigram
        from t
    ), c as (
        select lang, bigram, count(*) as cnt from bg group by lang, bigram
    ), r as (
        select *, row_number() over (partition by lang order by cnt desc, bigram) as rnk
        from c
    )
    select lang, bigram, cnt, rnk from r where rnk <= 3
    order by lang, rnk
    """,
)
def top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram frequency profile: top-3 bigrams per language label.
    Bigrams built array-natively (no explode-then-self-join)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.split(F.trim(F.col("text")), r"\s+").alias("toks"))
    bigrams = toks.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.concat(
                    F.get(F.col("toks"), i - 1), F.lit(" "), F.get(F.col("toks"), i)
                ),
            )
        ).alias("bigram"),
    )
    counts = bigrams.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("bigram"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("lang", "rnk")
    )


# --------------------------------------------------------------------------
# PMI collocations
# --------------------------------------------------------------------------

_PMI_MIN_COUNT, _PMI_TOPK = 5, 15

_PMI_ORACLE = rf"""
    with t as (
        select regexp_split_to_array(trim(text), '\s+') as toks from documents
    ), w as (
        select unnest(toks) as token from t
    ), wc as (
        select token, count(*) as c from w group by token
    ), wt as (
        select count(*) as n from w
    ), bg as (
        select unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) as bigram
        from t
    ), bc as (
        select bigram, count(*) as cab from bg group by bigram
    ), bt as (
        select count(*) as n from bg
    ), scored as (
        select bigram, cab,
               round(ln((cab / bt.n) / ((wa.c / wt.n) * (wb.c / wt.n))), 4) as pmi
        from bc, wt, bt
        join wc wa on wa.token = split_part(bigram, ' ', 1)
        join wc wb on wb.token = split_part(bigram, ' ', 2)
        where cab >= {_PMI_MIN_COUNT}
    )
    select bigram, cab, pmi from scored
    order by pmi desc, bigram
    limit {_PMI_TOPK}
"""


@register("top_pmi_collocations", _PMI_ORACLE)
def top_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top word pairs by pointwise mutual information
    ln(p(ab) / (p(a)·p(b))), min count 5 — three hash aggregates + two
    broadcast joins against the unigram counts; totals ride along as
    1-row broadcast cross joins, no window over the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.trim(F.col("text")), r"\s+").alias("toks"))
    words = toks.select(F.explode("toks").alias("token"))
    wc = words.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    wt = words.agg(F.count(F.lit(1)).alias("wn"))
    bigrams = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.get(F.col("toks"), i - 1).alias("w1"),
                    F.get(F.col("toks"), i).alias("w2"),
                ),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bc = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cab"))
    bt = bigrams.agg(F.count(F.lit(1)).alias("bn"))
    wa = wc.select(F.col("token").alias("w1"), F.col("c").alias("ca"))
    wb = wc.select(F.col("token").alias("w2"), F.col("c").alias("cb"))
    scored = (
        bc.filter(F.col("cab") >= _PMI_MIN_COUNT)
        .join(F.broadcast(wa), "w1")
        .join(F.broadcast(wb), "w2")
        .crossJoin(F.broadcast(wt))
        .crossJoin(F.broadcast(bt))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("cab") / F.col("bn"))
                    / ((F.col("ca") / F.col("wn")) * (F.col("cb") / F.col("wn")))
                ),
                4,
            ),
        )
        .withColumn("bigram", F.concat_ws(" ", "w1", "w2"))
    )
    return (
        scored.orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(_PMI_TOPK)
        .select("bigram", "cab", "pmi")
    )


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

_TOPK_ORACLE = """
    with q as (
        select vec_id as query_id, embedding::DOUBLE[] as qv
        from embeddings where vec_id < 10
    ), c as (
        select vec_id as neighbor_id, embedding::DOUBLE[] as cv from embeddings
    ), scored as (
        select query_id, neighbor_id,
               round(list_cosine_similarity(qv, cv), 6) as cosine
        from q cross join c
        where query_id != neighbor_id
    ), r as (
        select *, row_number() over (
            partition by query_id order by cosine desc, neighbor_id
        ) as rn from scored
    )
    select query_id, neighbor_id, cosine from r where rn <= 5
    order by query_id, neighbor_id
"""


@register("embedding_topk_bruteforce", _TOPK_ORACLE)
def embedding_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for 10 query vectors: broadcast query
    side, one corpus scan, window top-k. Vector math bit-identical to
    DuckDB's list_cosine_similarity (double, left-to-right sum)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.topk_neighbors_bruteforce(emb, queries, k=5).orderBy(
        "query_id", "neighbor_id"
    )


# embeddings.parquet width (TESTDATA.md); battery callers pass it so no
# signature build needs a driver-side dimensionality probe
EMB_DIMS = 64

_PLANES = 6

_LSH_ANN_ORACLE = f"""
    with comps as (
        select vec_id,
               unnest(embedding::DOUBLE[]) as x,
               unnest(range(0, len(embedding))) as dim
        from embeddings
    ), planes as (
        select plane, dim,
               {_nibble_case("substr(md5(plane::varchar || '-' || dim::varchar), 1, 1)")}::double - 7.5 as comp
        from (select unnest(range(0, {_PLANES})) as plane)
        cross join (select unnest(range(0, 64)) as dim)
    ), dots as (
        select c.vec_id, p.plane, sum(c.x * p.comp) as dot
        from comps c join planes p on c.dim = p.dim
        group by c.vec_id, p.plane
    ), sig as (
        select vec_id,
               string_agg(case when dot > 0 then '1' else '0' end, '' order by plane) as signature
        from dots group by vec_id
    ), q as (
        select e.vec_id as query_id, e.embedding::DOUBLE[] as qv, s.signature
        from embeddings e join sig s using (vec_id) where e.vec_id < 10
    ), c as (
        select e.vec_id as neighbor_id, e.embedding::DOUBLE[] as cv, s.signature
        from embeddings e join sig s using (vec_id)
    ), scored as (
        select query_id, neighbor_id,
               round(list_cosine_similarity(qv, cv), 6) as cosine
        from q join c using (signature)
        where query_id != neighbor_id
    ), r as (
        select *, row_number() over (
            partition by query_id order by cosine desc, neighbor_id
        ) as rn from scored
    )
    select query_id, neighbor_id, cosine from r where rn <= 5
    order by query_id, neighbor_id
"""


@register("embedding_topk_lsh", _LSH_ANN_ORACLE)
def embedding_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via sign-LSH: 6 deterministic (hash-derived) hyperplanes bucket
    the corpus; exact top-5 within the query's bucket. The scale path — the
    cross product never materializes; bucket equi-join instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.topk_neighbors_lsh(
        emb, queries, k=5, num_planes=_PLANES, n_dims=EMB_DIMS
    ).orderBy("query_id", "neighbor_id")


# --------------------------------------------------------------------------
# exact heavy hitters (Misra–Gries candidates + verify pass)
# --------------------------------------------------------------------------

_HH_K = 30

_HH_ORACLE = rf"""
    with tok as (
        select unnest(regexp_split_to_array(trim(text), '\s+')) as term
        from documents
    ), tot as (select count(*) as n from tok)
    select term, count(*) as n_occ, (select n from tot) as n_total
    from tok group by term
    having count(*) * {_HH_K + 1} > (select n from tot)
    order by n_occ desc, term
"""


@register("doc_heavy_hitters", _HH_ORACLE)
def doc_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent terms via the two-pass Misra–Gries scheme: a
    map-only k-counter sketch per partition yields a guaranteed-superset
    candidate set (bounded, folds in as a literal IN-set), then one
    filtered scan exact-counts just the candidates — the full vocabulary
    never shuffles. Output is exactly the terms with count > n/(k+1),
    partition-layout independent, hence the exact SQL oracle
    (``operators.heavy_hitters``)."""
    from flight_radar_pipeline_spark.operators.heavy_hitters import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    return heavy_hitters(docs, "text", k=_HH_K)


# --------------------------------------------------------------------------
# exact-substring boilerplate detection (shared n-token spans)
# --------------------------------------------------------------------------

_SPAN_N = 8       # span length in tokens
_SPAN_MIN_DOCS = 3
_SPAN_TOP = 20

_BOILER_ORACLE = rf"""
    with t as (
        select doc_id, regexp_split_to_array(trim(text), '\s+') as ts
        from documents
    ), spans as (
        select doc_id, array_to_string(ts[i:i+{_SPAN_N - 1}], ' ') as span
        from t, lateral (
            select unnest(range(1, greatest(len(ts) - {_SPAN_N - 2}, 1))) as i
        )
    ), agg as (
        select span,
               count(distinct doc_id) as n_docs,
               count(*) as n_occurrences
        from spans group by span
    )
    select span, n_docs, n_occurrences
    from agg
    where n_docs >= {_SPAN_MIN_DOCS}
    order by n_docs desc, n_occurrences desc, span
    limit {_SPAN_TOP}
"""


@register("doc_boilerplate_spans", _BOILER_ORACLE)
def doc_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring boilerplate mining (the C4/RefinedWeb "repeated
    span" pass): every 8-token span of every document, counted by how
    many DISTINCT documents contain it; spans above the document
    threshold are the boilerplate candidates a cleaning pass would strip.
    Fan-out is one span per token — linear in corpus size — and the
    aggregate combines map-side, so the shuffle carries one row per
    distinct span. At 100 TB the group key would be ``xxhash64(span)``
    with a ``min(span)`` exemplar (identical shuffle width, 8-byte keys);
    the plain-text key here keeps the oracle exactly relational. Top-k
    is fully tiebroken (n_docs, n_occurrences, span)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("ts")
    )
    spans = toks.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("ts") - F.lit(_SPAN_N - 2), F.lit(1)),
            )
        ).alias("i"),
        "ts",
    ).select(
        "doc_id",
        F.array_join(F.slice("ts", F.col("i"), _SPAN_N), " ").alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= _SPAN_MIN_DOCS)
        .orderBy(
            F.desc("n_docs"), F.desc("n_occurrences"), F.asc("span")
        )
        .limit(_SPAN_TOP)
    )


# --------------------------------------------------------------------------
# per-source corpus report (lang entropy + dup rate)
# --------------------------------------------------------------------------

_SOURCE_ORACLE = r"""
    with d as (
        select source, lang,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) as fp,
               n_chars
        from documents
    ), sl as (
        select source, lang, count(*) as c from d group by source, lang
    ), ent as (
        select source,
               round(-sum((c / t) * ln(c / t)), 4) as lang_entropy,
               count(*) as n_langs
        from (select source, lang, c,
                     sum(c) over (partition by source) as t from sl)
        group by source
    ), base as (
        select source,
               count(*) as n_docs,
               count(distinct fp) as n_unique,
               round(avg(n_chars), 2) as avg_chars
        from d group by source
    )
    select b.source, b.n_docs, e.n_langs, e.lang_entropy,
           round(1.0 - b.n_unique / b.n_docs, 4) as dup_rate,
           b.avg_chars
    from base b join ent e using (source)
    order by b.source
"""


@register("doc_source_report", _SOURCE_ORACLE)
def doc_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health report — the domain-level triage table a
    web-crawl pipeline ranks sources by before mixing: document count,
    language entropy (−Σ p·ln p over the source's language mix), exact
    duplicate rate (1 − distinct fingerprints / docs) and mean length.
    Two aggregations, both keyed (or partially keyed) on source: a
    (source, lang) count rolled up to entropy, and a per-source
    distinct-fingerprint count — every shuffle is at source or
    source×lang cardinality; the fingerprint distinct-count partial-
    aggregates per source. At 100 TB distinct fingerprints per source
    would swap to HLL (approx_count_distinct) exactly like
    ``approx_distinct_users``."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "lang",
        F.md5(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
        ).alias("fp"),
        "n_chars",
    )
    sl = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    tot = sl.groupBy("source").agg(F.sum("c").alias("t"))
    ent = (
        sl.join(tot, "source")
        .groupBy("source")
        .agg(
            F.round(
                -F.sum((F.col("c") / F.col("t")) * F.log(F.col("c") / F.col("t"))),
                4,
            ).alias("lang_entropy"),
            F.count(F.lit(1)).alias("n_langs"),
        )
    )
    base = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )
    return (
        base.join(ent, "source")
        .select(
            "source",
            "n_docs",
            "n_langs",
            "lang_entropy",
            F.round(1.0 - F.col("n_unique") / F.col("n_docs"), 4).alias(
                "dup_rate"
            ),
            "avg_chars",
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# feature hashing (hashing-trick TF vectorization)
# --------------------------------------------------------------------------

_HTF_D = 64  # hashed feature dimensionality

_HTF_ORACLE = rf"""
    with tok as (
        select doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) as t
        from documents
    ), bucketed as (
        select doc_id,
               ('0x' || substr(md5(t), 1, 12))::bigint % {_HTF_D} as bucket
        from tok
    ), tf as (
        select doc_id, bucket, count(*) as c
        from bucketed group by doc_id, bucket
    )
    select doc_id,
           count(*) as nnz,
           round(sqrt(sum(c * c)), 4) as l2_norm,
           min(bucket) filter (
               where c = (select max(c2.c) from tf c2
                           where c2.doc_id = tf.doc_id)) as top_bucket
    from tf group by doc_id
    order by doc_id
"""


@register("doc_hashing_tf", _HTF_ORACLE)
def doc_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick TF vectorization (HashingTF): every token maps to
    one of 64 hashed feature buckets (md5-derived, engine-portable — the
    same ``functions.text.hash_bucket`` primitive the deterministic
    samplers use), per-document bucket counts form the sparse feature
    vector, and the entry reports its profile (nnz, L2 norm, dominant
    bucket with a min-bucket tiebreak). No vocabulary pass, no
    dictionary broadcast — THE point of feature hashing at 100 TB: one
    explode (linear fan-out) and two partial-aggregated groupBys on
    uniform hash keys."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("t")
    )
    bucketed = tok.select("doc_id", T.hash_bucket("t", _HTF_D).alias("bucket"))
    tf = bucketed.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    # argmax-by-count with min-bucket tiebreak as a struct max — ordinary
    # partial-aggregable agg, no window pass over the TF table
    arg = F.max(
        F.struct(F.col("c"), (-F.col("bucket")).alias("nb"))
    )
    return (
        tf.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("nnz"),
            F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 4).alias(
                "l2_norm"
            ),
            (-arg["nb"]).cast("bigint").alias("top_bucket"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# topic clusters over hashed-TF vectors (text → vector → cluster)
# --------------------------------------------------------------------------

_TOPIC_K = 6  # deterministic first-K-doc quantizer

_TOPIC_ORACLE = rf"""
    with tok as (
        select doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) as t
        from documents
    ), tf as (
        select doc_id,
               ('0x' || substr(md5(t), 1, 12))::bigint % {_HTF_D} as bucket,
               count(*) as c
        from tok group by doc_id, bucket
    ), vecs as (
        select doc_id,
               map(list(bucket order by bucket),
                   list(c order by bucket)) as m
        from tf group by doc_id
    ), dense as (
        select doc_id,
               list_transform(range(0, {_HTF_D}),
                              i -> coalesce(m[i][1], 0)::DOUBLE) as v
        from vecs
    ), cents as (
        select doc_id as cent_id, v as cv,
               sqrt(list_inner_product(v, v)) as cnrm
        from dense where doc_id < {_TOPIC_K}
    ), scored as (
        select d.doc_id, c.cent_id,
               round(list_inner_product(d.v, c.cv)
                     / (sqrt(list_inner_product(d.v, d.v)) * c.cnrm), 6)
                   as sim,
               row_number() over (
                   partition by d.doc_id
                   order by round(list_inner_product(d.v, c.cv)
                       / (sqrt(list_inner_product(d.v, d.v)) * c.cnrm), 6)
                       desc, c.cent_id) as rk
        from dense d cross join cents c
    )
    select doc_id, cent_id as cell, sim as cosine
    from scored where rk = 1
    order by doc_id
"""


@register("doc_topic_clusters", _TOPIC_ORACLE)
def doc_topic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text → vector → cluster composition: documents become 64-dim
    hashed-TF vectors (the ``doc_hashing_tf`` featurizer, densified
    through a map literal per doc), then cluster-assign against the
    deterministic first-K-doc quantizer with the SAME shuffle-free
    inline-argmax operator the embedding pipeline uses
    (``kmeans_cluster_assignments`` — centroids fold in as array
    literals, assignment is a projection over the scan). The point is
    compositional: every stage (tokenize → hash-bucket → aggregate →
    densify → assign) is the engine's own operator, and the whole chain
    still has an exact relational oracle. Swap ``collect_centroids`` for
    ``kmeans_centroids`` to train the quantizer instead of seeding it."""
    from flight_radar_pipeline_spark.operators.similarity import (
        collect_centroids,
        kmeans_cluster_assignments,
    )

    docs = load_table(spark, sf_dir, "documents")

    def _dense(d: DataFrame) -> DataFrame:
        tok = d.select(
            "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("t")
        )
        tf = tok.select(
            "doc_id", T.hash_bucket("t", _HTF_D).alias("bucket")
        ).groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("c"))
        return (
            tf.groupBy("doc_id")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("bucket", "c"))
                ).alias("m")
            )
            .select(
                "doc_id",
                F.transform(
                    F.sequence(F.lit(0), F.lit(_HTF_D - 1)),
                    lambda i: F.coalesce(
                        F.element_at("m", i.cast("bigint")), F.lit(0)
                    ).cast("double"),
                ).alias("tfv"),
            )
        )

    # the first-K-by-id quantizer needs only the K smallest doc_ids with
    # tokenizable text, and each doc's TF vector depends on its own text
    # alone — featurize just those K docs for the centroid collect
    # instead of running the full corpus TF chain at build time
    # (round-13, guide §2.2: project/filter early). `dense` contains
    # exactly the docs with non-null text (a present text always yields
    # >= 1 split token), so the K-smallest filter commutes with the
    # featurizer.
    seed_docs = (
        docs.filter(F.col("text").isNotNull())
        .orderBy("doc_id")
        .limit(_TOPIC_K)
        .select("doc_id", "text")
    )
    cents = collect_centroids(
        _dense(seed_docs), num_centroids=_TOPIC_K, id_col="doc_id",
        vec_col="tfv",
    )
    return (
        kmeans_cluster_assignments(
            _dense(docs), cents, id_col="doc_id", vec_col="tfv"
        )
        .select("doc_id", "cell", F.col("cosine"))
        .orderBy("doc_id")
    )

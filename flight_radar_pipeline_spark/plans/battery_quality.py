"""Corpus-quality battery, part 3: model-based quality proxies and graph
centrality — bigram-LM perplexity scoring, PII redaction, PageRank over
the order co-occurrence graph, chunk-level dedup accounting.

Same contract as the other batteries: every Spark plan is paired with a
DuckDB oracle stating the identical deterministic computation in SQL;
doubles round in-plan on both sides, counts are bigint on both sides,
every output has a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions import text as T
from flight_radar_pipeline_spark.operators.corpus_prep import chunk_documents
from flight_radar_pipeline_spark.operators.graph import (
    connected_components,
    pagerank,
)
from flight_radar_pipeline_spark.operators.linalg import (
    _seed_vector,
    int8_quantization_error,
    top_principal_component,
)
from flight_radar_pipeline_spark.operators.lm import bigram_lm_scores
from flight_radar_pipeline_spark.operators.sketches import (
    cms_estimate,
    cms_sketch,
)
from flight_radar_pipeline_spark.plans.battery import register
from flight_radar_pipeline_spark.plans.battery_text import (
    EMB_DIMS,
    _MINHASH_ORACLE,
    _nibble_case,
    _shared_near_dup_pairs,
)
from flight_radar_pipeline_spark.sources.readers import load_table


# --------------------------------------------------------------------------
# bigram-LM perplexity scoring (CCNet-style quality filtering)
# --------------------------------------------------------------------------

_LM_ALPHA = 0.5

_LM_ORACLE = rf"""
    with t as (
        select doc_id, regexp_split_to_array(trim(text), '\s+') as toks
        from documents
    ), bg as (
        -- parallel unnests zip positionally: (toks[i], toks[i+1]) pairs
        select doc_id,
               unnest(toks[1:len(toks)-1]) as w1,
               unnest(toks[2:len(toks)]) as w2
        from t
    ), c2 as (
        select w1, w2, count(*) as c2 from bg group by w1, w2
    ), c1 as (
        select w1, count(*) as c1 from bg group by w1
    ), v as (
        select count(distinct term) as v
        from (select unnest(toks) as term from t)
    )
    select doc_id,
           count(*) as n_bigrams,
           round(avg(-ln((c2 + {_LM_ALPHA}) / (c1 + {_LM_ALPHA} * v))), 4)
               as avg_nll
    from bg join c2 using (w1, w2) join c1 using (w1) cross join v
    group by doc_id
    order by doc_id
"""


@register("doc_lm_perplexity", _LM_ORACLE)
def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity filtering, the standard model-based quality signal for
    corpus curation: score every document by a corpus-trained add-alpha
    bigram LM (avg_nll = log-perplexity; high → out-of-distribution or
    degenerate text). Training is two hash aggregates, the model stays a
    distributed table, scoring is one bigram-keyed join — no Python, no
    model artifact. See ``operators.lm`` for the scale posture."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_lm_scores(docs, alpha=_LM_ALPHA).orderBy("doc_id")


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# The synthetic corpus carries no PII, so both sides graft a
# deterministic contact line onto each document before scanning — the
# patterns then have real, varied matches to find and mask.
_PII_SYNTH_SQL = (
    "text || ' contact-' || doc_id || '@example.com from 10.'"
    " || (doc_id % 256) || '.0.' || (doc_id % 250)"
    " || ' ref ' || (900000000 + doc_id)"
)

_PII_ORACLE = rf"""
    with s as (
        select doc_id, {_PII_SYNTH_SQL} as synth from documents
    )
    select doc_id,
           len(regexp_extract_all(synth,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) as n_email,
           len(regexp_extract_all(synth,
               '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b')) as n_ipv4,
           len(regexp_extract_all(synth, '\b\d{{9,}}\b')) as n_idnum,
           md5(regexp_replace(regexp_replace(regexp_replace(synth,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
               '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b', '<IP>', 'g'),
               '\b\d{{9,}}\b', '<NUM>', 'g')) as redacted_fp
    from s
    order by doc_id
"""


@register("doc_pii_redaction", _PII_ORACLE)
def doc_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: count and mask emails / IPv4 addresses / long id
    numbers in one scan (match counts for audit, md5 of the redacted text
    proving byte-identical masking across engines). Pure sequential
    regexp exprs — scan speed at any scale, no UDF; patterns kept to the
    Java∩RE2 regex subset (``functions.text.PII_PATTERNS``)."""
    docs = load_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact-"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" ref "),
        (F.lit(900000000) + F.col("doc_id")).cast("string"),
    )
    s = docs.select("doc_id", synth.alias("__synth"))
    return s.select(
        "doc_id",
        *[
            T.pii_count("__synth", pattern).alias(f"n_{name}")
            for name, pattern, _ in T.PII_PATTERNS
        ],
        F.md5(T.redact_pii("__synth")).alias("redacted_fp"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# PageRank over the customer–supplier co-occurrence graph
# --------------------------------------------------------------------------

_PR_ITERS, _PR_DAMP = 3, 0.85


def _pr_iteration_sql(prev: str, name: str) -> str:
    return f"""{name} as (
        select nodes.node,
               (1 - {_PR_DAMP}) / min(n.n)
                   + {_PR_DAMP} * coalesce(sum(p.pr / outd.deg), 0) as pr
        from nodes
        cross join n
        left join edges on edges.dst = nodes.node
        left join outd on outd.src = edges.src
        left join {prev} p on p.node = edges.src
        group by nodes.node
    )"""


_PAGERANK_ORACLE = f"""
    with pair as (
        select distinct 'c' || o_custkey as a, 's' || l_suppkey as b
        from lineitem join orders on l_orderkey = o_orderkey
    ), edges as (
        select a as src, b as dst from pair
        union all
        select b as src, a as dst from pair
    ), nodes as (
        select distinct src as node from edges
    ), n as (
        select count(*)::double as n from nodes
    ), outd as (
        select src, count(*)::double as deg from edges group by src
    ), p0 as (
        select node, 1.0 / n.n as pr from nodes cross join n
    ), {", ".join(_pr_iteration_sql(f"p{i}", f"p{i + 1}") for i in range(_PR_ITERS))}
    select node, round(pr, 8) as pr from p{_PR_ITERS}
    order by node
"""


@register("entity_pagerank", _PAGERANK_ORACLE)
def entity_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed iterations, d=0.85) over the symmetrized
    customer–supplier co-occurrence graph from order lines — entity
    importance on a bipartite transaction graph, the iterative
    matrix-vector class on DataFrames. Edges dedupe + repartition on src
    once; each iteration is one src-keyed join + one dst-keyed sum (see
    ``operators.graph.pagerank``). The oracle unrolls the same three
    iterations as CTEs."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    edges = pair.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pair.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return pagerank(edges, iterations=_PR_ITERS, damping=_PR_DAMP).orderBy("node")


# --------------------------------------------------------------------------
# triangle enumeration over the near-dup graph
# --------------------------------------------------------------------------

_TRIANGLES_ORACLE = f"""
    with pairs as (
        {_MINHASH_ORACLE.replace("order by id_a, id_b", "")}
    ), e as (
        select least(id_a, id_b) as u, greatest(id_a, id_b) as v from pairs
    )
    select e1.u as a, e1.v as b, e2.v as c
    from e e1
    join e e2 on e2.u = e1.v
    join e e3 on e3.u = e1.u and e3.v = e2.v
    order by a, b, c
"""


@register("near_dup_triangles", _TRIANGLES_ORACLE)
def near_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the near-duplicate pair graph (a < b < c
    via canonically-oriented edges — each triangle emitted exactly once):
    the density signal distinguishing mutually-similar CLIQUES (template
    families) from chains of pairwise borderline matches. Two node-keyed
    joins over the canonical edge list; consumes the shared materialized
    pair table. Completes the graph family: components, PageRank,
    triangles."""
    pairs = _shared_near_dup_pairs(spark, sf_dir)
    e = pairs.select(
        F.least("id_a", "id_b").alias("u"), F.greatest("id_a", "id_b").alias("v")
    )
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    return (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
        .orderBy("a", "b", "c")
    )


# --------------------------------------------------------------------------
# multimodal frame sampling
# --------------------------------------------------------------------------

_FRAME_SIZE, _FRAME_K = 64, 4

_FRAMES_ORACLE = f"""
    with p as (
        select doc_id, text,
               octet_length(encode(text))::bigint as blen
        from documents
    ), f as (
        select doc_id, text, blen,
               (blen + {_FRAME_SIZE - 1}) // {_FRAME_SIZE} as n_frames
        from p
    ), idx as (
        select doc_id, text, blen,
               unnest(list_distinct(
                   [(j * n_frames) // {_FRAME_K} for j in range(0, {_FRAME_K})]
               )) as frame_idx
        from f
    )
    select doc_id, frame_idx,
           frame_idx * {_FRAME_SIZE} as start_byte,
           least({_FRAME_SIZE}, blen - frame_idx * {_FRAME_SIZE}) as n_bytes,
           lower(hex(encode(substr(text, frame_idx * {_FRAME_SIZE} + 1, 4))))
               as head_hex
    from idx
    order by doc_id, frame_idx
"""


@register("multimodal_frame_sample", _FRAMES_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-keyframe-style sampling over opaque binary payloads: treat
    each blob as 64-byte frames, slice 4 evenly-spaced ones per document
    through Arrow-batched ``mapInPandas`` (real byte slicing; only the
    frame codec is the documented stub). The oracle restates the integral
    addressing arithmetic; the head-of-frame probe assumes ASCII text,
    true of the synthetic corpus (see ``multimodal.binary.sample_frames``)."""
    from flight_radar_pipeline_spark.multimodal.binary import (
        attach_payload,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(
        attach_payload(docs), frame_size=_FRAME_SIZE, k=_FRAME_K
    ).orderBy("doc_id", "frame_idx")


# --------------------------------------------------------------------------
# robust (median/MAD) outlier flagging
# --------------------------------------------------------------------------

_MAD_SCALE, _MAD_THRESH = 1.4826, 2.0
# approx_percentile accuracy knob for the *_approx twins: error bound is
# 1/accuracy of rank (10000 → 0.01% of rows per queried quantile)
_APPROX_ACC = 10000

_MAD_ORACLE = f"""
    with med as (
        select event_type, quantile_cont(value, 0.5) as med
        from events group by event_type
    ), mad as (
        select e.event_type,
               quantile_cont(abs(e.value - m.med), 0.5) as mad
        from events e join med m using (event_type)
        group by e.event_type
    )
    select e.event_id, e.event_type,
           round((e.value - m.med) / ({_MAD_SCALE} * d.mad), 4) as robust_z
    from events e
    join med m using (event_type)
    join mad d using (event_type)
    where d.mad > 0
      and abs((e.value - m.med) / ({_MAD_SCALE} * d.mad)) > {_MAD_THRESH}
    order by e.event_id
"""


@register("event_value_mad_outliers", _MAD_ORACLE)
def event_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flagging via median/MAD (the estimator that does
    not let the outliers it hunts inflate its own scale, unlike the
    mean/stddev z-score in ``event_value_anomalies``): two per-type
    percentile aggregates (exact ``percentile`` ≡ ``quantile_cont``;
    ``event_value_mad_outliers_approx`` is the 100 TB sketch form)
    broadcast back onto the scan, flag |robust z| > 2."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("__med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(abs(value - __med), 0.5)").alias("__mad")
        )
    )
    z = (F.col("value") - F.col("__med")) / (_MAD_SCALE * F.col("__mad"))
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .filter((F.col("__mad") > 0) & (F.abs(z) > _MAD_THRESH))
        .select("event_id", "event_type", F.round(z, 4).alias("robust_z"))
        .orderBy("event_id")
    )


@register("event_value_mad_outliers_approx", None)  # sketch-valued: rows-only
def event_value_mad_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB production form of ``event_value_mad_outliers``: both
    percentile aggregates swap to ``approx_percentile`` (KLL-class sketch,
    mergeable map-side partials — no per-group sorted buffer, unlike exact
    ``percentile``). The estimate is engine-specific so there is no SQL
    oracle; the exact twin IS the accuracy reference —
    ``tests/test_approx_percentile.py`` bounds the flag-set disagreement
    between the two at sf0.01."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr(f"approx_percentile(value, 0.5, {_APPROX_ACC})").alias("__med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr(
                f"approx_percentile(abs(value - __med), 0.5, {_APPROX_ACC})"
            ).alias("__mad")
        )
    )
    z = (F.col("value") - F.col("__med")) / (_MAD_SCALE * F.col("__mad"))
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .filter((F.col("__mad") > 0) & (F.abs(z) > _MAD_THRESH))
        .select("event_id", "event_type", F.round(z, 4).alias("robust_z"))
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# int8 scalar quantization error
# --------------------------------------------------------------------------

_Q_ORACLE = f"""
    with x as (
        select vec_id, embedding::DOUBLE[] as x from embeddings
    ), dims as (
        select unnest(range(1, {EMB_DIMS} + 1)) as d
    ), comp as (
        select d, min(x[d]) as dmn, max(x[d]) as dmx
        from x cross join dims group by d
    ), s as (
        select list(dmn order by d) as mn, list(dmx order by d) as mx from comp
    )
    select vec_id,
           round(list_sum([
               case when s.mx[i] = s.mn[i] then 0.0
                    else pow(x[i] - (s.mn[i]
                         + (least(greatest(floor((x[i] - s.mn[i])
                               / (s.mx[i] - s.mn[i]) * 255 + 0.5) - 128,
                               -128), 127) + 128) / 255.0
                           * (s.mx[i] - s.mn[i])), 2)
               end
               for i in range(1, {EMB_DIMS} + 1)]) / {EMB_DIMS}, 10) as mse
    from x cross join s
    order by vec_id
"""


@register("embedding_int8_quant", _Q_ORACLE)
def embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantization error audit: per-dim corpus ranges from
    ONE shuffle-free wide aggregate, broadcast back for pure array-expr
    quantize/dequantize/MSE per vector — the 4×-compression question ANN
    serving answers with int8, here with exact cross-engine error
    accounting (floor-plus-half rounding keeps the quantized bit pattern
    identical; see ``operators.linalg.int8_quantization_error``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return int8_quantization_error(emb, n_dims=EMB_DIMS).orderBy("vec_id")


# --------------------------------------------------------------------------
# join-key skew profiler
# --------------------------------------------------------------------------

_SKEW_ORACLE = """
    with c as (
        select user_id, count(*) as cnt from events group by user_id
    ), t as (
        select count(*) as n_rows from events
    )
    select * from (
        select 'max_count' as metric, round(max(cnt)::double, 6) as value from c
        union all
        select 'max_share', round(max(cnt)::double / min(t.n_rows), 6)
        from c cross join t
        union all
        select 'n_keys', round(count(*)::double, 6) from c
        union all
        select 'p50_count', round(quantile_cont(cnt, 0.5), 6) from c
        union all
        select 'p99_count', round(quantile_cont(cnt, 0.99), 6) from c
    )
    order by metric
"""


@register("event_key_skew_report", _SKEW_ORACLE)
def event_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for events.user_id — the diagnostic run
    BEFORE choosing salted join vs AQE skew handling: key cardinality,
    heaviest-key count and share, p50/p99 per-key counts. One groupBy
    collapses the facts to one row per key map-side; every statistic
    then aggregates that tiny counts table."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    total = ev.agg(F.count(F.lit(1)).alias("__n"))
    stats = counts.crossJoin(F.broadcast(total)).agg(
        F.round(F.max("cnt").cast("double"), 6).alias("__max_count"),
        F.round(
            F.max("cnt").cast("double") / F.min("__n").cast("double"), 6
        ).alias("__max_share"),
        F.round(F.count(F.lit(1)).cast("double"), 6).alias("__n_keys"),
        F.round(F.expr("percentile(cnt, 0.5)"), 6).alias("__p50"),
        F.round(F.expr("percentile(cnt, 0.99)"), 6).alias("__p99"),
    )
    rows = [
        ("max_count", "__max_count"),
        ("max_share", "__max_share"),
        ("n_keys", "__n_keys"),
        ("p50_count", "__p50"),
        ("p99_count", "__p99"),
    ]
    return (
        stats.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("metric"),
                            F.col(c).alias("value"),
                        )
                        for name, c in rows
                    ]
                )
            ).alias("r")
        )
        .select("r.metric", "r.value")
        .orderBy("metric")
    )


# --------------------------------------------------------------------------
# incremental dedup against the already-ingested corpus
# --------------------------------------------------------------------------

_HIST_SPLIT = 250

_INCR_DEDUP_ORACLE = rf"""
    with fp as (
        select doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) as fp
        from documents
    ), hist as (
        select distinct fp from fp where doc_id < {_HIST_SPLIT}
    ), new as (
        select doc_id, fp from fp where doc_id >= {_HIST_SPLIT}
    ), firstnew as (
        select fp, min(doc_id) as first_id from new group by fp
    )
    select n.doc_id,
           (h.fp is null and n.doc_id = f.first_id) as keep,
           case when h.fp is not null then 'dup_of_history'
                when n.doc_id != f.first_id then 'dup_in_batch'
                else 'kept' end as reason
    from new n
    left join hist h using (fp)
    join firstnew f using (fp)
    order by n.doc_id
"""


@register("doc_incremental_dedup", _INCR_DEDUP_ORACLE)
def doc_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: the new batch (doc_id ≥ 250 stands in
    for today's arrivals) is deduped against the FINGERPRINT TABLE of the
    already-ingested corpus (doc_id < 250) — one fp-keyed join + one
    batch-local window; the historical text is never re-read. History
    precedence, then keep-min within the batch
    (``operators.dedup.incremental_exact_dedup``)."""
    from flight_radar_pipeline_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    history = docs.filter(F.col("doc_id") < _HIST_SPLIT).select(
        T.fingerprint("text").alias("fp")
    )
    new = docs.filter(F.col("doc_id") >= _HIST_SPLIT)
    return incremental_exact_dedup(new, history).orderBy("doc_id")


# --------------------------------------------------------------------------
# funnel mining in one pass (array fold, no self-joins)
# --------------------------------------------------------------------------

_FUNNEL_STEPS = ("signup", "click", "purchase")

_FUNNEL_ORACLE = """
    with s1 as (
        select user_id, min(ts) as t from events
        where event_type = 'signup' group by user_id
    ), s2 as (
        select e.user_id, min(e.ts) as t
        from events e join s1 using (user_id)
        where e.event_type = 'click' and e.ts > s1.t
        group by e.user_id
    ), s3 as (
        select e.user_id, min(e.ts) as t
        from events e join s2 using (user_id)
        where e.event_type = 'purchase' and e.ts > s2.t
        group by e.user_id
    )
    select * from (
        select '1_signup' as stage, count(*) as n_users from s1
        union all
        select '2_click', count(*) from s2
        union all
        select '3_purchase', count(*) from s3
    )
    order by stage
"""


@register("signup_click_purchase_funnel", _FUNNEL_ORACLE)
def signup_click_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (signup → click → purchase, strictly
    increasing timestamps) computed in ONE pass: per-user time-sorted
    event arrays folded through a stage machine — no per-step self-join
    cascade over the fact table (the SQL oracle states exactly that
    cascade). One user-keyed shuffle; per-user state is (stage, last_ts).
    Sequences are bounded by per-user activity; for unbounded streams the
    stateful sessionizer surface is the right tool."""
    from flight_radar_pipeline_spark.operators.temporal import funnel_stages

    ev = load_table(spark, sf_dir, "events")
    steps = list(_FUNNEL_STEPS)
    stages = funnel_stages(ev, steps).select(F.col("stage").alias("__stage"))
    counts = stages.agg(
        *[
            F.count(F.when(F.col("__stage") > k, 1)).alias(f"__n{k}")
            for k in range(len(steps))
        ]
    )
    rows = [
        F.struct(
            F.lit(f"{k + 1}_{step}").alias("stage"),
            F.col(f"__n{k}").alias("n_users"),
        )
        for k, step in enumerate(steps)
    ]
    return (
        counts.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.stage", "r.n_users")
        .orderBy("stage")
    )


# --------------------------------------------------------------------------
# contiguous global row ids (no global window)
# --------------------------------------------------------------------------


@register(
    "doc_contiguous_ids",
    """
    select doc_id,
           row_number() over (order by doc_id) - 1 as row_id
    from documents
    order by doc_id
    """,
)
def doc_contiguous_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 0..N-1 row ids in doc_id order WITHOUT the single-task
    global window: approximate range boundaries bucket the table
    map-side, per-bucket row_numbers run in parallel, and cumulative
    bucket counts (a ≤64-row frame) lift them to global ranks — ids are
    exactly ``row_number() − 1`` for any partitioning or boundary
    quality (``operators.ids``). The oracle states the global window the
    operator refuses to run."""
    from flight_radar_pipeline_spark.operators.ids import contiguous_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return contiguous_ids(docs, "doc_id", buckets=64).orderBy("doc_id")


# --------------------------------------------------------------------------
# per-group feature standardization
# --------------------------------------------------------------------------


@register(
    "event_value_zscore",
    """
    with s as (
        select event_type,
               avg(value) as mu,
               stddev_pop(value) as sigma
        from events group by event_type
    )
    select e.event_id, e.event_type,
           round((e.value - s.mu) / s.sigma, 4) as z
    from events e join s using (event_type)
    order by e.event_id
    """,
)
def event_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization (feature scaling): group stats
    via ONE hash aggregate (full map-side partials) broadcast back onto
    the fact scan — not a ``Window.partitionBy(event_type)``, which would
    funnel the whole table through 5 tasks at 100× scale (the
    low-cardinality-window anti-pattern this entry exists to displace)."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("__mu"),
        F.stddev_pop("value").alias("__sigma"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round((F.col("value") - F.col("__mu")) / F.col("__sigma"), 4).alias(
                "z"
            ),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# equi-depth histogram without a global sort
# --------------------------------------------------------------------------

_DECILE_PROBS = [i / 10 for i in range(1, 10)]

_DECILES_ORACLE = f"""
    with b as (
        select [{", ".join(f"quantile_cont(o_totalprice, {p})" for p in _DECILE_PROBS)}]
            as bounds
        from orders
    )
    select len(list_filter(b.bounds, x -> o.o_totalprice > x)) + 1 as decile,
           count(*) as n,
           round(min(o.o_totalprice), 2) as lo,
           round(max(o.o_totalprice), 2) as hi,
           round(sum(o.o_totalprice), 2) as total
    from orders o cross join b
    group by 1
    order by decile
"""


@register("order_price_deciles", _DECILES_ORACLE)
def order_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile histogram of order prices WITHOUT ``ntile``'s
    global sort: exact interpolated boundaries from one aggregate
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, bit-compatible;
    ``order_price_deciles_approx`` is the 100 TB sketch form), broadcast
    back for a map-side bucket assignment, then a 10-group aggregate.
    The fact table is never sorted or single-tasked."""
    orders = load_table(spark, sf_dir, "orders")
    probs = ", ".join(str(p) for p in _DECILE_PROBS)
    bounds = orders.agg(
        F.expr(f"percentile(o_totalprice, array({probs}))").alias("__bounds")
    )
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(
            (
                F.size(
                    F.filter(
                        F.col("__bounds"), lambda b: F.col("o_totalprice") > b
                    )
                )
                + 1
            )
            .cast("bigint")
            .alias("decile"),
            "o_totalprice",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("decile")
    )


@register("order_price_deciles_approx", None)  # sketch-valued: rows-only
def order_price_deciles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``order_price_deciles`` with ``approx_percentile`` boundaries — the
    form that survives 100 TB (the sketch merges map-side; exact
    ``percentile`` holds each group's values in a sorted buffer). Bucket
    populations stay within sketch error of equi-depth; that tolerance is
    asserted against the exact twin in
    ``tests/test_approx_percentile.py``, so the driver row is rows-only by
    design (estimates are engine-specific)."""
    orders = load_table(spark, sf_dir, "orders")
    probs = ", ".join(str(p) for p in _DECILE_PROBS)
    bounds = orders.agg(
        F.expr(
            f"approx_percentile(o_totalprice, array({probs}), {_APPROX_ACC})"
        ).alias("__bounds")
    )
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(
            (
                F.size(
                    F.filter(
                        F.col("__bounds"), lambda b: F.col("o_totalprice") > b
                    )
                )
                + 1
            )
            .cast("bigint")
            .alias("decile"),
            "o_totalprice",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# data-quality constraint report (Deequ-style validation)
# --------------------------------------------------------------------------

_DQ_ORACLE = """
    with a as (
        select count(*) as c,
               count(distinct o_orderkey) as d,
               count(o_custkey) as nn,
               count(*) filter (where o_totalprice >= 0) as pos,
               count(*) filter (where o_orderstatus in ('O', 'F', 'P')) as dom,
               count(*) filter (where o_orderdate >= timestamp '1995-01-01'
                                  and o_orderdate < timestamp '2002-01-01') as dr
        from orders
    )
    select * from (
        select 'row_count' as constraint_name, round(c::double, 2) as metric,
               c > 0 as passed from a
        union all
        select 'orderkey_unique', round(d::double / c, 6), d = c from a
        union all
        select 'custkey_complete', round(nn::double / c, 6), nn = c from a
        union all
        select 'totalprice_nonneg', round(pos::double / c, 6), pos = c from a
        union all
        select 'status_in_domain', round(dom::double / c, 6), dom = c from a
        union all
        select 'orderdate_in_range', round(dr::double / c, 6), dr = c from a
    )
    order by constraint_name
"""


@register("table_quality_report", _DQ_ORACLE)
def table_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality validation (the Deequ/expectations
    pattern): uniqueness, completeness, non-negativity, domain and range
    constraints over ``orders``, evaluated as ONE aggregate scan —
    every metric is a conditional count computed map-side, the exact
    distinct count is the only shuffle — then unpivoted into one
    (constraint, metric, passed) row each, the report a pipeline gates a
    write on."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.agg(
        F.count(F.lit(1)).alias("c"),
        F.count_distinct("o_orderkey").alias("d"),
        F.count("o_custkey").alias("nn"),
        F.count(F.when(F.col("o_totalprice") >= 0, 1)).alias("pos"),
        F.count(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("dom"),
        F.count(
            F.when(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2002-01-01").cast("timestamp")),
                1,
            )
        ).alias("dr"),
    )
    c = F.col("c").cast("double")

    def row(name: str, metric, passed):
        return F.struct(
            F.lit(name).alias("constraint_name"),
            metric.alias("metric"),
            passed.alias("passed"),
        )

    checks = [
        row("row_count", F.round(c, 2), F.col("c") > 0),
        row("orderkey_unique", F.round(F.col("d") / c, 6), F.col("d") == F.col("c")),
        row("custkey_complete", F.round(F.col("nn") / c, 6), F.col("nn") == F.col("c")),
        row("totalprice_nonneg", F.round(F.col("pos") / c, 6), F.col("pos") == F.col("c")),
        row("status_in_domain", F.round(F.col("dom") / c, 6), F.col("dom") == F.col("c")),
        row("orderdate_in_range", F.round(F.col("dr") / c, 6), F.col("dr") == F.col("c")),
    ]
    return (
        a.select(F.explode(F.array(*checks)).alias("r"))
        .select("r.constraint_name", "r.metric", "r.passed")
        .orderBy("constraint_name")
    )


# --------------------------------------------------------------------------
# count-min sketch point estimates
# --------------------------------------------------------------------------

_CMS_D, _CMS_W, _CMS_PROBE = 4, 256, 20

_CMS_ORACLE = f"""
    with r as (
        select unnest(range(0, {_CMS_D})) as row
    ), b as (
        select r.row,
               ('0x' || substr(md5(r.row || '-' || e.user_id), 1, 12))::bigint
                   % {_CMS_W} as bucket
        from events e cross join r
    ), sketch as (
        select row, bucket, count(*) as c from b group by row, bucket
    ), keys as (
        select distinct user_id from events where user_id < {_CMS_PROBE}
    ), kb as (
        select k.user_id, r.row,
               ('0x' || substr(md5(r.row || '-' || k.user_id), 1, 12))::bigint
                   % {_CMS_W} as bucket
        from keys k cross join r
    )
    select kb.user_id, min(s.c) as est
    from kb join sketch s on s.row = kb.row and s.bucket = kb.bucket
    group by kb.user_id
    order by kb.user_id
"""


@register("user_count_cms_estimates", _CMS_ORACLE)
def user_count_cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates: fold all event traffic into
    a 4×256 counter grid (one tiny groupBy, map-side
    partials, mergeable across partitions/days by addition), then
    point-query the broadcast grid for a fixed probe set of users. The
    frequency-sketch companion to the HLL entry; md5-derived hashes make
    the whole sketch — not just its error bound — exactly reproducible,
    so the oracle states the identical grid. Never under-counts
    (pinned in tests/test_quality_ops.py)."""
    ev = load_table(spark, sf_dir, "events")
    sketch = cms_sketch(ev, "user_id", depth=_CMS_D, width=_CMS_W)
    keys = ev.filter(F.col("user_id") < _CMS_PROBE).select("user_id").distinct()
    return cms_estimate(
        sketch, keys, "user_id", depth=_CMS_D, width=_CMS_W
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# stream-static enrichment
# --------------------------------------------------------------------------


@register(
    "enriched_events_stream",
    """
    select e.event_id, e.user_id, c.c_mktsegment as segment
    from events e
    left join customer c on c.c_custkey = e.user_id
    order by e.event_id
    """,
)
def enriched_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream broadcast-left-joins
    the static customer dimension per micro-batch (stateless — no
    watermark, no state store), emitting exactly the batch left join the
    oracle states. The streaming face of the broadcast-dim join family
    (``streaming.events.enrich_events_stream``)."""
    from flight_radar_pipeline_spark.sources.readers import load_table as _lt
    from flight_radar_pipeline_spark.streaming.events import (
        enrich_events_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    dim = _lt(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    out = enrich_events_stream(events, dim).select(
        "event_id", "user_id", F.col("c_mktsegment").alias("segment")
    )
    return run_stream_to_memory(out, output_mode="append").orderBy("event_id")


# --------------------------------------------------------------------------
# chunk-level dedup accounting
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# end-to-end dedup decision table (exact + near-dup composed)
# --------------------------------------------------------------------------

_DEDUP_DECISIONS_ORACLE = rf"""
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
    ), clusters as (
        select u as doc_id, min(v) as cluster_id from reach group by u
    ), fp as (
        select doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) as fp
        from documents
    ), keepfp as (
        select fp, min(doc_id) as keeper from fp group by fp
    )
    select f.doc_id,
           (f.doc_id = k.keeper
            and (c.cluster_id is null or c.cluster_id = f.doc_id)) as keep,
           case when f.doc_id != k.keeper then 'exact_dup'
                when c.cluster_id is not null and c.cluster_id != f.doc_id
                     then 'near_dup'
                else 'kept' end as reason
    from fp f
    join keepfp k using (fp)
    left join clusters c on c.doc_id = f.doc_id
    order by f.doc_id
"""


@register("doc_dedup_decisions", _DEDUP_DECISIONS_ORACLE)
def doc_dedup_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup stage's actual OUTPUT: one decision row per document —
    keep / drop with a reason, composing exact dedup (keep-min per
    canonical md5 fingerprint) with near-dup clustering (keep-min per
    MinHash-LSH connected component; exact-dup takes precedence in the
    reason). One fingerprint-keyed window + the shared materialized pair
    table + a node-keyed left join; the full corpus is never shuffled
    more than once."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = Window.partitionBy("__fp")
    exact = docs.select(
        "doc_id", T.fingerprint("text").alias("__fp")
    ).select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("__exact_keep"),
    )
    clusters = connected_components(_shared_near_dup_pairs(spark, sf_dir))
    j = exact.join(clusters, "doc_id", "left")
    near_loser = F.col("cluster_id").isNotNull() & (
        F.col("cluster_id") != F.col("doc_id")
    )
    return j.select(
        "doc_id",
        (F.col("__exact_keep") & ~near_loser).alias("keep"),
        F.when(~F.col("__exact_keep"), F.lit("exact_dup"))
        .when(near_loser, F.lit("near_dup"))
        .otherwise(F.lit("kept"))
        .alias("reason"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# top principal component by power iteration
# --------------------------------------------------------------------------

_PCA_ITERS = 3


def _pca_oracle_sql(n_dims: int, iterations: int) -> str:
    nib = _nibble_case("substr(md5('pca-' || dim::varchar), 1, 1)")
    norm = "[e / sqrt(list_inner_product(vraw, vraw)) for e in vraw]"
    ctes = [
        f"dims as (select unnest(range(0, {n_dims})) as dim)",
        "x as (select embedding::DOUBLE[] as x from embeddings)",
        f"v0raw as (select list({nib} - 7.5 order by dim) as vraw from dims)",
        f"v0 as (select {norm} as v from v0raw)",
    ]
    for i in range(1, iterations + 1):
        ctes += [
            f"""d{i} as (
                select x.x, list_inner_product(x.x, v{i - 1}.v) as dot
                from x cross join v{i - 1})""",
            f"""c{i} as (
                select dim, sum(x[dim + 1] * dot) as c
                from d{i} cross join dims group by dim)""",
            f"v{i}raw as (select list(c order by dim) as vraw from c{i})",
            f"v{i} as (select {norm} as v from v{i}raw)",
        ]
    return f"""
    with {", ".join(ctes)}
    select dim,
           round(case when list_sum(v) < 0 then -v[dim + 1]
                      else v[dim + 1] end, 6) as loading
    from v{iterations} cross join dims
    order by dim
"""


_PCA_ORACLE = _pca_oracle_sql(EMB_DIMS, _PCA_ITERS)


@register("embedding_top_component", _PCA_ORACLE)
def embedding_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding table by 3 rounds of
    power iteration — the spectral primitive behind PCA whitening and
    embedding-drift monitoring. Each round is ONE scan: per-row dots
    against the broadcast 1-row current vector, then a single global
    aggregate of 64 sums (shuffle-free wide-aggregate shape). md5-seeded
    init and a sum-sign convention make the eigenvector engine-stable;
    see ``operators.linalg``."""
    emb = load_table(spark, sf_dir, "embeddings")
    return top_principal_component(
        emb, "embedding", n_dims=EMB_DIMS, iterations=_PCA_ITERS
    ).orderBy("dim")


_CHUNK_WIN, _CHUNK_STRIDE = 32, 24

_CHUNK_DEDUP_ORACLE = rf"""
    with t as (
        select doc_id, regexp_split_to_array(trim(text), '\s+') as toks
        from documents
    ), starts as (
        select doc_id, toks,
               unnest(range(1, greatest(len(toks), 1) + 1, {_CHUNK_STRIDE}))
                   as start
        from t
    ), ch as (
        select doc_id,
               (start - 1) // {_CHUNK_STRIDE} as chunk_idx,
               md5(array_to_string(
                   toks[start:least(start + {_CHUNK_WIN} - 1, len(toks))], ' '
               )) as chunk_hash
        from starts
    ), ranked as (
        select doc_id, chunk_hash,
               row_number() over (
                   partition by chunk_hash order by doc_id, chunk_idx
               ) as rn
        from ch
    )
    select doc_id,
           count(*) as n_chunks,
           count(*) filter (where rn > 1) as n_dup_chunks,
           round((count(*) filter (where rn > 1))::double / count(*), 4)
               as dup_ratio
    from ranked
    group by doc_id
    order by doc_id
"""


@register("doc_chunk_dedup_rate", _CHUNK_DEDUP_ORACLE)
def doc_chunk_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup accounting: slide the standard (32, 24) token
    window over every document (``operators.corpus_prep.chunk_documents``
    — row-local, zero shuffle), then keep the FIRST occurrence of each
    chunk hash corpus-wide ((doc_id, chunk_idx) order) and report per-doc
    duplicate-chunk counts. One hash-keyed window is the only shuffle —
    the sub-document dedup signal RAG/embedding pipelines budget by."""
    docs = load_table(spark, sf_dir, "documents")
    ch = chunk_documents(docs, window=_CHUNK_WIN, stride=_CHUNK_STRIDE)
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")
    ranked = ch.select(
        "doc_id", "chunk_hash", F.row_number().over(w).alias("__rn")
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count(F.when(F.col("__rn") > 1, 1)).alias("n_dup_chunks"),
            F.round(
                F.count(F.when(F.col("__rn") > 1, 1)).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("dup_ratio"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# quality-aware keep-best dedup decisions
# --------------------------------------------------------------------------

def _keep_best_oracle() -> str:
    from flight_radar_pipeline_spark.plans.battery_corpus import _QUALITY_SQL

    return f"""
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
    ), clusters as (
        select u as doc_id, min(v) as cluster_id from reach group by u
    ), {_QUALITY_SQL}
    select c.doc_id, c.cluster_id, q.quality,
           row_number() over (
               partition by c.cluster_id
               order by q.quality desc, c.doc_id
           ) = 1 as kept
    from clusters c join q using (doc_id)
    order by doc_id
"""


@register("doc_keep_best_dedup", _keep_best_oracle())
def doc_keep_best_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup decisions: near-dup clusters (the shared
    MinHash pair table → connected components) keep their HIGHEST
    quality-scored member instead of the lowest id
    (``operators.dedup.keep_best_decisions``) — the policy composition of
    two green families. Oracle: recursive-CTE transitive closure + the
    shared quality-score SQL + the same window argmax."""
    from flight_radar_pipeline_spark.functions import text as T
    from flight_radar_pipeline_spark.operators.dedup import (
        keep_best_decisions,
    )

    pairs = _shared_near_dup_pairs(spark, sf_dir)
    clusters = connected_components(pairs)
    docs = load_table(spark, sf_dir, "documents")
    scores = docs.select("doc_id", T.quality_score("text").alias("quality"))
    return keep_best_decisions(clusters, scores).orderBy("doc_id")


# --------------------------------------------------------------------------
# weight-of-evidence / information-value feature binning
# --------------------------------------------------------------------------

_WOE_PROBS = [i / 10 for i in range(1, 10)]

_WOE_ORACLE = f"""
    with b as (
        select [{", ".join(f"quantile_cont(value, {p})" for p in _WOE_PROBS)}]
            as bounds
        from events
    ), binned as (
        select len(list_filter(b.bounds, x -> e.value > x)) + 1 as bin,
               case when e.event_type = 'purchase' then 1 else 0 end as y
        from events e cross join b
    ), agg as (
        select bin, count(*) as n,
               sum(y)::bigint as n_good,
               (count(*) - sum(y))::bigint as n_bad
        from binned group by bin
    ), tot as (
        select sum(n_good) as tg, sum(n_bad) as tb from agg
    )
    select a.bin, a.n, a.n_good, a.n_bad,
           round(ln(((a.n_good + 0.5) / (t.tg + 0.5))
                  / ((a.n_bad + 0.5) / (t.tb + 0.5))), 6) as woe,
           round(((a.n_good + 0.5) / (t.tg + 0.5)
                 - (a.n_bad + 0.5) / (t.tb + 0.5))
                 * ln(((a.n_good + 0.5) / (t.tg + 0.5))
                    / ((a.n_bad + 0.5) / (t.tb + 0.5))), 6) as iv_contrib
    from agg a cross join tot t
    order by a.bin
"""


@register("event_value_woe_bins", _WOE_ORACLE)
def event_value_woe_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value profile of ``value`` as a
    predictor of purchase events — the classic credit-scoring feature
    screen, and the binned-target-statistics shape every feature store
    computes. Three broadcast-sized aggregates stacked on ONE fact scan
    lineage: exact decile fences (``percentile``, the
    ``order_price_deciles`` pattern), a 10-bin good/bad aggregate, and
    the global totals folded back by broadcast — the fact table is never
    sorted and never shuffled wider than 10 groups. Laplace-smoothed
    (+0.5) so a pure bin can't produce an infinite WOE at any scale."""
    ev = load_table(spark, sf_dir, "events")
    probs = ", ".join(str(p) for p in _WOE_PROBS)
    bounds = ev.agg(
        F.expr(f"percentile(value, array({probs}))").alias("__bounds")
    )
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        (
            F.size(F.filter(F.col("__bounds"), lambda b: F.col("value") > b))
            + 1
        )
        .cast("bigint")
        .alias("bin"),
        (F.col("event_type") == "purchase").cast("bigint").alias("y"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("n_good"),
        (F.count(F.lit(1)) - F.sum("y")).alias("n_bad"),
    )
    tot = agg.agg(
        F.sum("n_good").alias("tg"), F.sum("n_bad").alias("tb")
    )
    g = (F.col("n_good") + 0.5) / (F.col("tg") + 0.5)
    b = (F.col("n_bad") + 0.5) / (F.col("tb") + 0.5)
    woe = F.log(g / b)
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            "n_good",
            "n_bad",
            F.round(woe, 6).alias("woe"),
            F.round((g - b) * woe, 6).alias("iv_contrib"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# RFM customer segmentation (multi-metric quantile coding)
# --------------------------------------------------------------------------

_RFM_QS = [0.2, 0.4, 0.6, 0.8]

from flight_radar_pipeline_spark.operators.rounding import (  # noqa: E402
    expr_round_half_up,
    sql_round_half_up,
)

_RFM_ORACLE = f"""
    with base as (
        select o_custkey as custkey,
               date_diff('day', max(o_orderdate),
                         (select max(o_orderdate) from orders)) as recency_d,
               count(*) as frequency,
               sum(cast(round(o_totalprice * 100) as bigint)) as m_cents
        from orders group by o_custkey
    ), fences as (
        select
            [{", ".join(f"quantile_cont(recency_d, {q})" for q in _RFM_QS)}]
                as rf,
            [{", ".join(f"quantile_cont(frequency, {q})" for q in _RFM_QS)}]
                as ff,
            [{", ".join(f"quantile_cont(m_cents, {q})" for q in _RFM_QS)}]
                as mf
        from base
    ), coded as (
        select b.custkey, b.recency_d, b.frequency, b.m_cents,
               5 - len(list_filter(f.rf, x -> b.recency_d > x)) as r_score,
               len(list_filter(f.ff, x -> b.frequency > x)) + 1 as f_score,
               len(list_filter(f.mf, x -> b.m_cents > x)) + 1 as m_score
        from base b cross join fences f
    )
    select r_score || '-' || f_score || '-' || m_score as segment,
           count(*) as n_customers,
           {sql_round_half_up("sum(m_cents) / (100.0 * count(*))", 2)}
               as avg_monetary,
           {sql_round_half_up("avg(recency_d)", 2)} as avg_recency_d
    from coded
    group by segment
    order by segment
"""


@register("customer_rfm_segments", _RFM_ORACLE)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic marketing cut: per customer compute
    Recency (days since last order, against the corpus max date),
    Frequency (order count) and Monetary (total spend), quintile-code
    each against exact population fences (recency REVERSED: recent = 5),
    and report the segment grid. Three one-pass layers: a per-customer
    aggregate, a 12-number fence aggregate broadcast back, and a
    map-side code assembly into the final |segments|-group rollup — the
    multi-metric generalization of ``order_price_deciles``, same
    exact-percentile ≡ ``quantile_cont`` bridge, same approx swap at
    100 TB. Money is pinned to integer cents per ORDER before any sum
    (the snapshot-diff convention), so fences, codes and segment
    averages are exact integer arithmetic until one final division —
    cross-engine stable with no summation-order sensitivity."""
    orders = load_table(spark, sf_dir, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("__maxd"))
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = (
        orders.crossJoin(F.broadcast(maxd))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.first("__maxd"), F.max("o_orderdate")).alias(
                "recency_d"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(cents).alias("m_cents"),
        )
    )
    qs = ", ".join(str(q) for q in _RFM_QS)
    fences = base.agg(
        F.expr(f"percentile(recency_d, array({qs}))").alias("rf"),
        F.expr(f"percentile(frequency, array({qs}))").alias("ff"),
        F.expr(f"percentile(m_cents, array({qs}))").alias("mf"),
    )

    def code(col: str, fence: str) -> F.Column:
        return (
            F.size(F.filter(F.col(fence), lambda b: F.col(col) > b)) + 1
        ).cast("bigint")

    coded = base.crossJoin(F.broadcast(fences)).select(
        "custkey",
        "recency_d",
        "m_cents",
        (F.lit(6) - code("recency_d", "rf")).alias("r_score"),
        code("frequency", "ff").alias("f_score"),
        code("m_cents", "mf").alias("m_score"),
    )
    return (
        coded.select(
            F.concat_ws(
                "-", F.col("r_score"), F.col("f_score"), F.col("m_score")
            ).alias("segment"),
            "m_cents",
            "recency_d",
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            expr_round_half_up(
                F.sum("m_cents") / (100.0 * F.count(F.lit(1))), 2
            ).alias("avg_monetary"),
            expr_round_half_up(F.avg("recency_d"), 2).alias("avg_recency_d"),
        )
        .orderBy("segment")
    )

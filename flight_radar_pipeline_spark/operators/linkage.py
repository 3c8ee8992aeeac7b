"""End-to-end entity resolution: block → Fellegi–Sunter score →
threshold → transitive cluster → survivorship ("golden record").

The composition the linkage battery entries exercise piecewise
(`part_fs_match_weights`, `part_name_fuzzy_pairs`,
`part_sorted_neighborhood_pairs`, `near_dup_clusters`), assembled into
the one operator an MDM / customer-360 pipeline actually calls. Every
stage keeps its measured scale posture: quadratic work stays inside
blocks, clustering is the label-propagation CC, survivorship is one
grouped aggregate with deterministic per-field rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.graph import connected_components
from flight_radar_pipeline_spark.operators.mining import (
    fellegi_sunter_weights,
)

#: survivorship rules: how a golden field value is chosen per cluster
_RULES = ("longest", "most_frequent", "max", "min")


def resolve_entities(
    records: DataFrame,
    id_col: str,
    block_cols: list[str],
    field_mu: dict[str, tuple[float, float]],
    threshold: float,
    survivorship: dict[str, str],
    agree_fns: dict | None = None,
) -> DataFrame:
    """→ one GOLDEN RECORD per resolved entity: (entity_id, n_members,
    member_ids, <field>... per ``survivorship``).

    Stages, all deterministic:
    1. candidate scoring: ``fellegi_sunter_weights`` (pairs share the
       blocking key; per-field log-evidence weights).
    2. match decision: ``weight >= threshold`` (the caller calibrates
       the threshold against the m/u priors).
    3. transitive closure: ``connected_components`` over match pairs —
       if A–B and B–C match, all three are one entity even when A–C
       was never compared (the property pairwise thresholds alone get
       wrong); entity_id = min member id. Unmatched records become
       singleton entities under their own id.
    4. survivorship: per field, 'longest' (argmax on (length, value)),
       'most_frequent' (mode, value tiebreak), 'max' or 'min' — every
       rule a deterministic aggregate, so the golden table is
       rerun/partition/engine-stable.

    Scale: Σ|block|² scoring + node-sized CC + one grouped aggregate;
    nothing quadratic beyond the blocks.
    """
    for f, rule in survivorship.items():
        if rule not in _RULES:
            raise ValueError(f"unknown survivorship rule {rule!r} for {f!r}")
    scored = fellegi_sunter_weights(
        records, id_col, block_cols, field_mu, agree_fns=agree_fns
    )
    matches = scored.filter(F.col("weight") >= threshold).select(
        "id_a", "id_b"
    )
    cc = connected_components(matches)  # (doc_id, cluster_id)
    labeled = records.join(
        cc.select(
            F.col("doc_id").alias(id_col), F.col("cluster_id").alias("__ent")
        ),
        id_col,
        "left",
    ).withColumn("__ent", F.coalesce("__ent", F.col(id_col)))

    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sort_array(F.collect_list(F.col(id_col))).alias("member_ids"),
    ]
    for f, rule in survivorship.items():
        c = F.col(f)
        if rule == "longest":
            aggs.append(
                F.max(F.struct(F.length(c).alias("l"), c.alias("v")))["v"]
                .alias(f)
            )
        elif rule == "max":
            aggs.append(F.max(c).alias(f))
        elif rule == "min":
            aggs.append(F.min(c).alias(f))
        else:  # most_frequent — resolved by a second tiny aggregate below
            aggs.append(F.collect_list(c).alias(f"__vals_{f}"))

    golden = labeled.groupBy(F.col("__ent").alias("entity_id")).agg(*aggs)
    for f, rule in survivorship.items():
        if rule == "most_frequent":
            # mode with deterministic value tiebreak, computed from the
            # per-cluster value list (cluster sizes are small by
            # construction — blocks bound them)
            golden = golden.withColumn(
                f,
                F.expr(
                    f"array_max(transform(array_distinct(__vals_{f}),"
                    f" v -> struct(size(filter(__vals_{f}, x -> x = v))"
                    f" as n, v as v))).v"
                ),
            ).drop(f"__vals_{f}")
    return golden

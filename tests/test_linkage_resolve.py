"""End-to-end entity resolution: the hand case where transitive closure
matters (A–B and B–C match but A–C alone scores below threshold), plus
survivorship rules and singleton passthrough."""

from __future__ import annotations

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.linkage import resolve_entities

_ROWS = [
    # chained duplicates: 1–2 and 2–3 match; 1–3 amount-disagrees and
    # scores below threshold on its own
    (1, "jonathan smith", "NYC", 100.0),
    (2, "jonathon smith", "NYC", 140.0),
    (3, "jonatan smith", "NYC", 180.0),
    # clean pair
    (4, "mary jones", "LA", 50.0),
    (5, "mary jone", "LA", 55.0),
    # singleton
    (6, "bob brown", "NYC", 999.0),
]

_MU = {"name": (0.9, 0.1), "amount": (0.8, 0.2)}
_AGREE = {
    "name": lambda a, b: F.levenshtein(a, b) <= 2,
    "amount": lambda a, b: F.abs(a - b) <= 50,
}


def _resolve(spark):
    df = spark.createDataFrame(
        _ROWS, "id long, name string, city string, amount double"
    )
    return {
        r.entity_id: r
        for r in resolve_entities(
            df,
            "id",
            ["city"],
            _MU,
            threshold=2.0,
            survivorship={
                "name": "longest",
                "city": "most_frequent",
                "amount": "max",
            },
            agree_fns=_AGREE,
        ).collect()
    }


def test_transitive_closure_merges_the_chain(spark):
    got = _resolve(spark)
    assert set(got) == {1, 4, 6}
    assert list(got[1].member_ids) == [1, 2, 3]
    assert list(got[4].member_ids) == [4, 5]
    assert list(got[6].member_ids) == [6]
    assert got[1].n_members == 3


def test_survivorship_rules(spark):
    got = _resolve(spark)
    # longest name, max-value tiebreak between the two 14-char variants
    assert got[1].name == "jonathon smith"
    assert got[1].amount == 180.0
    assert got[1].city == "NYC"
    assert got[4].name == "mary jones"
    assert got[6].amount == 999.0


def test_threshold_separates_direct_pairs(spark):
    """Sanity on the hand arithmetic: name-agree + amount-agree =
    log2(.9/.1)+log2(.8/.2) ≈ 5.17 ≥ 2; name-agree + amount-disagree ≈
    3.17 − 2 = 1.17 < 2 — the chain exists only through record 2."""
    from flight_radar_pipeline_spark.operators.mining import (
        fellegi_sunter_weights,
    )

    df = spark.createDataFrame(
        _ROWS, "id long, name string, city string, amount double"
    )
    w = {
        (r.id_a, r.id_b): r.weight
        for r in fellegi_sunter_weights(
            df, "id", ["city"], _MU, agree_fns=_AGREE
        ).collect()
    }
    assert w[(1, 2)] > 2.0 and w[(2, 3)] > 2.0
    assert w[(1, 3)] < 2.0

"""Unit tests for the third round-6 operator batch: Fellegi–Sunter
match weights (hand-computed weight arithmetic, null-as-disagreement,
custom agreement functions, block confinement) and the KL-drift entry's
smoothing identity (a slice identical to the corpus scores ~0).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.mining import fellegi_sunter_weights


def _lg2(x: float) -> float:
    return math.log(x) / math.log(2)


def test_fs_weights_hand_computed(spark):
    # fields: color (m=.9, u=.25) equality; size (m=.8, u=.1) ±1 band.
    recs = spark.createDataFrame(
        [(1, "blk", "red", 10), (2, "blk", "red", 11),   # agree, agree
         (3, "blk", "blue", 20),                          # vs 1: dis, dis
         (4, "other", "red", 10)],                        # different block
        "id long, blk string, color string, size long",
    )
    out = {
        (r.id_a, r.id_b): (r.color_agree, r.size_agree, round(r.weight, 6))
        for r in fellegi_sunter_weights(
            recs, "id", ["blk"],
            {"color": (0.9, 0.25), "size": (0.8, 0.1)},
            agree_fns={"size": lambda a, b: F.abs(a - b) <= 1},
        ).collect()
    }
    both = round(_lg2(0.9 / 0.25) + _lg2(0.8 / 0.1), 6)
    neither = round(_lg2(0.1 / 0.75) + _lg2(0.2 / 0.9), 6)
    mixed_dis = round(_lg2(0.1 / 0.75) + _lg2(0.2 / 0.9), 6)
    assert out[(1, 2)] == (True, True, both)
    assert out[(1, 3)] == (False, False, neither)
    assert out[(2, 3)] == (False, False, mixed_dis)
    # id 4 is in another block: exactly the 3 in-block pairs exist
    assert set(out) == {(1, 2), (1, 3), (2, 3)}


def test_fs_null_field_counts_as_disagreement(spark):
    recs = spark.createDataFrame(
        [(1, "b", "x"), (2, "b", None)], "id long, blk string, f string"
    )
    rows = fellegi_sunter_weights(recs, "id", ["blk"], {"f": (0.9, 0.1)}).collect()
    assert len(rows) == 1
    assert rows[0].f_agree is False
    assert round(rows[0].weight, 6) == round(_lg2(0.1 / 0.9), 6)


def test_fs_multi_column_block(spark):
    # pairs require BOTH block columns equal
    recs = spark.createDataFrame(
        [(1, "a", 1, "v"), (2, "a", 1, "v"), (3, "a", 2, "v")],
        "id long, b1 string, b2 long, f string",
    )
    got = {
        (r.id_a, r.id_b)
        for r in fellegi_sunter_weights(
            recs, "id", ["b1", "b2"], {"f": (0.9, 0.1)}
        ).collect()
    }
    assert got == {(1, 2)}


def test_kl_drift_zero_for_identical_slices(spark):
    """A corpus whose every language slice has the same token
    distribution must score (near-)zero drift — the smoothing pushes it
    slightly off 0 only through the slice-size term, identically per
    slice here."""
    from flight_radar_pipeline_spark.plans.battery import REGISTRY
    import flight_radar_pipeline_spark.plans.battery_extras  # noqa: F401

    import tempfile, os
    rows = []
    for off, lang in ((0, "aa"), (1000, "bb")):
        for i in range(30):
            rows.append((off + i, lang, "tok1 tok2 tok3 tok1"))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, lang string, text string"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = REGISTRY["doc_lang_kl_drift"].build(spark, d).collect()
    assert [r.lang for r in out] == ["aa", "bb"]
    # identical distributions and sizes → identical (and tiny) KL
    assert out[0].kl_bits == out[1].kl_bits
    assert abs(out[0].kl_bits) < 1e-4

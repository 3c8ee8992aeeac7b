"""Modality sniffing on hand-built payloads: true signatures route to
their container, signature-free bytes to text/plain, and the documented
inherent ambiguity (text that legitimately begins with a signature) routes
as the container — byte equality is all a sniffer has.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.multimodal.binary import (
    MAGIC_PREFIXES,
    detect_modality,
    route_modalities,
)


def _route(spark, payloads: dict[int, bytes]) -> dict[int, tuple[str, int]]:
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()], "doc_id long, payload binary"
    )
    return {
        r["doc_id"]: (r["modality"], r["byte_len"])
        for r in route_modalities(df).collect()
    }


def test_signatures_route_to_their_container(spark):
    payloads = {
        i: magic + b"somebody" for i, magic in enumerate(MAGIC_PREFIXES.values())
    }
    got = _route(spark, payloads)
    for i, (mtype, magic) in enumerate(MAGIC_PREFIXES.items()):
        assert got[i] == (mtype, len(magic) + 8)


def test_plain_and_short_payloads_are_text(spark):
    got = _route(spark, {0: b"hello world", 1: b"RI", 2: b""})
    assert got[0] == ("text/plain", 11)
    assert got[1] == ("text/plain", 2)
    assert got[2] == ("text/plain", 0)


def test_ambiguous_prefix_routes_as_container(spark):
    # inherent to magic sniffing: text beginning 'RIFF' is
    # indistinguishable from a RIFF container at the byte level
    got = _route(spark, {0: b"RIFF raff text"})
    assert got[0][0] == "audio/riff"


def test_detect_is_pure_expression(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, payload binary")
    plan = (
        df.select(detect_modality("payload"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan

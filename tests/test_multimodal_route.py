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


# ---------------------------------------------------------------------------
# native header parsing: PNG IHDR / GIF logical-screen dimensions
# ---------------------------------------------------------------------------

import struct

from flight_radar_pipeline_spark.multimodal.binary import parse_image_dims


def _dims(spark, payloads: dict[int, bytes]) -> dict[int, tuple]:
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()], "doc_id long, payload binary"
    )
    return {
        r["doc_id"]: (r["modality"], r["width"], r["height"])
        for r in parse_image_dims(df).collect()
    }


def _png(w: int, h: int) -> bytes:
    return (b"\x89PNG\r\n\x1a\x0a\x00\x00\x00\x0dIHDR"
            + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00" + b"pixels")


def _gif(w: int, h: int, ver: bytes = b"89a") -> bytes:
    return b"GIF" + ver + struct.pack("<HH", w, h) + b"\xf7\x00\x00data"


def test_png_dims_parse_big_endian(spark):
    got = _dims(spark, {0: _png(1920, 1080), 1: _png(1, 1), 2: _png(65536, 3)})
    assert got[0] == ("image/png", 1920, 1080)
    assert got[1] == ("image/png", 1, 1)
    assert got[2] == ("image/png", 65536, 3)  # > 2 bytes exercises BE width


def test_gif_dims_parse_little_endian_both_versions(spark):
    got = _dims(spark, {0: _gif(300, 200), 1: _gif(640, 480, ver=b"87a")})
    assert got[0] == ("image/gif", 300, 200)
    assert got[1] == ("image/gif", 640, 480)  # GIF87a shares the GIF8 sniff


def test_non_images_get_null_dims(spark):
    got = _dims(spark, {0: b"plain text", 1: b"", 2: b"\x89PN"})
    for i in range(3):
        assert got[i] == ("text/plain", None, None)


def test_truncated_header_parses_partially_not_crashes(spark):
    # a payload cut inside IHDR: width bytes present, height truncated —
    # substring past the end yields fewer bytes, conv of '' is NULL-ish;
    # the row still routes as png with what the bytes support
    b = _png(800, 600)[:20]  # ends after the width field
    got = _dims(spark, {0: b})
    assert got[0][0] == "image/png"
    assert got[0][1] == 800


# ---------------------------------------------------------------------------
# native JPEG SOF segment walk
# ---------------------------------------------------------------------------

from flight_radar_pipeline_spark.multimodal.binary import (
    parse_jpeg_dims,
    with_jpeg_payload,
)


def _jdims(spark, payloads: dict[int, bytes]) -> dict[int, tuple]:
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "doc_id long, payload binary",
    )
    return {
        r["doc_id"]: (r["modality"], r["sof_marker"], r["width"], r["height"])
        for r in parse_jpeg_dims(df).collect()
    }


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _sof(w: int, h: int, marker: int = 0xC0) -> bytes:
    return _seg(
        marker,
        b"\x08" + struct.pack(">HH", h, w)
        + bytes.fromhex("03011100021101031101"),
    )


def _jfif_app0() -> bytes:
    return _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x48\x00\x48\x00\x00")


def test_jpeg_sof0_after_app0_and_dqt(spark):
    blob = (b"\xff\xd8" + _jfif_app0() + _seg(0xDB, b"\x00" + b"\x00" * 64)
            + _sof(1920, 1080) + b"scan-data")
    got = _jdims(spark, {0: blob})
    assert got[0] == ("image/jpeg", "FFC0", 1920, 1080)


def test_jpeg_sof2_behind_variable_length_app1(spark):
    # Exif APP1 of three different lengths: a fixed-offset slice cannot
    # pass all three; the segment walk must thread the real lengths
    for i, pad in enumerate((0, 17, 255)):
        blob = (b"\xff\xd8" + _seg(0xE1, b"Exif\x00\x00" + b"\x00" * pad)
                + _sof(4000, 8, marker=0xC2) + b"x")
        got = _jdims(spark, {0: blob})
        assert got[0] == ("image/jpeg", "FFC2", 4000, 8), f"pad={pad}"


def test_jpeg_many_segments_then_sof(spark):
    # 5 marker segments before SOF — at the default max_segments=6 bound
    blob = b"\xff\xd8" + b"".join(
        _seg(0xE0 + i, bytes(3 + i)) for i in range(5)
    ) + _sof(12, 34) + b"x"
    got = _jdims(spark, {0: blob})
    assert got[0] == ("image/jpeg", "FFC0", 12, 34)
    # one more pushes SOF past the walk bound: NULL dims, never wrong ones
    blob7 = b"\xff\xd8" + b"".join(
        _seg(0xE0 + i, bytes(3 + i)) for i in range(6)
    ) + _sof(12, 34) + b"x"
    got7 = _jdims(spark, {0: blob7})
    assert got7[0] == ("image/jpeg", None, None, None)


def test_jpeg_malformed_and_truncated_null_dims(spark):
    cases = {
        0: b"plain text",                                   # not jpeg
        1: b"\xff\xd8\xff",                                  # bare SOI+FF
        2: b"\xff\xd8" + b"garbage-no-marker",               # non-FF 3rd byte
        3: (b"\xff\xd8" + _jfif_app0())[:8],                 # cut inside APP0
        4: b"\xff\xd8" + _seg(0xE0, b"x" * 4)[:5],           # truncated len
        5: b"\xff\xd8" + _jfif_app0() + b"\xff\xd9",         # EOI, no SOF
        # sniffs as jpeg (FF D8 FF) but the walk hits a non-FF byte
        6: b"\xff\xd8" + _seg(0xE0, b"ok") + b"not-a-marker" + _sof(9, 9),
    }
    got = _jdims(spark, cases)
    # 3-byte sniff contract (SNIFF_PREFIXES): no FF D8 FF prefix → text
    for i in (0, 2):
        assert got[i] == ("text/plain", None, None, None)
    for i in (1, 3, 4, 5, 6):
        assert got[i][0] == "image/jpeg"
        assert got[i][1:] == (None, None, None), f"case {i}: {got[i]}"


def test_jpeg_synthesis_roundtrip_and_walk_is_pure_expression(spark):
    docs = spark.createDataFrame(
        [(i, f"body {i} " * (i + 1)) for i in range(12)],
        "doc_id long, text string",
    )
    out = parse_jpeg_dims(with_jpeg_payload(docs))
    rows = {r["doc_id"]: r for r in out.collect()}
    for i in range(12):
        if i % 3 == 2:
            assert rows[i]["modality"] == "text/plain"
            continue
        assert rows[i]["modality"] == "image/jpeg"
        assert rows[i]["width"] == i % 4000 + 8
        assert rows[i]["height"] == (i * 11) % 4000 + 8
        assert rows[i]["sof_marker"] == ("FFC0" if i % 3 == 0 else "FFC2")
    plan = (
        out._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan

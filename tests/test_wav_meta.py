"""parse_wav_meta edges the synthesized battery corpus can't hit: a
REAL hand-packed PCM-WAV header (struct-built, not the synthesizer —
catches any shared synth/parse bias), truncated RIFF blobs, and
non-RIFF payloads."""

from __future__ import annotations

import struct

from flight_radar_pipeline_spark.multimodal.binary import parse_wav_meta


def _wav_bytes(ch: int, rate: int, bits: int, data_size: int) -> bytes:
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, rate, rate * ch * bits // 8,
                      ch * bits // 8, bits)
        + b"data"
        + struct.pack("<I", data_size)
        + b"\x00" * 4  # payload may be truncated relative to data_size
    )


def test_parses_hand_packed_header(spark):
    # 2ch 8kHz 16-bit, 32000 data bytes → exactly 1.0 s
    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(2, 8000, 16, 32000)))],
        "doc_id bigint, payload binary",
    )
    row = parse_wav_meta(df).collect()[0]
    assert row["modality"] == "audio/wav"
    assert row["channels"] == 2
    assert row["sample_rate"] == 8000
    assert row["bits"] == 16
    assert row["duration_s"] == 1.0


def test_truncated_riff_degrades_to_nulls(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"RIFF")), (2, bytearray(b"RIFFWAVEonly"))],
        "doc_id bigint, payload binary",
    )
    rows = parse_wav_meta(df).collect()
    for r in rows:
        assert r["modality"] == "audio/wav"  # sniffed, but fields absent
        assert r["channels"] is None and r["duration_s"] is None


def test_non_riff_routes_as_text(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"hello world"))], "doc_id bigint, payload binary"
    )
    row = parse_wav_meta(df).collect()[0]
    assert row["modality"] == "text/plain"
    assert row["sample_rate"] is None


# --------------------------------------------------------------------------
# parse_mp4_meta
# --------------------------------------------------------------------------


def _mp4_bytes(timescale: int, ticks: int) -> bytes:
    ftyp = bytes.fromhex("000000146674797069736f6d0000000069736f6d")
    mvhd = (
        struct.pack(">I", 108) + b"mvhd" + b"\x00" * 12
        + struct.pack(">II", timescale, ticks)
        + b"\x00\x01\x00\x00" + b"\x01\x00" + b"\x00" * 74
    )
    return ftyp + struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd


def test_parses_hand_packed_mvhd(spark):
    from flight_radar_pipeline_spark.multimodal.binary import parse_mp4_meta

    # 90000 ticks/s, 45000 ticks → exactly 0.5 s
    df = spark.createDataFrame(
        [(1, bytearray(_mp4_bytes(90000, 45000)))],
        "doc_id bigint, payload binary",
    )
    row = parse_mp4_meta(df).collect()[0]
    assert row["modality"] == "video/mp4"
    assert row["timescale"] == 90000
    assert row["duration_ticks"] == 45000
    assert row["duration_s"] == 0.5


def test_truncated_mp4_degrades_to_nulls(spark):
    from flight_radar_pipeline_spark.multimodal.binary import parse_mp4_meta

    df = spark.createDataFrame(
        [(1, bytearray(bytes.fromhex("00000014667479706973")))],
        "doc_id bigint, payload binary",
    )
    row = parse_mp4_meta(df).collect()[0]
    assert row["modality"] == "video/mp4"
    assert row["timescale"] is None and row["duration_s"] is None

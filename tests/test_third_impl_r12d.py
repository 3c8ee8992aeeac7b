"""Third-implementation checks, batch 36 — the multimodal decoder family
(round-11 verdict, next-round item 5 named this gap): payload features,
magic-prefix routing, PNG/GIF dimension parse, PCM-WAV stream params,
MP4 mvhd fields, the bounded JPEG marker walk, BMP pixel statistics, and
evenly-spaced frame sampling. The Spark entries parse binary columns
with JVM column expressions (or numpy over Arrow) and the oracles
restate the bytes as hex-string slicing in SQL; this walk synthesizes
the SAME payloads with ``struct``/``bytes`` and parses them back with
Python byte indexing — a genuinely byte-level third statement.
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections import defaultdict

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entry.queries()


def _r(x: float, dp: int) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return {int(i): t for i, t in rows}


def test_payload_features_vs_bytes_walk(spark, docs):
    expected = sorted(
        (
            i,
            len(t.encode()),
            hashlib.md5(t.encode()).hexdigest(),
            t.encode()[:4].hex(),
        )
        for i, t in docs.items()
    )
    got = [
        (r.doc_id, r.byte_len, r.checksum, r.head_hex)
        for r in _run("multimodal_features", spark)
    ]
    assert got == expected


def test_modality_route_vs_prefix_sniff(spark, docs):
    magics = {
        0: b"\xff\xd8\xff\xe0",
        1: b"\x89PNG",
        2: b"RIFF",
    }

    def sniff(b: bytes) -> str:
        if b[:3] == b"\xff\xd8\xff":
            return "image/jpeg"
        if b[:4] == b"\x89PNG":
            return "image/png"
        if b[:4] == b"GIF8":
            return "image/gif"
        if b[:4] == b"RIFF":
            return "audio/riff"
        return "text/plain"

    expected = []
    for i, t in sorted(docs.items()):
        payload = magics.get(i % 4, b"") + t.encode()
        expected.append((i, sniff(payload), len(payload)))

    got = [
        (r.doc_id, r.modality, r.byte_len)
        for r in _run("multimodal_modality_route", spark)
    ]
    assert got == expected


def test_image_dims_vs_struct_parse(spark, docs):
    png_head = b"\x89PNG\r\n\x1a\x0a\x00\x00\x00\x0dIHDR"
    gif_head = b"GIF89a"
    expected = []
    for i, t in sorted(docs.items()):
        w, h = i % 2000 + 16, (i * 7) % 2000 + 16
        if i % 3 == 0:
            blob = png_head + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00"
            assert blob[:8] == b"\x89PNG\r\n\x1a\x0a"
            pw, ph = struct.unpack(">II", blob[16:24])
            expected.append((i, "image/png", pw, ph))
        elif i % 3 == 1:
            blob = gif_head + struct.pack("<HH", w, h) + b"\xf7\x00\x00"
            pw, ph = struct.unpack("<HH", blob[6:10])
            expected.append((i, "image/gif", pw, ph))

    got = [
        (r.doc_id, r.modality, r.width, r.height)
        for r in _run("multimodal_image_dims", spark)
    ]
    assert got == expected


def test_audio_meta_vs_struct_parse(spark, docs):
    expected = []
    for i, t in sorted(docs.items()):
        if i % 2 != 0:
            continue
        ch = i % 2 + 1
        rate = {0: 8000, 1: 16000, 2: 44100}[i % 3]
        ds = len(t.encode()) * 64
        blob = (
            b"RIFF"
            + struct.pack("<I", ds + 36)
            + b"WAVEfmt "
            + struct.pack(
                "<IHHIIHH", 16, 1, ch, rate, rate * ch * 2, ch * 2, 16
            )
            + b"data"
            + struct.pack("<I", ds)
            + t.encode()
        )
        # parse back from bytes alone: canonical PCM-WAV offsets
        assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
        p_ch, p_rate = struct.unpack("<H", blob[22:24])[0], struct.unpack(
            "<I", blob[24:28]
        )[0]
        p_bits = struct.unpack("<H", blob[34:36])[0]
        p_ds = struct.unpack("<I", blob[40:44])[0]
        dur = _r(p_ds / (p_rate * p_ch * (p_bits / 8.0)), 6)
        expected.append((i, "audio/wav", p_ch, p_rate, p_bits, dur))

    got = [
        (r.doc_id, r.modality, r.channels, r.sample_rate, r.bits, r.duration_s)
        for r in _run("multimodal_audio_meta", spark)
    ]
    assert got == expected


def test_video_meta_vs_struct_parse(spark, docs):
    expected = []
    for i, t in sorted(docs.items()):
        if i % 2 != 0:
            continue
        ts = {0: 600, 1: 1000, 2: 90000}[i % 3]
        ticks = len(t.encode()) * 50
        blob = (
            bytes.fromhex("000000146674797069736f6d0000000069736f6d")
            + bytes.fromhex("000000746d6f6f76")
            + bytes.fromhex("0000006c6d76686400000000") + b"\x00" * 8
            + struct.pack(">II", ts, ticks)
            + bytes.fromhex("00010000") + bytes.fromhex("0100") + b"\x00" * 74
            + t.encode()
        )
        assert blob[4:8] == b"ftyp"
        p_ts, p_ticks = struct.unpack(">II", blob[48:56])
        expected.append(
            (i, "video/mp4", p_ts, p_ticks, _r(p_ticks / p_ts, 6))
        )

    got = [
        (r.doc_id, r.modality, r.timescale, r.duration_ticks, r.duration_s)
        for r in _run("multimodal_video_meta", spark)
    ]
    assert got == expected


def test_jpeg_dims_vs_marker_walk(spark, docs):
    sof_tail = bytes.fromhex("03011100021101031101")
    expected = []
    for i, t in sorted(docs.items()):
        w, h2, pad = i % 4000 + 8, (i * 11) % 4000 + 8, i % 32
        if i % 3 == 0:
            blob = (
                bytes.fromhex("FFD8")
                + bytes.fromhex("FFE000104A46494600010100004800480000")
                + bytes.fromhex("FFDB004300") + b"\x00" * 64
                + bytes.fromhex("FFC00011") + b"\x08"
                + struct.pack(">HH", h2, w) + sof_tail
                + t.encode()
            )
        elif i % 3 == 1:
            blob = (
                bytes.fromhex("FFD8")
                + bytes.fromhex("FFE1") + struct.pack(">H", pad + 8)
                + b"Exif\x00\x00" + b"\x00" * pad
                + bytes.fromhex("FFC20011") + b"\x08"
                + struct.pack(">HH", h2, w) + sof_tail
                + t.encode()
            )
        else:
            continue
        # the bounded marker-segment walk, imperatively (1-based pos=3)
        assert blob[:3] == b"\xff\xd8\xff"
        pos, sof = 2, None  # 0-based
        for _step in range(6):
            if sof is not None or blob[pos] != 0xFF:
                break
            if blob[pos + 1] in (0xC0, 0xC2):
                sof = pos
                break
            seg_len = struct.unpack(">H", blob[pos + 2 : pos + 4])[0]
            pos += 2 + seg_len
        assert sof is not None
        marker = "FF" + f"{blob[sof + 1]:02X}"
        ph, pw = struct.unpack(">HH", blob[sof + 5 : sof + 9])
        expected.append((i, "image/jpeg", marker, pw, ph))

    got = [
        (r.doc_id, r.modality, r.sof_marker, r.width, r.height)
        for r in _run("multimodal_jpeg_dims", spark)
    ]
    assert got == expected


def test_bmp_decode_vs_pixel_loop(spark, docs):
    expected = []
    for i in sorted(docs):
        seed, w, h = i % 256, 4 + i % 9, 4 + i % 7
        rs, gs, bs, lumas = [], [], [], []
        for y in range(h):
            for x in range(w):
                b = (seed + 3 * x + 7 * y) % 256
                g = (seed * 5 + x) % 256
                r = (seed * 11 + y) % 256
                rs.append(r)
                gs.append(g)
                bs.append(b)
                lumas.append(0.299 * r + 0.587 * g + 0.114 * b)
        n = len(lumas)
        mu = math.fsum(lumas) / n
        std = math.sqrt(math.fsum((v - mu) ** 2 for v in lumas) / n)
        hist = defaultdict(int)
        for v in lumas:
            hist[int(v // 32)] += 1
        expected.append(
            (
                i, w, h,
                _r(math.fsum(rs) / n, 4),
                _r(math.fsum(gs) / n, 4),
                _r(math.fsum(bs) / n, 4),
                _r(std, 4),
                *[hist[k] for k in range(8)],
            )
        )

    got = [
        (
            r.doc_id, r.width, r.height, r.mean_r, r.mean_g, r.mean_b,
            r.std_luma, r.h0, r.h1, r.h2, r.h3, r.h4, r.h5, r.h6, r.h7,
        )
        for r in _run("multimodal_bmp_decode", spark)
    ]
    assert got == expected


def test_frame_sample_vs_byte_slice_walk(spark, docs):
    fs, k = 64, 4
    expected = []
    for i, t in sorted(docs.items()):
        b = t.encode()
        n_frames = -(-len(b) // fs)
        for idx in sorted({(j * n_frames) // k for j in range(k)}):
            frame = b[idx * fs : idx * fs + fs]
            expected.append((i, idx, idx * fs, len(frame), frame[:4].hex()))

    got = [
        (r.doc_id, r.frame_idx, r.start_byte, r.n_bytes, r.head_hex)
        for r in _run("multimodal_frame_sample", spark)
    ]
    assert got == expected

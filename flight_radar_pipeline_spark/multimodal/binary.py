"""Multimodal columns: image/audio/video as opaque ``binary`` + metadata.

The Spark-side pattern for media at 100 TB: payloads ride as ``BinaryType``
columns (Parquet stores them row-grouped and column-pruned — a metadata-only
query never touches the bytes); decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so the Python side sees zero-copy byte blocks,
never row-at-a-time pickling.

The image/audio codec libraries are not in this container, so the real
decode is a clearly-marked stub (:func:`decode_image_stub`); the
deterministic feature extractor below exercises the full plumbing — binary
column through Arrow, typed struct out, partition-preserving — with
byte-level semantics an SQL oracle can restate.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("byte_len", IntegerType(), True),
        StructField("checksum", StringType(), True),
        StructField("head_hex", StringType(), True),
    ]
)


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata struct
    (here UTF-8 bytes of the text stand in for media bytes; in production
    this is the raw image/audio blob and its container metadata)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("byte_len"),
            F.lit("text/plain").alias("media_type"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def decode_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic per-payload features via Arrow-batched ``mapInPandas``.

    Batch shape: the function receives whole Arrow record batches (pandas
    DataFrames), emits one feature row per payload — the exact plumbing a
    real image-resize / audio-frame-sample UDF uses, minus the codec.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": pdf[payload_col].map(len).astype("int32"),
                    "checksum": pdf[payload_col].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "head_hex": pdf[payload_col].map(lambda b: bytes(b)[:4].hex()),
                }
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def decode_image_stub(payload: bytes) -> dict:
    """COMPRESSED-codec decode — NOT AVAILABLE in this environment.

    The stub keeps shrinking: header metadata is parsed natively for
    PNG/GIF/JPEG/WAV/MP4 (pure column expressions), and RAW pixel
    formats decode FULLY — :func:`decode_bmp_stats` does real 24-bpp
    BMP pixel decode (numpy over Arrow batches: channel means, luma
    std, luminance histogram). What remains here is strictly the
    compressed-codec path (PNG deflate, JPEG DCT, video), whose
    production implementation decodes ``payload`` with PIL/ffmpeg
    inside the same ``mapInPandas`` batch loop. Kept as an explicit
    stub so the plumbing stays honest about what is fake.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL/ffmpeg, not present in this container"
        ) from exc
    raise NotImplementedError("wire PIL decode here when codecs are available")


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("frame_idx", LongType(), True),
        StructField("start_byte", LongType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("head_hex", StringType(), True),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_size: int = 64,
    k: int = 4,
) -> DataFrame:
    """Evenly-spaced frame sampling over an opaque binary payload — the
    video-keyframe / audio-window shape: treat the blob as ``frame_size``-
    byte frames, pick ``k`` evenly spaced indices (deduped when the
    payload is short), and emit one row per sampled frame with its byte
    addressing and a head-of-frame probe. The byte SLICING is real
    (Arrow-batched ``mapInPandas``, zero-copy byte blocks); only the
    codec that would decode each frame is the documented stub
    (:func:`decode_image_stub`). Addressing arithmetic is integral, so an
    SQL oracle restates it exactly.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ("doc_id", "frame_idx", "start_byte", "n_bytes", "head_hex")}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n_frames = -(-len(b) // frame_size)
                for idx in sorted({(j * n_frames) // k for j in range(k)}):
                    start = idx * frame_size
                    frame = b[start : start + frame_size]
                    out["doc_id"].append(did)
                    out["frame_idx"].append(idx)
                    out["start_byte"].append(start)
                    out["n_bytes"].append(len(frame))
                    out["head_hex"].append(frame[:4].hex())
            yield pd.DataFrame(out)

    return df.mapInPandas(sample, schema=FRAME_SCHEMA)


# Standard container magic numbers (public file-format signatures). RIFF
# containers (WAV/AVI/WebP) share the 'RIFF' prefix; the fourth class is
# plain text with no signature.
MAGIC_PREFIXES = {
    "image/jpeg": b"\xff\xd8\xff\xe0",
    "image/png": b"\x89PNG",
    "audio/riff": b"RIFF",
}

# Sniffing table: JPEG is recognized on the 3-byte SOI+marker prefix
# ff d8 ff so Exif (ff d8 ff e1) and other APPn variants route as
# image/jpeg, not just the JFIF payloads MAGIC_PREFIXES synthesizes.
# GIF87a/GIF89a share the 4-byte 'GIF8' prefix.
SNIFF_PREFIXES = {
    "image/jpeg": b"\xff\xd8\xff",
    "image/png": b"\x89PNG",
    "image/gif": b"GIF8",
    "audio/riff": b"RIFF",
}


def with_magic_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a mixed-modality corpus: each document's UTF-8 bytes get
    a real container signature prepended by ``id % 4`` (jpeg / png / riff /
    none) — deterministic, so an oracle can state the expected routing
    while the Spark side genuinely byte-sniffs."""
    body = F.encode(F.col(text_col), "UTF-8")
    magics = list(MAGIC_PREFIXES.values())
    sel = F.col(id_col) % 4
    payload = F.when(sel == 0, F.concat(F.lit(bytearray(magics[0])), body))
    for i in (1, 2):
        payload = payload.when(
            sel == i, F.concat(F.lit(bytearray(magics[i])), body)
        )
    payload = payload.otherwise(body)
    return df.select(F.col(id_col), payload.alias("payload"))


def detect_modality(payload: F.Column | str) -> F.Column:
    """Modality from the payload's leading bytes (magic-number sniff) as a
    pure column expression — metadata-only routing that never leaves the
    JVM and, over Parquet, reads just the first bytes' column pages.
    Inherent sniffing caveat: content that legitimately begins with a
    signature (e.g. text starting 'RIFF') routes as that container."""
    col = F.col(payload) if isinstance(payload, str) else payload
    out = F.lit("text/plain")
    for mtype, magic in sorted(SNIFF_PREFIXES.items(), reverse=True):
        head = F.hex(F.substring(col, 1, len(magic)))
        out = F.when(head == magic.hex().upper(), F.lit(mtype)).otherwise(out)
    return out


# ---------------------------------------------------------------------------
# native image-header parsing: PNG IHDR + GIF logical screen descriptor
# ---------------------------------------------------------------------------

_PNG_HEAD = b"\x89PNG\r\n\x1a\x0a\x00\x00\x00\x0dIHDR"  # sig + IHDR len + tag
_PNG_TAIL = b"\x08\x06\x00\x00\x00"  # bit depth 8, RGBA, deflate, none, none
_GIF_HEAD = b"GIF89a"
_GIF_TAIL = b"\xf7\x00\x00"  # GCT flags, background index, aspect ratio


def with_image_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a mixed image/text corpus with STRUCTURALLY REAL
    container headers: ``id % 3`` picks PNG (8-byte signature + IHDR
    chunk with 4-byte big-endian width/height), GIF (GIF89a + 2-byte
    little-endian logical-screen width/height), or headerless text; the
    document's UTF-8 bytes stand in for the compressed pixel data.
    Dimensions derive deterministically from the id, so an oracle can
    synthesize byte-identical blobs — while the PARSER reads them back
    from the bytes alone."""
    body = F.encode(F.col(text_col), "UTF-8")
    did = F.col(id_col)
    w = (did % 2000 + 16).cast("bigint")
    h = ((did * 7) % 2000 + 16).cast("bigint")

    def be4(c):  # 4-byte big-endian
        return F.unhex(F.lpad(F.hex(c), 8, "0"))

    def le2(c):  # 2-byte little-endian (GIF)
        hx = F.lpad(F.hex(c), 4, "0")
        return F.unhex(F.concat(F.substring(hx, 3, 2), F.substring(hx, 1, 2)))

    png = F.concat(
        F.lit(bytearray(_PNG_HEAD)), be4(w), be4(h),
        F.lit(bytearray(_PNG_TAIL)), body,
    )
    gif = F.concat(
        F.lit(bytearray(_GIF_HEAD)), le2(w), le2(h),
        F.lit(bytearray(_GIF_TAIL)), body,
    )
    payload = (
        F.when(did % 3 == 0, png).when(did % 3 == 1, gif).otherwise(body)
    )
    return df.select(did.alias(id_col), payload.alias("payload"))


def parse_image_dims(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """→ (id, modality, width, height): image dimensions parsed NATIVELY
    from the binary payload with pure column expressions — no codec, no
    Python. PNG: 4-byte big-endian width/height at IHDR offsets 17/21
    (1-based); GIF: 2-byte little-endian logical-screen width/height at
    offsets 7/9 (byte-swapped via per-byte hex). ``substring`` on the
    binary column slices bytes JVM-side, so only the first ~24 bytes of
    each blob are touched — over Parquet this is scan-speed metadata
    extraction at any corpus size. Non-image payloads get NULL dims."""
    p = F.col(payload_col)
    is_png = F.hex(F.substring(p, 1, 8)) == _PNG_HEAD[:8].hex().upper()
    is_gif = F.hex(F.substring(p, 1, 4)) == b"GIF8".hex().upper()

    def be_int(start: int, n: int):
        return F.conv(F.hex(F.substring(p, start, n)), 16, 10).cast("int")

    def le2_int(start: int):
        return F.conv(
            F.concat(
                F.hex(F.substring(p, start + 1, 1)),
                F.hex(F.substring(p, start, 1)),
            ),
            16,
            10,
        ).cast("int")

    return df.select(
        F.col(id_col),
        F.when(is_png, F.lit("image/png"))
        .when(is_gif, F.lit("image/gif"))
        .otherwise(F.lit("text/plain"))
        .alias("modality"),
        F.when(is_png, be_int(17, 4)).when(is_gif, le2_int(7)).alias("width"),
        F.when(is_png, be_int(21, 4)).when(is_gif, le2_int(9)).alias("height"),
    )


# JPEG: SOI, then marker segments FF xx [len_hi len_lo payload…]; frame
# dimensions live in the SOF0 (baseline, FF C0) or SOF2 (progressive,
# FF C2) segment: precision u8, height u16 BE, width u16 BE after the
# 2-byte length. Unlike PNG/GIF/WAV the SOF offset is NOT fixed — APPn /
# DQT segments of arbitrary length precede it — so parsing requires a
# real segment walk, not a fixed-offset slice.
_JPEG_SOI = b"\xff\xd8"
# APP0 JFIF v1.1, no thumbnail (16-byte segment) — canonical baseline head
_JPEG_APP0 = bytes.fromhex("ffe000104a46494600010100004800480000")
# DQT: 67-byte segment (table id 0 + 64 zero entries — structurally real)
_JPEG_DQT = bytes.fromhex("ffdb004300") + b"\x00" * 64
# SOF tail after width: 3 components (YCbCr 4:2:0-ish sampling/quant ids)
_JPEG_SOF_TAIL = bytes.fromhex("03011100021101031101")


def with_jpeg_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a mixed JPEG/text corpus with STRUCTURALLY REAL marker
    streams: ``id % 3 == 0`` → baseline JFIF (SOI, APP0, DQT, SOF0 —
    dims behind two fixed-length segments), ``id % 3 == 1`` →
    progressive Exif-style (SOI, APP1 whose length VARIES with the id,
    SOF2 — so the parser's segment walk is load-bearing, a fixed-offset
    slice cannot pass), else headerless text. Dimensions derive
    deterministically from the id; the document's UTF-8 bytes stand in
    for the entropy-coded scan data."""
    body = F.encode(F.col(text_col), "UTF-8")
    did = F.col(id_col)
    w = (did % 4000 + 8).cast("bigint")
    h = ((did * 11) % 4000 + 8).cast("bigint")

    def be2(c):
        return F.lpad(F.hex(c), 4, "0")

    sof = lambda marker: F.unhex(  # noqa: E731 — local hex assembler
        F.concat(
            F.lit(marker + "001108"), be2(h), be2(w),
            F.lit(_JPEG_SOF_TAIL.hex().upper()),
        )
    )
    # APP1 payload: 'Exif\0\0' + id%32 pad bytes → segment length varies
    pad = (did % 32).cast("int")
    app1 = F.unhex(
        F.concat(
            F.lit("FFE1"),
            be2((pad + 8).cast("bigint")),  # 2 len + 6 'Exif\0\0' + pad
            F.lit(b"Exif\x00\x00".hex().upper()),
            F.repeat(F.lit("00"), pad),
        )
    )
    baseline = F.concat(
        F.lit(bytearray(_JPEG_SOI + _JPEG_APP0 + _JPEG_DQT)),
        sof("FFC0"), body,
    )
    progressive = F.concat(
        F.lit(bytearray(_JPEG_SOI)), app1, sof("FFC2"), body
    )
    payload = (
        F.when(did % 3 == 0, baseline)
        .when(did % 3 == 1, progressive)
        .otherwise(body)
    )
    return df.select(did.alias(id_col), payload.alias("payload"))


def parse_jpeg_dims(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_segments: int = 6,
    head_bytes: int = 1024,
) -> DataFrame:
    """→ (id, modality, sof_marker, width, height): JPEG frame
    dimensions parsed NATIVELY with a bounded marker-segment walk as a
    pure column expression — an ``aggregate`` fold over
    ``max_segments`` steps threads the byte offset through the segment
    chain (each step: require the FF prefix, stop on SOF0/SOF2, else
    advance by 2 + the segment's big-endian length). No codec, no
    Python, and only the first ``head_bytes`` bytes are ever hexed.

    Malformed input degrades to NULL dims, never to wrong ones: a
    non-FF byte where a marker should be, a truncated length field, or
    a SOF beyond the walk/head bound all leave the accumulator's SOF
    offset NULL. Standalone RST markers (no length) appear only inside
    entropy-coded scan data, after SOS — a dimension walk never reaches
    them. Non-JPEG payloads get NULL dims and 'text/plain'."""
    p = F.col(payload_col)
    is_jpeg = F.hex(F.substring(p, 1, 3)) == "FFD8FF"
    hx = F.hex(F.substring(p, 1, head_bytes))

    def at(bytepos, nbytes: int):
        # 1-based byte k ↔ hex offset 2k−1; bytepos is a Column
        return F.substring(hx, bytepos * 2 - 1, nbytes * 2)

    def step(acc, _):
        pos = acc["pos"]
        ff_ok = at(pos, 1) == "FF"
        mk = at(pos + 1, 1)
        is_sof = mk.isin("C0", "C2")
        seglen = F.conv(at(pos + 2, 2), 16, 10).cast("long")
        new_sof = F.coalesce(acc["sof"], F.when(ff_ok & is_sof, pos))
        new_pos = F.when(
            acc["sof"].isNotNull() | ~ff_ok | is_sof, pos
        ).otherwise(pos + 2 + seglen)
        return F.struct(new_pos.alias("pos"), new_sof.alias("sof"))

    acc0 = F.struct(
        F.lit(3).cast("long").alias("pos"),
        F.lit(None).cast("long").alias("sof"),
    )
    walked = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_segments)), acc0, step
    )
    sof = F.when(is_jpeg, walked["sof"])
    height = F.conv(F.substring(hx, sof * 2 + 9, 4), 16, 10).cast("int")
    width = F.conv(F.substring(hx, sof * 2 + 13, 4), 16, 10).cast("int")
    marker = F.concat(F.lit("FF"), F.substring(hx, sof * 2 + 1, 2))
    return df.select(
        F.col(id_col),
        F.when(is_jpeg, F.lit("image/jpeg"))
        .otherwise(F.lit("text/plain"))
        .alias("modality"),
        F.when(sof.isNotNull(), marker).alias("sof_marker"),
        F.when(sof.isNotNull(), width).alias("width"),
        F.when(sof.isNotNull(), height).alias("height"),
    )


def route_modalities(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """→ (id, modality, byte_len): the routing table a multimodal ingest
    writes (then ``partitionBy("modality")``) so each decoder fleet reads
    only its container type. Pure column exprs; scan-speed at any scale."""
    return df.select(
        F.col(id_col),
        detect_modality(payload_col).alias("modality"),
        F.octet_length(F.col(payload_col)).cast("bigint").alias("byte_len"),
    )


_WAV_RIFF = b"RIFF"
_WAV_WAVEFMT = b"WAVEfmt \x10\x00\x00\x00\x01\x00"  # fmt len 16, PCM
_WAV_DATA = b"data"
_WAV_BITS = 16


def with_audio_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a mixed audio/text corpus with STRUCTURALLY REAL
    PCM-WAV headers (RIFF chunk size, channel count, sample rate, byte
    rate, block align, bits-per-sample, data chunk size — all
    little-endian at their canonical offsets); the document's UTF-8
    bytes stand in for the sample data. ``id % 2`` picks WAV or
    headerless text; channels/rate derive deterministically from the id
    so an oracle can synthesize byte-identical blobs while the PARSER
    reads them back from the bytes alone (the image-dims device,
    ``with_image_payload``, applied to audio)."""
    body = F.encode(F.col(text_col), "UTF-8")
    did = F.col(id_col)
    ch = (did % 2 + 1).cast("bigint")
    rate = (
        F.when(did % 3 == 0, 8000)
        .when(did % 3 == 1, 16000)
        .otherwise(44100)
        .cast("bigint")
    )
    ds = (F.octet_length(body) * 64).cast("bigint")

    def le(c, nbytes: int):
        hx = F.lpad(F.hex(c), 2 * nbytes, "0")
        return F.unhex(
            F.concat(
                *[
                    F.substring(hx, 2 * nbytes - 2 * i - 1, 2)
                    for i in range(nbytes)
                ]
            )
        )

    byterate = rate * ch * (_WAV_BITS // 8)
    wav = F.concat(
        F.lit(bytearray(_WAV_RIFF)),
        le(ds + 36, 4),
        F.lit(bytearray(_WAV_WAVEFMT)),
        le(ch, 2),
        le(rate, 4),
        le(byterate, 4),
        le(ch * (_WAV_BITS // 8), 2),
        le(F.lit(_WAV_BITS).cast("bigint"), 2),
        F.lit(bytearray(_WAV_DATA)),
        le(ds, 4),
        body,
    )
    payload = F.when(did % 2 == 0, wav).otherwise(body)
    return df.select(did.alias(id_col), payload.alias("payload"))


def parse_wav_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """→ (id, modality, channels, sample_rate, duration_s): PCM-WAV
    stream parameters parsed NATIVELY from the binary payload — channel
    count (offset 23, LE u16), sample rate (25, LE u32), bits-per-sample
    (35, LE u16), data-chunk size (41, LE u32); duration is
    data / (rate · channels · bits/8). Pure column exprs touching only
    the first 44 bytes of each blob — scan-speed audio manifest
    extraction at any corpus size, the audio face of
    ``parse_image_dims``. Non-RIFF payloads get NULL fields."""
    p = F.col(payload_col)
    is_wav = F.hex(F.substring(p, 1, 4)) == _WAV_RIFF.hex().upper()

    def le_int(start: int, nbytes: int):
        return F.conv(
            F.concat(
                *[
                    F.hex(F.substring(p, start + nbytes - 1 - i, 1))
                    for i in range(nbytes)
                ]
            ),
            16,
            10,
        ).cast("bigint")

    ch = le_int(23, 2)
    rate = le_int(25, 4)
    bits = le_int(35, 2)
    ds = le_int(41, 4)
    dur = ds / (rate * ch * (bits / F.lit(8.0)))
    return df.select(
        F.col(id_col),
        F.when(is_wav, F.lit("audio/wav"))
        .otherwise(F.lit("text/plain"))
        .alias("modality"),
        F.when(is_wav, ch).alias("channels"),
        F.when(is_wav, rate).alias("sample_rate"),
        F.when(is_wav, bits).alias("bits"),
        F.when(is_wav, F.round(dur, 6)).alias("duration_s"),
    )


# minimal fixed-layout MP4: 20-byte ftyp box, then moov>mvhd(v0) with
# timescale at byte 49 and duration at byte 53 (both big-endian u32)
_MP4_FTYP = bytes.fromhex("000000146674797069736f6d0000000069736f6d")
_MVHD_PRE = bytes.fromhex("0000006c6d76686400000000") + b"\x00" * 8


def with_video_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a mixed video/text corpus with STRUCTURALLY REAL
    minimal MP4 headers — valid ftyp box, then a moov box whose first
    child is a version-0 mvhd carrying the movie timescale and duration
    in ticks (big-endian, at the canonical fixed offsets this minimal
    layout pins). ``id % 2`` picks MP4 or headerless text; timescale and
    duration derive deterministically from the id/text so an oracle can
    synthesize byte-identical blobs while the PARSER reads them back
    from the bytes alone — the third leg of the image/audio/video
    metadata triad."""
    body = F.encode(F.col(text_col), "UTF-8")
    did = F.col(id_col)
    timescale = (
        F.when(did % 3 == 0, 600)
        .when(did % 3 == 1, 1000)
        .otherwise(90000)
        .cast("bigint")
    )
    ticks = (F.octet_length(body) * 50).cast("bigint")

    def be4(c):
        return F.unhex(F.lpad(F.hex(c), 8, "0"))

    # rate 1.0, volume 1.0, then reserved+matrix+pre_defined+next_track
    # zeros — exactly 80 bytes after duration so the 108-byte mvhd size
    # in _MVHD_PRE is structurally true
    mvhd_tail = b"\x00\x01\x00\x00" + b"\x01\x00" + b"\x00" * 74
    moov_size = 8 + 108
    mp4 = F.concat(
        F.lit(bytearray(_MP4_FTYP)),
        be4(F.lit(moov_size).cast("bigint")),
        F.lit(bytearray(b"moov")),
        F.lit(bytearray(_MVHD_PRE)),
        be4(timescale),
        be4(ticks),
        F.lit(bytearray(mvhd_tail)),
        body,
    )
    payload = F.when(did % 2 == 0, mp4).otherwise(body)
    return df.select(did.alias(id_col), payload.alias("payload"))


def parse_mp4_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """→ (id, modality, timescale, duration_ticks, duration_s): movie
    header fields parsed NATIVELY from the mvhd box (big-endian u32 at
    the fixed offsets of the minimal ftyp+moov layout) with pure column
    exprs over the first 56 bytes. MP4 is sniffed on the 'ftyp' box tag
    at byte 5 — the container's actual signature position (the leading
    4 bytes are the box SIZE, not magic). General box-walking (moov not
    first, v1 mvhd) needs an iterator and stays behind the documented
    codec stub; this covers the fixed layout a transcode fleet emits."""
    p = F.col(payload_col)
    is_mp4 = F.hex(F.substring(p, 5, 4)) == b"ftyp".hex().upper()

    def be_int(start: int, n: int):
        return F.conv(F.hex(F.substring(p, start, n)), 16, 10).cast("bigint")

    ts = be_int(49, 4)
    ticks = be_int(53, 4)
    return df.select(
        F.col(id_col),
        F.when(is_mp4, F.lit("video/mp4"))
        .otherwise(F.lit("text/plain"))
        .alias("modality"),
        F.when(is_mp4, ts).alias("timescale"),
        F.when(is_mp4, ticks).alias("duration_ticks"),
        F.when(is_mp4, F.round(ticks / ts.cast("double"), 6)).alias("duration_s"),
    )


# ---------------------------------------------------------------------------
# BMP: the one image container this environment can FULLY decode — 24-bpp
# uncompressed pixels need no codec, just byte arithmetic. This closes the
# pixel-decode gap for raw formats; only COMPRESSED codecs (PNG deflate,
# JPEG DCT, video) remain behind decode_image_stub.
# ---------------------------------------------------------------------------

BMP_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
        StructField("std_luma", DoubleType(), True),
        StructField("luma_hist", ArrayType(LongType()), True),
    ]
)


def synth_bmp_bytes(seed: int, width: int, height: int) -> bytes:
    """A REAL 24-bpp bottom-up uncompressed BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + 4-byte-padded BGR rows) with a deterministic
    per-(seed, x, y) pixel pattern — any conforming viewer opens it.
    Used by tests and corpus synthesis; the asymmetric pattern makes
    row-order (bottom-up) and stride mistakes visible."""
    import struct

    stride = (width * 3 + 3) // 4 * 4
    img_size = stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        for x in range(width):
            b = (seed + 3 * x + 7 * y) % 256
            g = (seed * 5 + x) % 256
            r = (seed * 11 + y) % 256
            row += bytes((b, g, r))
        row += b"\x00" * (stride - width * 3)
        rows.append(bytes(row))
    return header + b"".join(rows)


def synth_bmp_payloads(
    df: DataFrame,
    seed_col: str = "seed",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """Distributed BMP fixture generator: appends a ``payload`` binary
    column holding :func:`synth_bmp_bytes`(seed, width, height) per row —
    the corpus-synthesis side of the decode hot loop, run as the same
    Arrow-batched ``mapInPandas`` shape as the decoder so the battery
    entry exercises binary columns through Arrow in BOTH directions.
    Linear in rows × pixels; partition-preserving (no shuffle)."""
    from pyspark.sql.types import BinaryType

    schema = StructType(
        list(df.schema.fields) + [StructField("payload", BinaryType(), True)]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                synth_bmp_bytes(int(s), int(w), int(h))
                for s, w, h in zip(
                    pdf[seed_col], pdf[width_col], pdf[height_col]
                )
            ]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def decode_bmp_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """FULL pixel decode for 24-bpp uncompressed BMP payloads →
    (doc_id, width, height, mean_r, mean_g, mean_b, std_luma,
    luma_hist[8]): Arrow-batched ``mapInPandas`` + numpy — each batch's
    byte blobs reshape to (height, stride) → crop → (h, w, 3) BGR →
    channel means, Rec.601 luma std, and an 8-bin luminance histogram,
    the actual decode→feature-extract hot loop of an image-corpus
    pipeline (brightness/contrast quality gates, dedup-by-histogram).
    Non-BMP / non-24bpp / compressed payloads yield NULL stats rows —
    route them to the codec path instead. Rounds means/std to 4:
    numpy's pairwise sums are deterministic for a fixed array shape, so
    the output is rerun-stable."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "width", "height", "mean_r", "mean_g", "mean_b",
                "std_luma", "luma_hist",
            )}
            for did, raw in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(did)
                blob = bytes(raw)
                ok = (
                    len(blob) >= 54
                    and blob[:2] == b"BM"
                    and int.from_bytes(blob[28:30], "little") == 24
                    and int.from_bytes(blob[30:34], "little") == 0
                )
                if not ok:
                    for k in list(out)[1:]:
                        out[k].append(None)
                    continue
                off = int.from_bytes(blob[10:14], "little")
                w = int.from_bytes(blob[18:22], "little", signed=True)
                h = int.from_bytes(blob[22:26], "little", signed=True)
                stride = (w * 3 + 3) // 4 * 4
                if h <= 0 or w <= 0 or len(blob) < off + stride * h:
                    for k in list(out)[1:]:
                        out[k].append(None)
                    continue
                arr = np.frombuffer(
                    blob, dtype=np.uint8, count=stride * h, offset=off
                ).reshape(h, stride)[::-1, : w * 3].reshape(h, w, 3)
                bgr = arr.astype(np.float64)
                luma = (
                    0.299 * bgr[:, :, 2]
                    + 0.587 * bgr[:, :, 1]
                    + 0.114 * bgr[:, :, 0]
                )
                hist, _ = np.histogram(luma, bins=8, range=(0.0, 256.0))
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(round(float(bgr[:, :, 2].mean()), 4))
                out["mean_g"].append(round(float(bgr[:, :, 1].mean()), 4))
                out["mean_b"].append(round(float(bgr[:, :, 0].mean()), 4))
                out["std_luma"].append(round(float(luma.std()), 4))
                out["luma_hist"].append([int(v) for v in hist])
            yield pd.DataFrame(out)

    return df.mapInPandas(decode, schema=BMP_STATS_SCHEMA)

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct
(mime, width/height or sample_rate/duration, codec).  The Spark-side
plumbing — schema, Arrow batch shape, ``mapInPandas`` signatures,
partition-size control — is real and tested; the *decode* kernels are
stubbed because this container has no image/audio libraries: set
``deterministic_fake=True`` for a seeded fake feature extractor (used in
tests), otherwise the decode step raises ``NotImplementedError`` with the
library it would use.

At 100 TB the things that matter are here: payloads never pass through the
driver, batches are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``,
and feature extraction is a narrow ``mapInPandas`` pass (no shuffle).
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-bytes."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.pmod("id", 2) == 0, F.lit("image/png"))
        .otherwise(F.lit("audio/wav"))
        .alias("mime"),
        F.sha2(F.concat(F.lit(seed), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        (F.pmod("id", 4) * 64 + 64).cast("int").alias("width"),
        (F.pmod("id", 3) * 64 + 64).cast("int").alias("height"),
    )
    return df


def extract_features(
    media: DataFrame,
    feature_dim: int = 8,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode + featurize each payload in Arrow batches (``mapInPandas``).

    Real deployment would decode with PIL/torchaudio here; this container
    has neither, so the decode kernel is stubbed (NotImplementedError) or
    replaced by a seeded deterministic fake.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media decode requires PIL/torchaudio (unavailable in "
                    "this container); pass deterministic_fake=True"
                )
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload or b"")
                rng = np.random.default_rng(zlib.crc32(b))
                feats.append(rng.standard_normal(feature_dim).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(bytes(p or b"")) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


WAV_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("zcr", DoubleType()),
    ]
)


def synth_wav_payload(media_id: int, seed: int = 7) -> bytes:
    """Deterministic REAL RIFF/WAVE payload: PCM16 mono sine whose
    frequency and length derive from (media_id, seed).  Stdlib only, so
    the generator runs identically on executors and in the pure-Python
    oracle script (scripts/gen_wav_oracle.py)."""
    import io
    import math
    import struct
    import wave

    rate = 8000
    freq = 200 + (media_id * 37 + seed) % 600
    n = 160 + (media_id * 13) % 240
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                struct.pack(
                    "<h", int(12000 * math.sin(2 * math.pi * freq * i / rate))
                )
                for i in range(n)
            )
        )
    return buf.getvalue()


def synth_wav_media(spark, n: int = 32, seed: int = 7) -> DataFrame:
    """Media table whose payloads are REAL decodable WAV bytes (generated
    executor-side in Arrow batches — payloads never touch the driver)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "mime": ["audio/wav"] * len(ids),
                    "payload": [synth_wav_payload(i, seed) for i in ids],
                    "width": pd.array([None] * len(ids), dtype="Int32"),
                    "height": pd.array([None] * len(ids), dtype="Int32"),
                }
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def extract_wav_features(media: DataFrame) -> DataFrame:
    """REAL decode kernel for ``audio/wav`` payloads — stdlib ``wave``
    header parse + numpy PCM16 analysis (RMS, zero-crossing rate) in
    Arrow batches.  This is the one mime path whose decode is not a stub;
    malformed payloads raise (fail-loud, same contract as the stubbed
    kernels)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            out = {k: [] for k in ("media_id", "sample_rate", "n_channels",
                                   "n_frames", "rms", "zcr")}
            for media_id, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                if mime != "audio/wav":
                    raise NotImplementedError(
                        f"decode for {mime!r} requires PIL/torchaudio "
                        "(unavailable in this container)"
                    )
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    rate, chans, nframes = (
                        w.getframerate(), w.getnchannels(), w.getnframes()
                    )
                    samples = np.frombuffer(w.readframes(nframes), dtype="<i2")
                x = samples.astype(np.float64)
                rms = float(np.sqrt((x * x).mean()) / 32768.0) if len(x) else 0.0
                zcr = (
                    float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean())
                    if len(x) > 1
                    else 0.0
                )
                out["media_id"].append(media_id)
                out["sample_rate"].append(rate)
                out["n_channels"].append(chans)
                out["n_frames"].append(nframes)
                out["rms"].append(rms)
                out["zcr"].append(zcr)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, WAV_FEATURE_SCHEMA)


PNG_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bit_depth", IntegerType()),
        StructField("color_type", IntegerType()),
        StructField("mean_px", DoubleType()),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def synth_png_pixel(media_id: int, x: int, y: int, c: int, seed: int = 9) -> int:
    """The deterministic pixel formula — the ONLY ground truth shared with
    the oracle (scripts/gen_png_oracle.py re-derives features from this
    formula alone, never parsing PNG bytes; the decode kernel must
    round-trip the actual encoder output back to these values)."""
    return (x * 7 + y * 13 + c * 29 + media_id * 31 + seed * 17) % 256


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct

    return (
        len(data).to_bytes(4, "big")
        + tag
        + data
        + (zlib.crc32(tag + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def synth_png_payload(media_id: int, seed: int = 9) -> bytes:
    """Deterministic REAL PNG payload (stdlib zlib/struct only): 8-bit
    grayscale (even ids) or RGB (odd ids), non-interlaced, with the filter
    type cycling 0..4 per scanline so a decoder must implement all five
    PNG filters (None/Sub/Up/Average/Paeth) to recover the pixels; every
    third image splits IDAT across two chunks."""
    import struct

    color_type = 2 if media_id % 2 else 0
    channels = 3 if color_type == 2 else 1
    width = 8 + (media_id * 5) % 24
    height = 8 + (media_id * 3) % 16
    bpp = channels  # bytes per pixel at bit depth 8

    raw = bytearray()
    prev = bytes(width * channels)
    for y in range(height):
        row = bytes(
            synth_png_pixel(media_id, x, y, c, seed)
            for x in range(width)
            for c in range(channels)
        )
        ft = y % 5
        raw.append(ft)
        for i, v in enumerate(row):
            left = row[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                raw.append(v)
            elif ft == 1:
                raw.append((v - left) % 256)
            elif ft == 2:
                raw.append((v - up) % 256)
            elif ft == 3:
                raw.append((v - (left + up) // 2) % 256)
            else:
                raw.append((v - _paeth(left, up, ul)) % 256)
        prev = row

    idat = zlib.compress(bytes(raw))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if media_id % 3 == 0 and len(idat) > 1:
        mid = len(idat) // 2
        out += _png_chunk(b"IDAT", idat[:mid]) + _png_chunk(b"IDAT", idat[mid:])
    else:
        out += _png_chunk(b"IDAT", idat)
    return out + _png_chunk(b"IEND", b"")


def decode_png(data: bytes) -> tuple[int, int, int, int, bytes]:
    """Minimal-but-real PNG decoder (stdlib only): signature + CRC-checked
    chunk walk, IHDR parse, multi-IDAT concat, zlib inflate, and scanline
    unfiltering for all five PNG filter types.  Supported subset: 8-bit
    depth, grayscale (0) and truecolor (2), non-interlaced — anything else
    is a named refusal (this container has no PIL to fall back to).
    Returns (width, height, bit_depth, color_type, pixel_bytes)."""
    import struct

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or color_type not in (0, 2) or interlace != 0:
        raise NotImplementedError(
            f"PNG subset: 8-bit gray/RGB non-interlaced only (got depth="
            f"{bit_depth}, color_type={color_type}, interlace={interlace}); "
            "full decode requires PIL (unavailable in this container)"
        )
    channels = 3 if color_type == 2 else 1
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 1:
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) % 256
        elif ft == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) % 256
        elif ft == 3:
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (left + prev[i]) // 2) % 256
        elif ft == 4:
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) % 256
        elif ft != 0:
            raise ValueError(f"PNG filter type {ft} invalid")
        out += line
        prev = bytes(line)
    return width, height, bit_depth, color_type, bytes(out)


def synth_png_media(spark, n: int = 24, seed: int = 9) -> DataFrame:
    """Media table whose payloads are REAL decodable PNG bytes (generated
    executor-side in Arrow batches — payloads never touch the driver)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "mime": ["image/png"] * len(ids),
                    "payload": [synth_png_payload(i, seed) for i in ids],
                    "width": pd.array([None] * len(ids), dtype="Int32"),
                    "height": pd.array([None] * len(ids), dtype="Int32"),
                }
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def extract_png_features(media: DataFrame) -> DataFrame:
    """REAL decode kernel for ``image/png`` payloads — the second
    non-stub media kernel after WAV: full chunk/inflate/unfilter decode in
    Arrow batches, features = header fields + mean pixel value over all
    channels.  Malformed payloads raise (fail-loud, same contract as the
    stubbed kernels)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height",
                                   "bit_depth", "color_type", "mean_px")}
            for media_id, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                if mime != "image/png":
                    raise NotImplementedError(
                        f"decode for {mime!r} requires PIL/torchaudio "
                        "(unavailable in this container)"
                    )
                w, h, depth, ctype, px = decode_png(bytes(payload))
                arr = np.frombuffer(px, dtype=np.uint8)
                out["media_id"].append(media_id)
                out["width"].append(w)
                out["height"].append(h)
                out["bit_depth"].append(depth)
                out["color_type"].append(ctype)
                out["mean_px"].append(float(arr.mean()) if arr.size else 0.0)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, PNG_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: which frames a decoder would extract.

    Pure native arithmetic (no decode): one row per sampled frame index,
    bounded by a nominal frames-per-payload heuristic.
    """
    n_frames = F.greatest(
        (F.length("payload") / 16).cast("int"), F.lit(1)
    )
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return media.select(
        "media_id", F.explode(idx).alias("frame_idx")
    )


# ------------------------------------------------------------------ BMP

BMP_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bpp", IntegerType()),
        StructField("n_px", LongType()),
        StructField("sum_b", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_r", LongType()),
    ]
)


def synth_bmp_pixel(media_id: int, x: int, y: int, c: int, seed: int = 11) -> int:
    """The deterministic BMP pixel formula (c: 0=B, 1=G, 2=R) — the only
    ground truth shared with the oracle (scripts/gen_bmp_oracle.py
    re-derives the channel sums from this formula alone, never parsing
    BMP bytes)."""
    return (x * 11 + y * 17 + c * 23 + media_id * 37 + seed * 19) % 256


def synth_bmp_payload(media_id: int, seed: int = 11) -> bytes:
    """A REAL 24-bpp Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
    bottom-up rows, BGR pixel order, rows zero-padded to 4 bytes — the
    uncompressed on-disk layout every BMP reader must honor).  Width and
    height vary with media_id so the row-padding remainder (3·w mod 4)
    takes every value across the fixture — the part naive decoders get
    wrong."""
    import struct

    w = 5 + media_id % 6
    h = 3 + (media_id * 3) % 5
    row_len = (3 * w + 3) // 4 * 4
    pixel_bytes = bytearray()
    for row in range(h - 1, -1, -1):  # bottom-up
        for x in range(w):
            for c in range(3):  # B, G, R
                pixel_bytes.append(synth_bmp_pixel(media_id, x, row, c, seed))
        pixel_bytes.extend(b"\x00" * (row_len - 3 * w))
    data_size = len(pixel_bytes)
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return file_header + info_header + bytes(pixel_bytes)


def decode_bmp(data: bytes) -> tuple[int, int, int, list[int], list[int], list[int]]:
    """Strict 24-bpp BMP decode: magic/offset/header-size/planes/bpp/
    compression all validated (fail-loud — same contract as decode_png),
    bottom-up row order undone, padding skipped.  Returns ``(width,
    height, bpp, b_channel, g_channel, r_channel)`` with channels in
    top-down raster order."""
    import struct

    if len(data) < 54:
        raise ValueError("BMP: truncated header")
    magic, _fsize, _r1, _r2, offset = struct.unpack_from("<2sIHHI", data, 0)
    if magic != b"BM":
        raise ValueError("BMP: bad magic")
    (hsize, w, h, planes, bpp, comp, _isize, _xp, _yp, _cu, _ci) = (
        struct.unpack_from("<IiiHHIIiiII", data, 14)
    )
    if hsize != 40:
        raise ValueError(f"BMP: unsupported DIB header size {hsize}")
    if planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(
            f"BMP: only uncompressed 24-bpp supported (planes={planes}, "
            f"bpp={bpp}, compression={comp})"
        )
    if h <= 0 or w <= 0:
        raise ValueError("BMP: top-down or empty images not supported")
    row_len = (3 * w + 3) // 4 * 4
    if len(data) < offset + row_len * h:
        raise ValueError("BMP: truncated pixel data")
    bs: list[int] = []
    gs: list[int] = []
    rs: list[int] = []
    for row in range(h):  # top-down output: read rows from the END
        base = offset + (h - 1 - row) * row_len
        for x in range(w):
            p = base + 3 * x
            bs.append(data[p])
            gs.append(data[p + 1])
            rs.append(data[p + 2])
    return w, h, bpp, bs, gs, rs


def synth_bmp_media(spark, n: int = 24, seed: int = 11) -> DataFrame:
    """Media table whose payloads are REAL decodable BMP bytes (generated
    executor-side in Arrow batches — payloads never touch the driver)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "mime": ["image/bmp"] * len(ids),
                    "payload": [synth_bmp_payload(i, seed) for i in ids],
                    "width": pd.array([None] * len(ids), dtype="Int32"),
                    "height": pd.array([None] * len(ids), dtype="Int32"),
                }
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def extract_bmp_features(media: DataFrame) -> DataFrame:
    """REAL decode kernel for ``image/bmp`` payloads — the third non-stub
    media kernel (WAV, PNG, BMP): strict header parse + bottom-up/padded
    row walk in Arrow batches, features = header fields + EXACT integer
    per-channel sums (no float anywhere, so the driver gate hashes these
    bit-for-bit).  Malformed payloads raise (fail-loud)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "bpp",
                                   "n_px", "sum_b", "sum_g", "sum_r")}
            for media_id, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                if mime != "image/bmp":
                    raise NotImplementedError(
                        f"decode for {mime!r} requires PIL "
                        "(unavailable in this container)"
                    )
                w, h, bpp, bs, gs, rs = decode_bmp(bytes(payload))
                out["media_id"].append(media_id)
                out["width"].append(w)
                out["height"].append(h)
                out["bpp"].append(bpp)
                out["n_px"].append(w * h)
                out["sum_b"].append(sum(bs))
                out["sum_g"].append(sum(gs))
                out["sum_r"].append(sum(rs))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, BMP_FEATURE_SCHEMA)

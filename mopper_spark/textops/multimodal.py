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

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

"""Multimodal columns: images/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch shapes, partition-preserving
transforms, deterministic fake featurizers — is real and tested; the
actual codec calls are stubbed behind ``DECODERS`` because this container
has no image/audio libraries.  Swapping in PIL/torchaudio/decord is a
one-function change per modality (the ``NotImplementedError`` marks the
spot).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 32


def real_decode(modality: str, payload: bytes):
    """The codec seam.  Container has no media libs — replace this with
    PIL.Image.open / torchaudio.load / decord.VideoReader in production."""
    raise NotImplementedError(
        f"no {modality} codec in this environment; install one and swap real_decode"
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in featurizer: seed a PRNG from the payload
    digest → stable unit vector.  Exercises the full Spark path (binary →
    Arrow → numpy → array<float>) without a codec."""
    digest = hashlib.sha256(payload or b"").digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    v = rng.randn(dim).astype(np.float32)
    return v / (np.linalg.norm(v) or 1.0)


def extract_features(df: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """binary payload → ``feature`` (array<float>) via mapInPandas.
    Partition-preserving, Arrow-batched; one decode call per row inside
    the batch loop (codecs are not vectorizable)."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != "payload"]
        + [T.StructField("feature", T.ArrayType(T.FloatType()), True)]
    )
    cols = [f.name for f in out_schema.fields if f.name != "feature"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for modality, payload in zip(pdf["modality"], pdf["payload"]):
                if use_real_codec:
                    decoded = real_decode(modality, payload)  # pragma: no cover
                    feats.append(_fake_features(bytes(decoded)))
                else:
                    feats.append(
                        _fake_features(bytes(payload) if payload is not None else b"")
                    )
            res = pdf[cols].copy()
            res["feature"] = [f.tolist() for f in feats]
            yield res

    return df.mapInPandas(run, out_schema)


def resize_meta(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize planning as metadata arithmetic (the actual pixel resize
    happens inside the codec seam): clamp the longer side to ``max_side``
    preserving aspect ratio."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h).cast("double")
    )
    return df.withColumn(
        "resize_to",
        F.struct(
            F.round(w * scale).cast("int").alias("width"),
            F.round(h * scale).cast("int").alias("height"),
        ),
    )


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: the frame indices a decoder
    should extract (array<int> from metadata — pure Catalyst)."""
    n = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    return df.withColumn(
        "frame_plan",
        F.when(
            F.col("modality") == "video",
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n)),
        ).otherwise(F.array().cast("array<int>")),
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload = seeded bytes."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8
        meta = {
            "width": 640 if modality == "image" else None,
            "height": 480 if modality == "image" else None,
            "sample_rate": 16000 if modality == "audio" else None,
            "n_frames": 300 if modality == "video" else None,
            "mime": f"{modality}/fake",
        }
        rows.append((i, modality, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

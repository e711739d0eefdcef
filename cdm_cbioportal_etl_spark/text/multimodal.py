"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, Arrow batch shape, ``mapInPandas`` signature,
partition sizing) is real and tested.  The actual decode kernels need
codec libraries that are not in this container, so they are STUBBED:
``decode_stub=True`` produces deterministic fake features (so pipelines
are testable end-to-end), ``decode_stub=False`` raises
``NotImplementedError`` at the exact point a real decoder would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
            T.StructField("codec", T.StringType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded hash bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.unbase64(F.base64(F.sha2(F.concat(F.lit(seed), F.col("id")), 512).cast("binary"))).alias(
            "payload"
        ),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(1000).alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, feature_dim: int = 8, decode_stub: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    The UDF receives an iterator of pandas batches — the shape a real
    image/audio decoder needs (vectorized I/O, bounded memory per batch).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real decode requires codec libs (PIL/ffmpeg) not present "
                    "in this container; plug the decoder in here"
                )
            # deterministic fake 'feature': bytes folded into feature_dim floats
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
                pad = (-len(arr)) % feature_dim
                if pad:
                    arr = np.concatenate([arr, np.zeros(pad, np.float32)])
                feats.append((arr.reshape(-1, feature_dim).mean(axis=0) / 255.0).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


PAYLOAD_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("byte_sum", T.LongType()),
    ]
)


def payload_stats(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-payload byte statistics via ``mapInPandas`` — the oracle-
    checkable half of the multimodal path: every byte of the binary
    column is touched in the Arrow batch (numpy sum + sha256), producing
    values an engine-independent oracle can recompute exactly (integer
    byte sum, hex digest, byte length).  This is the proof that the
    binary-column plumbing (Arrow transfer of ``binary``, batch
    iteration, vectorized per-payload work) is real; the codec-decode
    kernel in ``extract_features`` stays stubbed only because the codec
    libraries are absent."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "payload_sha": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "byte_sum": payloads.map(
                        lambda b: int(np.frombuffer(bytes(b), dtype=np.uint8).sum())
                        if len(b)
                        else 0
                    ).astype("int64"),
                }
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(_stats, PAYLOAD_STATS_SCHEMA)

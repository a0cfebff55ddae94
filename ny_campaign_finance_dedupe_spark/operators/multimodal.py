"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern: media (image/audio/video) rides as a ``binary`` column with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` passes so each executor processes whole
record batches and the binary bytes never round-trip through Python row
objects.

The decode kernels themselves are STUBS in this environment (no
PIL/ffmpeg in the container): ``deterministic_fake_features`` derives a
fixed-dim pseudo-embedding from the payload bytes (xxhash-seeded, stable
across executors) so the Spark-side plumbing — schema, batch shape,
partitioning, null handling — is real and tested; swap ``_decode_real``
in when codecs exist.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16


def _decode_real(payload: bytes, mime: str) -> np.ndarray:
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg, not available in this container; "
        "wire the real decoder here and flip use_fake=False"
    )


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic pseudo-features from payload bytes (sha256-seeded).

    features[0] = byte length, features[1] = count of 0x20 bytes — plain
    payload statistics any engine can recompute (the driver oracle checks
    them); the remaining dims are hash-seeded noise standing in for the
    real decoder's embedding."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "big")
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal(FEATURE_DIM).astype(np.float32)
    feats[0] = np.float32(len(payload))
    feats[1] = np.float32(payload.count(b" "))
    return feats


def extract_media_features(
    media: DataFrame,
    payload_col: str = "payload",
    mime_col: str = "mime",
    use_fake: bool = True,
) -> DataFrame:
    """Append ``features array<float>`` via mapInPandas (Arrow batches).

    Null payloads yield null features (missing-data contract,
    datamodel.py:96-115). Output preserves all input columns — the pass
    is a narrow map, no shuffle.
    """
    out_schema = T.StructType(
        media.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mime in zip(pdf[payload_col], pdf[mime_col]):
                if payload is None:
                    feats.append(None)
                elif use_fake:
                    feats.append(_fake_features(bytes(payload)).tolist())
                else:
                    feats.append(_decode_real(bytes(payload), mime).tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return media.mapInPandas(run, schema=out_schema)


def frame_sample_plan(
    media: DataFrame, every_n: int = 30, payload_col: str = "payload"
) -> DataFrame:
    """Frame-sampling plumbing: emits (media_id, frame_idx, frame_payload)
    rows — one row per sampled frame. The splitter is a stub that chunks
    the payload deterministically; a real ffmpeg-backed splitter has the
    identical mapInPandas signature and output schema."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                # stub: treat each `every_n`-byte chunk as one "frame"
                for i, off in enumerate(range(0, len(b), every_n)):
                    rows.append((mid, i, b[off : off + every_n]))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_payload"]
            )

    return media.mapInPandas(run, schema=out_schema)

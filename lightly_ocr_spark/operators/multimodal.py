"""Multimodal columns: image/audio/video as opaque `binary` + typed metadata.

The graft treats media exactly like the reference treats image buffers
(`ocr/tools/generator.py:62-63`: bytes in a KV store, validity-checked by a
decode probe, `generator.py:10-18`): an opaque binary column plus declared
metadata, processed by Arrow-batched functions.

The real decoders (PIL/libav) are NOT in this container, so the decode step
is stubbed: `decode_image` raises NotImplementedError unless PIL is
importable, and `fake_image_features` is the deterministic stand-in used by
tests — the Spark-side plumbing (schema, mapInPandas batch shape,
partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
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

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
        T.StructField("decoder", T.StringType(), False),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode path — unavailable in this container by design."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL; this environment ships without "
            "media libraries — use fake_image_features (deterministic stub)"
        )
    raise NotImplementedError("real decoder wiring lands with the media libs")


def fake_image_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in features: sha256-seeded, unit-normalized.

    Stable across runs/machines, so downstream operators (ANN, dedup) can be
    tested end-to-end without decoders."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype="<u4")
    v = (raw.astype(np.float64) / 2**32) - 0.5
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def _featurize_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        feats = [fake_image_features(p).tolist() for p in payloads]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].to_numpy(),
                "kind": pdf["kind"].to_numpy(),
                "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int64"),
                "payload_sha256": payloads.map(
                    lambda p: hashlib.sha256(p or b"").hexdigest()
                ),
                "features": pd.Series(feats, dtype="object"),
                "decoder": "stub-sha256" if not HAVE_PIL else "pil",
            }
        )


def featurize_media(media: DataFrame) -> DataFrame:
    """media table -> per-item features (Arrow-batched, schema-stable).

    At scale: salt by xxhash64(media_id) before this stage if payload sizes
    are heavy-tailed (video >> thumbnails) — same skew treatment as pages."""
    return media.select("media_id", "kind", "payload").mapInPandas(
        _featurize_partition, schema=FEATURES_SCHEMA
    )


def synthetic_media(spark, n: int = 256) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes)."""
    import random

    rows = []
    for i in range(n):
        rng = random.Random(1000 + i)
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(128 + (i % 5) * 64))
        meta = {
            "width": 64 + i % 32 if kind == "image" else None,
            "height": 48 + i % 24 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 30 * (1 + i % 4) if kind == "video" else None,
            "mime": {"image": "image/fake", "audio": "audio/fake",
                     "video": "video/fake"}[kind],
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

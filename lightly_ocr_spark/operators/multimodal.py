"""Multimodal columns: image/audio/video as opaque `binary` + typed metadata.

The graft treats media exactly like the reference treats image buffers
(`ocr/tools/generator.py:62-63`: bytes in a KV store, validity-checked by a
decode probe, `generator.py:10-18`): an opaque binary column plus declared
metadata, processed by Arrow-batched functions.

Decode depth is split in two:

* **Header probe — REAL.**  `probe_image` parses PNG / JPEG / GIF headers
  (pure Python, no media libs): magic, dimensions, and for PNG the IHDR
  CRC.  `probe_media` / `valid_media` run it as an Arrow-batched stage and
  are the graft of the reference's decode-probe validity filter
  (`ocr/tools/generator.py:10-18`: decode the bytes, drop the row if the
  decode fails or the size is degenerate).
* **Pixel decode — stubbed.**  Full rasterization needs PIL/libav, which
  this container ships without; `decode_image` raises NotImplementedError
  unless PIL is importable, and `fake_image_features` is the deterministic
  stand-in for feature extraction.  The Spark-side plumbing (schema,
  mapInPandas batch shape, partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def probe_image(payload: bytes | None) -> dict:
    """Parse an image header without media libraries.

    Returns {mime, width, height, valid}.  valid=True only when the magic
    matches a known format, the dimensions parse and are positive, and (for
    PNG) the IHDR chunk's CRC verifies — a truncated or bit-flipped payload
    fails, which is exactly the reference's decode-probe semantics
    (`ocr/tools/generator.py:10-18`) without rasterizing pixels."""
    bad = {"mime": None, "width": None, "height": None, "valid": False}
    if not payload:
        return bad
    if payload.startswith(PNG_SIG):
        # IHDR must be first: len(4) type(4)="IHDR" data(13) crc(4)
        if len(payload) < 33 or payload[12:16] != b"IHDR":
            return bad
        (ihdr_len,) = struct.unpack(">I", payload[8:12])
        if ihdr_len != 13:
            return bad
        if zlib.crc32(payload[12:29]) != struct.unpack(">I", payload[29:33])[0]:
            return bad
        w, h = struct.unpack(">II", payload[16:24])
        ok = 0 < w < 2**31 and 0 < h < 2**31
        return {"mime": "image/png", "width": w if ok else None,
                "height": h if ok else None, "valid": ok}
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            return bad
        w, h = struct.unpack("<HH", payload[6:10])
        ok = w > 0 and h > 0
        return {"mime": "image/gif", "width": w if ok else None,
                "height": h if ok else None, "valid": ok}
    if payload[:2] == b"\xff\xd8":
        # walk JPEG segments to the first SOF marker (C0-CF minus C4/C8/CC)
        i = 2
        n = len(payload)
        while i + 3 < n:
            if payload[i] != 0xFF:
                return {"mime": "image/jpeg", "width": None,
                        "height": None, "valid": False}
            marker = payload[i + 1]
            if marker == 0xFF:      # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2              # standalone markers, no length
                continue
            if i + 4 > n:
                break
            (seg_len,) = struct.unpack(">H", payload[i + 2:i + 4])
            if seg_len < 2:
                break
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    break
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                ok = w > 0 and h > 0
                return {"mime": "image/jpeg", "width": w if ok else None,
                        "height": h if ok else None, "valid": ok}
            i += 2 + seg_len
        return {"mime": "image/jpeg", "width": None, "height": None,
                "valid": False}
    return bad


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("mime_detected", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def _probe_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        probes = [probe_image(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].to_numpy(),
                "kind": pdf["kind"].to_numpy(),
                "mime_detected": [p["mime"] for p in probes],
                "width": pd.array([p["width"] for p in probes],
                                  dtype="Int32"),
                "height": pd.array([p["height"] for p in probes],
                                   dtype="Int32"),
                "valid": [p["valid"] for p in probes],
            }
        )


def probe_media(media: DataFrame) -> DataFrame:
    """media table -> header-probe results (one Arrow crossing)."""
    return media.select("media_id", "kind", "payload").mapInPandas(
        _probe_partition, schema=PROBE_SCHEMA
    )


def valid_media(media: DataFrame) -> DataFrame:
    """F7-analog validity filter for IMAGE rows: keep images whose payload
    header parses AND whose parsed dimensions agree with the declared
    metadata (a lying `meta.width` is as disqualifying as a truncated
    payload).  Non-image kinds (audio/video) pass through untouched —
    the probe only understands image formats, so failing them would
    silently drop every valid audio/video row."""
    images = media.filter(F.col("kind") == "image")
    others = media.filter(F.col("kind") != "image")
    probes = probe_media(images).filter(F.col("valid"))
    kept_images = (
        images.join(probes.select("media_id", "width", "height"), "media_id")
        .filter(
            (F.col("meta.width").isNull() | (F.col("meta.width") == F.col("width")))
            & (F.col("meta.height").isNull()
               | (F.col("meta.height") == F.col("height")))
        )
        .select(images["*"])
    )
    return kept_images.unionByName(others)


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
        out = {
            "media_id": pdf["media_id"].to_numpy(),
            "kind": pdf["kind"].to_numpy(),
            "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int64"),
            "payload_sha256": payloads.map(
                lambda p: hashlib.sha256(p or b"").hexdigest()
            ),
            "features": pd.Series(feats, dtype="object"),
            # honest provenance: the features ARE the sha256 stub even
            # when PIL happens to be importable (decode_image has no
            # real path yet) — labeling them "pil" would let auditors
            # trust hash noise as pixel-derived embeddings
            "decoder": "stub-sha256",
        }
        if "url" in pdf.columns:
            out["url"] = pdf["url"].to_numpy()
        yield pd.DataFrame(out)


def featurize_media(media: DataFrame) -> DataFrame:
    """media table -> per-item features (Arrow-batched, schema-stable).
    A `url` column, when present, is carried through the stage so callers
    can aggregate per page WITHOUT re-joining (a join back on media_id
    would re-execute the upstream probe/validity subtree).

    At scale: salt by xxhash64(media_id) before this stage if payload sizes
    are heavy-tailed (video >> thumbnails) — same skew treatment as pages."""
    cols = ["media_id", "kind", "payload"]
    schema = FEATURES_SCHEMA
    if "url" in media.columns:
        cols.append("url")
        schema = T.StructType(
            FEATURES_SCHEMA.fields
            + [T.StructField("url", T.StringType(), True)]
        )
    return media.select(*cols).mapInPandas(_featurize_partition, schema=schema)


def make_png(width: int, height: int, tail: bytes = b"") -> bytes:
    """Minimal PNG header (signature + CRC-valid IHDR) + opaque tail."""
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (PNG_SIG + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)) + tail)


def make_gif(width: int, height: int, tail: bytes = b"") -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + tail


def make_jpeg(width: int, height: int, tail: bytes = b"") -> bytes:
    """SOI + APP0 stub + SOF0 carrying the dimensions."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", height, width) + b"\x03"
            + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01")
    return b"\xff\xd8" + app0 + sof0 + tail


def synthetic_media(spark, n: int = 256) -> DataFrame:
    """Deterministic fake media table.  Image payloads carry REAL headers
    (PNG/GIF/JPEG round-robin, dims matching the declared meta) so the
    header probe exercises the same parse a production corpus would;
    audio/video payloads stay opaque seeded bytes."""
    import random

    rows = []
    for i in range(n):
        rng = random.Random(1000 + i)
        kind = ("image", "audio", "video")[i % 3]
        tail = bytes(rng.getrandbits(8) for _ in range(128 + (i % 5) * 64))
        if kind == "image":
            w, h = 64 + i % 32, 48 + i % 24
            maker = (make_png, make_gif, make_jpeg)[(i // 3) % 3]
            payload = maker(w, h, tail)
            mime = {make_png: "image/png", make_gif: "image/gif",
                    make_jpeg: "image/jpeg"}[maker]
        else:
            w = h = None
            payload = tail
            mime = {"audio": "audio/fake", "video": "video/fake"}[kind]
        meta = {
            "width": w,
            "height": h,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 30 * (1 + i % 4) if kind == "video" else None,
            "mime": mime,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

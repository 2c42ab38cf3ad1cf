"""Multimodal columns: image/audio/video as opaque ``BinaryType`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` kernels
(driver mandate, SURVEY.md §2.9).

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested. The codec step itself is STUBBED: this
container has no image/audio libraries, so ``decode_image`` tries PIL and
otherwise falls back to a clearly-marked deterministic fake decoder
(seeded from the payload digest) that produces correctly-shaped arrays.
Swap ``_decode_image_bytes`` for a real codec on a cluster with PIL/ffmpeg
and nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("format", StringType()),
                ]
            ),
        ),
    ]
)


def make_media_table(spark, rows) -> DataFrame:
    """rows: iterable of (media_id, kind, payload_bytes, meta_dict)."""
    data = [
        (
            int(i),
            kind,
            bytearray(payload),
            (
                meta.get("width"),
                meta.get("height"),
                meta.get("sample_rate"),
                meta.get("n_frames"),
                meta.get("format"),
            ),
        )
        for (i, kind, payload, meta) in rows
    ]
    return spark.createDataFrame(data, schema=MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministically derive a media table from the ``documents`` table so
    the multimodal kernels are runnable (and driver-checkable) on the shared
    testdata: payload = UTF-8 text bytes, kind cycles image/audio/video by
    ``doc_id % 3``, and metadata is a pure function of ``doc_id``. This is a
    fixture generator — on a real lake the media table is read directly."""
    from fdi_flow_spark.core.partitioning import ensure_min_parallelism

    docs = ensure_min_parallelism(docs, "doc_id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        (F.col("doc_id") % 7 + 4).cast("int").alias("width"),
        (F.col("doc_id") % 5 + 4).cast("int").alias("height"),
        F.lit(8000).alias("sample_rate"),
        (F.col("doc_id") % 50 + 1).cast("int").alias("n_frames"),
        kind.alias("format"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def _payload_rng(payload: bytes) -> np.random.Generator:
    digest = hashlib.sha256(payload or b"").digest()
    return np.random.default_rng(int.from_bytes(digest[:8], "big"))


def _decode_image_bytes(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: PIL if available, else a deterministic fake (seeded from
    the payload digest) with the correct (h, w, 3) uint8 shape."""
    try:
        import io

        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    except ImportError:
        rng = _payload_rng(payload)
        return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mean_rgb", ArrayType(DoubleType())),
        StructField("std_rgb", ArrayType(DoubleType())),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def image_features(media: DataFrame) -> DataFrame:
    """Decode each image payload (stubbed codec) and emit per-channel mean /
    std features. One Arrow batch in, one out — no per-row Python calls from
    the JVM, and the binary column never leaves the executor."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "mean_rgb": [], "std_rgb": [], "width": [], "height": []}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                w = int(meta["width"] or 16)
                h = int(meta["height"] or 16)
                arr = _decode_image_bytes(bytes(payload or b""), w, h)
                out["media_id"].append(mid)
                out["mean_rgb"].append(arr.reshape(-1, 3).mean(axis=0).astype(float).tolist())
                out["std_rgb"].append(arr.reshape(-1, 3).std(axis=0).astype(float).tolist())
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "image").mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("pixels", ArrayType(DoubleType())),  # flattened target_h*target_w*3
    ]
)


def image_resize(media: DataFrame, target_w: int = 8, target_h: int = 8) -> DataFrame:
    """Nearest-neighbor resize of decoded images to (target_h, target_w),
    emitted as a flattened double array (model-input plumbing). The resize
    math is real NumPy; only the byte->pixel decode is stubbed."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pix = [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                w = int(meta["width"] or 16)
                h = int(meta["height"] or 16)
                arr = _decode_image_bytes(bytes(payload or b""), w, h)
                ys = (np.arange(target_h) * arr.shape[0] // target_h).clip(0, arr.shape[0] - 1)
                xs = (np.arange(target_w) * arr.shape[1] // target_w).clip(0, arr.shape[1] - 1)
                small = arr[np.ix_(ys, xs)].astype(float) / 255.0
                ids.append(mid)
                pix.append(small.ravel().tolist())
            yield pd.DataFrame({"media_id": ids, "pixels": pix})

    return media.where(F.col("kind") == "image").mapInPandas(fn, RESIZE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame index, derived
    from metadata with pure SQL (``sequence`` + ``explode``) — the actual
    frame extraction would hang off these rows via a decode kernel."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )


def audio_features(media: DataFrame, n_bands: int = 8) -> DataFrame:
    """Audio feature plumbing: interpret payload bytes as int16 PCM (real
    parsing — synthetic payloads round-trip exactly), then emit per-band
    FFT magnitude means. No external codec needed for raw PCM."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("n_samples", LongType()),
            StructField("band_energy", ArrayType(DoubleType())),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, bands = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                pcm = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2").astype(float)
                ids.append(mid)
                ns.append(len(pcm))
                if len(pcm) == 0:
                    bands.append([0.0] * n_bands)
                    continue
                mag = np.abs(np.fft.rfft(pcm))
                chunks = np.array_split(mag, n_bands)
                bands.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
            yield pd.DataFrame({"media_id": ids, "n_samples": ns, "band_energy": bands})

    return media.where(F.col("kind") == "audio").mapInPandas(fn, schema)

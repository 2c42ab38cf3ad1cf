"""Multimodal columns: image/audio/video as opaque ``BinaryType`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` kernels
(driver mandate, SURVEY.md §2.9).

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested, and so is the codec step: images are decoded
as 24/32-bit uncompressed BMP (pure-NumPy parser in ``codecs.py``; PIL is
tried first for non-BMP formats when installed), audio as RIFF/WAVE
16-bit PCM (raw headerless PCM accepted as a fallback), and video as
uncompressed-DIB AVI (``frame_extract``; ``frame_sample`` stays the
payload-free metadata plan for cheap sampling decisions). Compressed
codecs (JPEG/H.264/MP3) are out of scope — they need entropy-coding
stacks this environment cannot provide — and raise cleanly.
"""

from __future__ import annotations

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


def media_from_documents(
    docs: DataFrame, encode_payloads: bool = True, kinds: tuple | None = None
) -> DataFrame:
    """Deterministically derive a media table from the ``documents`` table so
    the multimodal kernels are runnable (and driver-checkable) on the shared
    testdata: kind cycles image/audio/video by ``doc_id % 3``, metadata is a
    pure function of ``doc_id``, and (with ``encode_payloads=True``) image /
    audio payloads are real BMP / WAV container bytes whose pixels / samples
    derive deterministically from the document text. This is a fixture
    generator — on a real lake the media table is read directly.

    ``encode_payloads=False`` keeps the pure-JVM projection (payload = UTF-8
    text bytes) for metadata-only consumers like ``frame_sample``, avoiding
    an Arrow encode stage whose output would be dropped. ``kinds`` filters
    rows JVM-side BEFORE the encode stage — a consumer that only reads one
    modality (every feature kernel does) must not pay for encoding the
    other two; the kernels' own ``where(kind = ...)`` cannot push through
    the opaque mapInPandas, so the predicate belongs here."""
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
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        meta.alias("meta"),
    )
    if kinds is not None:
        media = media.where(F.col("kind").isin(list(kinds)))
    if not encode_payloads:
        return media

    from fdi_flow_spark.pipelines.codecs import encode_avi, encode_bmp, encode_wav

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for kind_, payload, meta_ in zip(pdf["kind"], pdf["payload"], pdf["meta"]):
                seed = np.frombuffer(bytes(payload or b"\x00"), dtype=np.uint8)
                w, h = int(meta_["width"]), int(meta_["height"])
                if kind_ == "image":
                    pixels = np.resize(seed, h * w * 3).reshape(h, w, 3)
                    payloads.append(encode_bmp(pixels))
                elif kind_ == "audio":
                    n = max(16, min(len(seed), 2048))
                    pcm = (np.resize(seed, n).astype(np.int16) - 128) * 256
                    payloads.append(encode_wav(pcm, int(meta_["sample_rate"] or 8000)))
                else:  # video: real uncompressed-DIB AVI, n_frames from meta
                    nf = int(meta_["n_frames"] or 1)
                    frames = np.resize(seed, nf * h * w * 3).reshape(nf, h, w, 3)
                    payloads.append(encode_avi(frames, fps=10))
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf

    return media.mapInPandas(fn, MEDIA_SCHEMA)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (h, w, 3) uint8 RGB array.

    BMP payloads (``BM`` magic) go through the pure-NumPy parser in
    ``codecs.py``; anything else is handed to PIL when installed. Unknown
    formats raise — no silent fake pixels."""
    from fdi_flow_spark.pipelines.codecs import decode_bmp

    buf = bytes(payload or b"")
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError as e:
        raise ValueError(
            "image payload is not BMP and PIL is not installed; supported "
            "formats without PIL: 24/32-bit uncompressed BMP"
        ) from e
    img = Image.open(io.BytesIO(buf)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


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
    """Decode each image payload (real BMP/PIL codec) and emit per-channel
    mean / std features. One Arrow batch in, one out — no per-row Python
    calls from the JVM, and the binary column never leaves the executor.
    Width/height come from the decoded container, not the metadata hints."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "mean_rgb": [], "std_rgb": [], "width": [], "height": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(payload)
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
    emitted as a flattened double array (model-input plumbing). Both the
    byte->pixel decode (BMP/PIL) and the resize math are real NumPy."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pix = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(payload)
                ys = (np.arange(target_h) * arr.shape[0] // target_h).clip(0, arr.shape[0] - 1)
                xs = (np.arange(target_w) * arr.shape[1] // target_w).clip(0, arr.shape[1] - 1)
                small = arr[np.ix_(ys, xs)].astype(float) / 255.0
                ids.append(mid)
                pix.append(small.ravel().tolist())
            yield pd.DataFrame({"media_id": ids, "pixels": pix})

    return media.where(F.col("kind") == "image").mapInPandas(fn, RESIZE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame index, derived
    from metadata with pure SQL (``sequence`` + ``explode``) — cheap
    planning without touching payload bytes; :func:`frame_extract` is the
    decode kernel that hangs off the same sampling rule."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )


FRAME_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("mean_rgb", ArrayType(DoubleType())),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def frame_extract(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Honest video frame extraction: decode each AVI payload (pure-NumPy
    uncompressed-DIB parser in ``codecs.py``), take every ``every_n``-th
    frame, and emit per-frame mean-RGB features. Same Arrow-batched
    ``mapInPandas`` shape as the image kernels; the frame-index rule matches
    :func:`frame_sample`, so the plan path and the decode path agree."""
    from fdi_flow_spark.pipelines.codecs import decode_avi

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "mean_rgb": [], "width": [], "height": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, _fps = decode_avi(bytes(payload or b""))
                for idx in range(0, frames.shape[0], every_n):
                    frame = frames[idx].reshape(-1, 3).astype(float)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["mean_rgb"].append(frame.mean(axis=0).tolist())
                    out["width"].append(frames.shape[2])
                    out["height"].append(frames.shape[1])
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "video").mapInPandas(fn, FRAME_FEATURES_SCHEMA)


def decode_audio(payload: bytes) -> np.ndarray:
    """Decode an audio payload to a mono float sample array.

    RIFF/WAVE payloads go through the pure-NumPy WAV parser in ``codecs.py``
    (multichannel is averaged down to mono); headerless byte streams are
    interpreted as raw little-endian int16 PCM."""
    from fdi_flow_spark.pipelines.codecs import decode_wav

    raw = bytes(payload or b"")
    if raw[:4] == b"RIFF":
        pcm, _rate = decode_wav(raw)
        return pcm.astype(float).mean(axis=1)
    return np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2").astype(float)


def audio_features(media: DataFrame, n_bands: int = 8) -> DataFrame:
    """Decode each audio payload (WAV container or raw int16 PCM) and emit
    per-band FFT magnitude means — a real spectral feature over real
    samples, Arrow-batched like the image kernels."""
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
                pcm = decode_audio(payload)
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

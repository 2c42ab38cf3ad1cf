import numpy as np
import pytest

from fdi_flow_spark.pipelines.codecs import (
    decode_avi,
    decode_bmp,
    decode_wav,
    encode_avi,
    encode_bmp,
    encode_wav,
)
from fdi_flow_spark.pipelines.multimodal import (
    audio_features,
    decode_audio,
    decode_image,
    frame_extract,
    frame_sample,
    image_features,
    image_resize,
    make_media_table,
)

# --------------------------------------------------------------- codecs


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(7)
    # odd width exercises the 4-byte row padding
    for h, w in [(10, 12), (5, 7), (1, 1), (3, 2)]:
        pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(pixels)), pixels)


def test_bmp_decode_top_down_and_32bit():
    # hand-build a 1x2 top-down 32-bit BMP: negative height, BGRA pixels
    import struct

    px = [(10, 20, 30, 0), (40, 50, 60, 0)]  # B,G,R,A
    data = b"".join(struct.pack("<4B", *p) for p in px)
    info = struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 32, 0, len(data), 0, 0, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    arr = decode_bmp(head + info + data)
    assert arr.shape == (1, 2, 3)
    assert arr[0, 0].tolist() == [30, 20, 10]  # RGB
    assert arr[0, 1].tolist() == [60, 50, 40]


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        decode_bmp(b"not a bitmap at all")
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n")  # non-BMP without PIL installed


def test_wav_roundtrip_exact():
    pcm = (np.sin(np.linspace(0, 20, 333)) * 12000).astype("<i2")
    out, rate = decode_wav(encode_wav(pcm, 16000))
    assert rate == 16000
    assert out.shape == (333, 1)
    assert np.array_equal(out[:, 0], pcm)


def test_wav_stereo_and_chunk_skipping():
    pcm = np.stack([np.arange(64, dtype="<i2"), -np.arange(64, dtype="<i2")], axis=1)
    buf = encode_wav(pcm, 8000)
    # splice an unknown (odd-sized, word-aligned) chunk between fmt and data
    import struct

    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    spliced = buf[:fmt_end] + junk + buf[fmt_end:]
    out, rate = decode_wav(spliced)
    assert out.shape == (64, 2)
    assert np.array_equal(out, pcm)
    # decode_audio averages stereo down to mono
    mono = decode_audio(buf)
    assert np.allclose(mono, pcm.astype(float).mean(axis=1))


def test_avi_roundtrip_exact():
    rng = np.random.default_rng(11)
    for n, h, w in [(5, 6, 7), (1, 1, 1), (12, 4, 6)]:
        frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        out, fps = decode_avi(encode_avi(frames, fps=24))
        assert fps == 24
        assert np.array_equal(out, frames)


def test_avi_top_down_stream_not_flipped():
    """A negative strf height declares a top-down DIB stream: rows are
    already in display order, so the decoder must not vertically flip."""
    import struct

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, size=(3, 4, 5, 3), dtype=np.uint8)
    buf = bytearray(encode_avi(frames, fps=10))
    strf_body = buf.index(b"strf") + 8
    (h,) = struct.unpack_from("<i", buf, strf_body + 8)
    struct.pack_into("<i", buf, strf_body + 8, -h)
    out, _ = decode_avi(bytes(buf))
    # payload rows are bottom-up on disk; declaring top-down must yield the
    # vertical mirror of the true frames (i.e. no flip was applied)
    assert np.array_equal(out, frames[:, ::-1, :, :])


def test_wav_truncated_data_chunk_raises():
    pcm = (np.arange(100, dtype="<i2") * 31).astype("<i2")
    buf = encode_wav(pcm, 8000)
    with pytest.raises(ValueError, match="truncated WAV data chunk"):
        decode_wav(buf[:-10])


def test_avi_rejects_compressed_and_garbage():
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    # flip the codec fourcc to a compressed one -> clean rejection
    frames = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    buf = bytearray(encode_avi(frames))
    buf[buf.index(b"DIB ") : buf.index(b"DIB ") + 4] = b"H264"
    with pytest.raises(ValueError, match="codec"):
        decode_avi(bytes(buf))


# --------------------------------------------------------------- Spark kernels


@pytest.fixture()
def media(spark):
    rng = np.random.default_rng(4)
    rows = []
    # images: real 24-bit BMP payloads
    for i in range(3):
        pixels = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
        rows.append(
            (i, "image", encode_bmp(pixels), {"width": 12, "height": 10, "format": "bmp"})
        )
    # audio 3: WAV container; audio 4: raw headerless int16 PCM
    pcm = (np.sin(np.linspace(0, 40, 256)) * 1000).astype("<i2")
    rows.append((3, "audio", encode_wav(pcm, 8000), {"sample_rate": 8000, "format": "wav"}))
    rows.append((4, "audio", pcm.tobytes(), {"sample_rate": 8000, "format": "pcm16"}))
    # video: real uncompressed-DIB AVI payload
    vid = rng.integers(0, 256, size=(95, 4, 6, 3), dtype=np.uint8)
    rows.append((5, "video", encode_avi(vid, fps=10), {"n_frames": 95, "format": "avi"}))
    return make_media_table(spark, rows)


def test_image_features_golden(spark, media):
    """Spark features equal NumPy mean/std of the very pixels we encoded."""
    rng = np.random.default_rng(4)
    expected = {
        i: rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8) for i in range(3)
    }
    out = image_features(media).toPandas().sort_values("media_id")
    assert list(out["media_id"]) == [0, 1, 2]
    assert (out["width"] == 12).all() and (out["height"] == 10).all()
    for _, row in out.iterrows():
        px = expected[row["media_id"]].reshape(-1, 3).astype(float)
        assert np.allclose(row["mean_rgb"], px.mean(axis=0))
        assert np.allclose(row["std_rgb"], px.std(axis=0))


def test_image_resize_flattened_len(spark, media):
    out = image_resize(media, target_w=4, target_h=3).toPandas()
    assert all(len(p) == 4 * 3 * 3 for p in out["pixels"])
    assert all(0.0 <= v <= 1.0 for p in out["pixels"] for v in p)


def test_frame_sample_counts(spark, media):
    out = frame_sample(media, every_n=10).toPandas()
    # frames 0,10,...,90 -> 10 rows
    assert len(out) == 10
    assert out["frame_idx"].max() == 90


def test_frame_extract_golden(spark, media):
    """Decoded frame features equal NumPy means of the very frames we
    encoded, and the emitted frame indexes match the frame_sample plan."""
    rng = np.random.default_rng(4)
    for _ in range(3):  # replay the fixture's image draws
        rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    vid = rng.integers(0, 256, size=(95, 4, 6, 3), dtype=np.uint8)
    out = frame_extract(media, every_n=10).toPandas().sort_values("frame_idx")
    assert list(out["frame_idx"]) == list(range(0, 95, 10))
    assert (out["width"] == 6).all() and (out["height"] == 4).all()
    for _, row in out.iterrows():
        expected = vid[row["frame_idx"]].reshape(-1, 3).astype(float).mean(axis=0)
        np.testing.assert_allclose(row["mean_rgb"], expected)


def test_audio_features_wav_equals_raw_pcm(spark, media):
    """The same samples through the WAV container and as raw PCM produce
    identical spectral features — the container parse is lossless."""
    out = audio_features(media, n_bands=4).toPandas().sort_values("media_id")
    assert list(out["media_id"]) == [3, 4]
    assert (out["n_samples"] == 256).all()
    wav_bands = np.asarray(list(out["band_energy"])[0])
    raw_bands = np.asarray(list(out["band_energy"])[1])
    assert np.allclose(wav_bands, raw_bands)
    # a low-frequency sine concentrates energy in the first band
    assert wav_bands[0] == max(wav_bands)


def test_media_from_documents_real_payloads(spark):
    """The fixture generator emits decodable BMP/WAV container bytes."""
    from fdi_flow_spark.pipelines.multimodal import media_from_documents

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some text content") for i in range(12)],
        "doc_id long, text string",
    )
    rows = media_from_documents(docs).collect()
    assert len(rows) == 12
    for r in rows:
        if r["kind"] == "image":
            arr = decode_image(bytes(r["payload"]))
            assert arr.shape == (r["meta"]["height"], r["meta"]["width"], 3)
        elif r["kind"] == "audio":
            pcm, rate = decode_wav(bytes(r["payload"]))
            assert rate == r["meta"]["sample_rate"]
            assert len(pcm) >= 16


# ------------------------------------------------------- codec properties

from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 9),
    w=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    pixels = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(pixels)), pixels)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 300),
    ch=st.integers(1, 3),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    pcm = (
        np.random.default_rng(seed)
        .integers(-(2**15), 2**15, size=(n, ch))
        .astype("<i2")
    )
    out, got_rate = decode_wav(encode_wav(pcm, rate))
    assert got_rate == rate
    assert np.array_equal(out, pcm)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 8),
    h=st.integers(1, 7),
    w=st.integers(1, 7),
    fps=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_property(n, h, w, fps, seed):
    frames = np.random.default_rng(seed).integers(
        0, 256, size=(n, h, w, 3), dtype=np.uint8
    )
    out, got_fps = decode_avi(encode_avi(frames, fps=fps))
    assert got_fps == fps
    assert np.array_equal(out, frames)

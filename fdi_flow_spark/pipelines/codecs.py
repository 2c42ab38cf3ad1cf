"""Pure-NumPy media codecs: 24-bit uncompressed BMP and 16-bit PCM WAV.

No external image/audio libraries exist in this environment, but both
formats are simple enough to implement honestly from their public
specifications (BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR
rows padded to 4 bytes; WAV: RIFF container with ``fmt `` and ``data``
chunks, little-endian int16 PCM). These replace the round-3 "deterministic
fake" decoder in ``multimodal.py`` — the byte->pixel / byte->sample step is
now a real decode of real container bytes.

The encoders exist so fixtures (tests, ``media_from_documents``) can
produce genuine BMP/WAV payloads; decode(encode(x)) round-trips exactly.
Everything here is driver/executor-agnostic NumPy over ``bytes`` — the
Arrow-batched ``mapInPandas`` kernels in ``multimodal.py`` call these per
payload inside an executor batch.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------- BMP

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, data offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER (40 bytes)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP.

    Rows are written bottom-up in BGR order, each padded to a 4-byte
    boundary, per the BITMAPINFOHEADER spec (positive height = bottom-up).
    """
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {arr.shape}")
    h, w = arr.shape[:2]
    row_size = (3 * w + 3) // 4 * 4
    image_size = row_size * h
    data_offset = _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size  # 54
    file_header = _BMP_FILE_HEADER.pack(b"BM", data_offset + image_size, 0, 0, data_offset)
    info_header = _BMP_INFO_HEADER.pack(
        _BMP_INFO_HEADER.size, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    # bottom-up rows, BGR channel order, zero padding to row_size
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : 3 * w] = arr[::-1, :, ::-1].reshape(h, 3 * w)
    return file_header + info_header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24- or 32-bit uncompressed BMP into an (h, w, 3) uint8 RGB
    array. Handles bottom-up (height > 0) and top-down (height < 0) rows
    and 4-byte row padding; paletted / compressed BMPs are rejected."""
    buf = bytes(payload)
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    _, _, _, _, data_offset = _BMP_FILE_HEADER.unpack_from(buf, 0)
    (
        header_size,
        width,
        height,
        _planes,
        bpp,
        compression,
        _img_size,
        _ppm_x,
        _ppm_y,
        _colors,
        _important,
    ) = _BMP_INFO_HEADER.unpack_from(buf, _BMP_FILE_HEADER.size)
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    bottom_up = height > 0
    h, w = abs(height), width
    bytes_pp = bpp // 8
    row_size = (bytes_pp * w + 3) // 4 * 4
    end = data_offset + row_size * h
    if w <= 0 or h <= 0 or len(buf) < end:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(buf, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rows = rows.reshape(h, row_size)[:, : bytes_pp * w].reshape(h, w, bytes_pp)
    rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB, dropping alpha if present
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


# --------------------------------------------------------------------- WAV

_RIFF_HEADER = struct.Struct("<4sI4s")
_FMT_CHUNK = struct.Struct("<HHIIHH")  # format, channels, rate, byte rate, align, bits


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 PCM samples ((n,) mono or (n, ch)) as a RIFF/WAVE file."""
    pcm = np.asarray(samples, dtype="<i2")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    if pcm.ndim != 2:
        raise ValueError(f"expected (n,) or (n, channels) samples, got shape {pcm.shape}")
    n_channels = pcm.shape[1]
    block_align = 2 * n_channels
    data = pcm.tobytes()  # interleaved little-endian int16
    fmt = _FMT_CHUNK.pack(1, n_channels, sample_rate, sample_rate * block_align, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload -> ((n, channels) int16 array, sample_rate).

    Walks the chunk list (chunks are word-aligned), requires a PCM 16-bit
    ``fmt `` chunk before ``data``; other chunks (LIST, cue, ...) are
    skipped.
    """
    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos, n_channels, sample_rate = 12, None, None
    while pos + 8 <= len(buf):
        chunk_id = buf[pos : pos + 4]
        (chunk_size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if chunk_id == b"fmt ":
            if chunk_size < _FMT_CHUNK.size or body + _FMT_CHUNK.size > len(buf):
                raise ValueError("truncated WAV fmt chunk")
            audio_format, n_channels, sample_rate, _, _, bits = _FMT_CHUNK.unpack_from(buf, body)
            if audio_format != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding (format={audio_format}, bits={bits})")
        elif chunk_id == b"data":
            if n_channels is None:
                raise ValueError("WAV data chunk before fmt chunk")
            size = min(chunk_size, len(buf) - body)
            n_frames = size // (2 * n_channels)
            pcm = np.frombuffer(buf, dtype="<i2", count=n_frames * n_channels, offset=body)
            return pcm.reshape(n_frames, n_channels).copy(), int(sample_rate)
        pos = body + chunk_size + (chunk_size & 1)  # chunks are word-aligned
    raise ValueError("WAV payload has no data chunk")

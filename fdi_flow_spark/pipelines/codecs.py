"""Pure-NumPy media codecs: 24-bit uncompressed BMP, 16-bit PCM WAV, and
uncompressed 24-bit DIB AVI video.

No external image/audio/video libraries exist in this environment, but all
three formats are simple enough to implement honestly from their public
specifications (BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR
rows padded to 4 bytes; WAV: RIFF container with ``fmt `` and ``data``
chunks, little-endian int16 PCM; AVI: RIFF container with ``hdrl``
stream-header lists and raw ``00db`` DIB frames in the ``movi`` list —
each frame laid out exactly like a BMP pixel body). These replace the
round-3 "deterministic fake" decoder in ``multimodal.py`` — the
byte->pixel / byte->sample / byte->frame step is now a real decode of real
container bytes. Compressed codecs (JPEG/H.264/MP3) stay out of scope —
they need entropy-coding stacks this container cannot provide.

The encoders exist so fixtures (tests, ``media_from_documents``) can
produce genuine BMP/WAV/AVI payloads; decode(encode(x)) round-trips
exactly. Everything here is driver/executor-agnostic NumPy over ``bytes``
— the Arrow-batched ``mapInPandas`` kernels in ``multimodal.py`` call
these per payload inside an executor batch.
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


# --------------------------------------------------------------------- AVI
#
# Uncompressed ("DIB ") AVI per the public RIFF/AVI spec: RIFF('AVI ')
# containing LIST('hdrl') [avih + LIST('strl') [strh('vids'), strf =
# BITMAPINFOHEADER]] then LIST('movi') with one '00db' chunk per frame.
# Frame bytes are the BMP pixel-body layout: bottom-up rows, BGR, rows
# padded to 4 bytes. The optional idx1 index is written for players but the
# decoder does not require it.

_AVIH = struct.Struct("<IIIIIIIIIIIIII")  # 56-byte main header
_STRH = struct.Struct("<4s4sIHHIIIIIIIIhhhh")  # 56-byte stream header


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + body)


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode (n_frames, h, w, 3) uint8 RGB as an uncompressed 24-bit AVI."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) RGB frames, got shape {arr.shape}")
    n, h, w = arr.shape[:3]
    row_size = (3 * w + 3) // 4 * 4
    frame_size = row_size * h
    # bottom-up BGR padded rows, one '00db' chunk per frame
    rows = np.zeros((n, h, row_size), dtype=np.uint8)
    rows[:, :, : 3 * w] = arr[:, ::-1, :, ::-1].reshape(n, h, 3 * w)
    movi_frames = b"".join(_chunk(b"00db", f.tobytes()) for f in rows)
    avih = _AVIH.pack(
        1_000_000 // max(fps, 1),  # microseconds per frame
        frame_size * fps,  # max bytes per second
        0,  # padding granularity
        0x10,  # flags: AVIF_HASINDEX
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = _STRH.pack(
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0, 0, 0, w, h
    )
    strf = _BMP_INFO_HEADER.pack(40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", movi_frames)
    # idx1: (fourcc, flags=KEYFRAME, offset from movi list start, size)
    idx_entries = []
    off = 4  # offsets count from the 'movi' fourcc
    for _ in range(n):
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, frame_size))
        off += 8 + frame_size + (frame_size & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an uncompressed 24-bit DIB AVI -> ((n, h, w, 3) uint8 RGB, fps).

    Walks the RIFF chunk tree: reads dims/bpp from the first video ``strf``
    (BITMAPINFOHEADER), fps from ``strh`` rate/scale, then every ``00db``
    raw-DIB chunk in the ``movi`` list. Compressed streams are rejected.
    """
    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/'AVI ' magic)")
    width = height = None
    fps = 0
    bottom_up = True  # positive strf height = bottom-up DIB (the common case)
    frames: list[np.ndarray] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height, fps, bottom_up
        pos = start
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body = pos + 8
            stop = min(body + size, end)
            if cid == b"LIST":
                walk(body + 4, stop)  # skip the list-type fourcc
            elif cid == b"strh" and size >= _STRH.size:
                fields = _STRH.unpack_from(buf, body)
                if fields[0] == b"vids":
                    if fields[1] not in (b"DIB ", b"\x00\x00\x00\x00"):
                        raise ValueError(f"unsupported AVI video codec {fields[1]!r}")
                    scale, rate = fields[6], fields[7]
                    fps = rate // scale if scale else rate
            elif cid == b"strf" and size >= 40 and width is None:
                (_, w, h, _, bpp, comp, *_rest) = _BMP_INFO_HEADER.unpack_from(buf, body)
                if comp != 0 or bpp != 24:
                    raise ValueError(f"unsupported AVI frame format (bpp={bpp}, compression={comp})")
                width, height, bottom_up = w, abs(h), h >= 0
            elif cid == b"00db":
                if width is None:
                    raise ValueError("AVI frame chunk before stream format header")
                row_size = (3 * width + 3) // 4 * 4
                if size < row_size * height:
                    raise ValueError("truncated AVI frame")
                rows = np.frombuffer(buf, np.uint8, count=row_size * height, offset=body)
                rgb = rows.reshape(height, row_size)[:, : 3 * width].reshape(height, width, 3)
                # BGR -> RGB always; flip rows only for bottom-up DIBs
                # (a negative strf height declares a top-down stream)
                frames.append(rgb[::-1, :, ::-1] if bottom_up else rgb[:, :, ::-1])
            pos = body + size + (size & 1)

    walk(12, len(buf))
    if not frames:
        raise ValueError("AVI payload has no raw-DIB frames")
    return np.stack(frames), int(fps)


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
            if chunk_size > len(buf) - body:
                raise ValueError("truncated WAV data chunk")
            n_frames = chunk_size // (2 * n_channels)
            pcm = np.frombuffer(buf, dtype="<i2", count=n_frames * n_channels, offset=body)
            return pcm.reshape(n_frames, n_channels).copy(), int(sample_rate)
        pos = body + chunk_size + (chunk_size & 1)  # chunks are word-aligned
    raise ValueError("WAV payload has no data chunk")

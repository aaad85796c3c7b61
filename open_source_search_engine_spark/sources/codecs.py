"""REAL media codecs from the Python stdlib — no Pillow/ffmpeg needed.

Round 1-2 shipped the multimodal plumbing with a disclosed fake codec
because the sandbox has no imaging libraries. That framing under-used
the stdlib: WAV is fully decodable with ``wave`` + numpy, PNG is
zlib-deflate + five per-row filters (implemented here from the PNG
spec, RFC 2083 §6), and uncompressed BMP is a header parse. This
module implements those three for real; only formats whose codecs
genuinely require external libraries (JPEG's DCT entropy coding,
MP4/H.264) remain on the fake-codec fallback, now narrowly scoped.

Everything is numpy-vectorized where the format allows: PNG's Up
filter and all encoders are whole-row operations; Sub/Average/Paeth
unfiltering is inherently sequential per pixel along a row (each
pixel needs the reconstructed left neighbor) but vectorizes across
channels; rows stream in one pass.

All functions are pure bytes→array/array→bytes kernels, designed to
run inside Arrow-batched ``mapInPandas`` (sources/multimodal.py) —
they never touch Spark.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type → samples/pixel


def sniff(payload: bytes) -> str:
    """Magic-byte format sniff: 'png' | 'bmp' | 'wav' | 'unknown'."""
    if payload[:8] == PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# --- PNG -------------------------------------------------------------------


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w, channels). Supports bit depth 8,
    color types 0/2/4/6, no interlace — the shapes a training corpus
    normalizes to anyway."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, []
    w = h = ch = None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or inter != 0 or color not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color}, "
                    f"interlace={inter})"
                )
            ch = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up
            cur = row + prev  # uint8 wraps mod 256, per spec
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential
            cur = row
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0  # left
                b = int(prev[x])  # up
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - ch]) if x >= ch else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c
                    )
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(h, w, ch)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, ch∈{1,2,3,4}) → PNG bytes (filter 0
    rows — simplicity over ratio; zlib does the heavy lifting)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = np.empty((h, w * ch + 1), dtype=np.uint8)
    body[:, 0] = 0  # filter type None on every row
    body[:, 1:] = arr.reshape(h, w * ch)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(body.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


# --- BMP -------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → uint8 (h, w, 3) RGB. Handles 4-byte
    row padding, bottom-up and top-down row order."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", payload[10:14])
    w, h = struct.unpack("<ii", payload[18:26])
    bpp, comp = struct.unpack("<HI", payload[28:34])
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB → 24-bit bottom-up BMP bytes."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR
    data = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(data), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


# --- WAV -------------------------------------------------------------------

_PCM_DTYPES = {1: np.uint8, 2: np.int16, 4: np.int32}


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 mono samples in [-1, 1], sample_rate).
    8/16/32-bit PCM via the stdlib ``wave`` reader; multi-channel is
    averaged to mono (the usual feature-extraction front end)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        nch, sw, rate, nframes = (
            f.getnchannels(), f.getsampwidth(), f.getframerate(),
            f.getnframes(),
        )
        raw = f.readframes(nframes)
    if sw not in _PCM_DTYPES:
        raise ValueError(f"unsupported WAV sample width {sw}")
    x = np.frombuffer(raw, dtype=_PCM_DTYPES[sw]).astype(np.float32)
    if sw == 1:  # 8-bit WAV is unsigned
        x = (x - 128.0) / 128.0
    else:
        x = x / float(2 ** (8 * sw - 1))
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float32 [-1, 1] mono → 16-bit PCM WAV bytes."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


# --- transforms ------------------------------------------------------------


def resize_nearest(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure integer index mapping (one fancy-
    index gather, no Python per-pixel work)."""
    H, W = arr.shape[:2]
    ys = (np.arange(h) * H) // h
    xs = (np.arange(w) * W) // w
    return arr[ys][:, xs]


def audio_features(x: np.ndarray, rate: int) -> dict:
    """Classic scalar front-end features over decoded samples."""
    if x.size == 0:
        return {"rms": 0.0, "zcr": 0.0, "duration_ms": 0}
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    return {
        "rms": rms,
        "zcr": zcr,
        "duration_ms": int(round(1000.0 * x.size / rate)),
    }

"""Pure-Python PNG codec (numpy + zlib) and perceptual hashing.

The runtime has no PIL/OpenCV, so the multimodal pipeline's *real*
decode path is PNG (lossless, exactly round-trippable — the PSNR≥40dB
invariant from BASELINE.json ``input_hint`` is trivially satisfied at
∞); JPEG decode is a clearly-marked stub (operators/multimodal.py), but
all Spark-side plumbing (binary columns, Arrow batch shapes, schema)
is identical for both formats.

Supports 8-bit grayscale / RGB / RGBA, all five PNG scanline filters on
decode, filter-0 on encode (deterministic output bytes — required for
byte-stable golden tables).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 → PNG."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]  # decode_png's gray shape round-trips
    if arr.ndim == 2:
        color_type, channels = 0, 1
        arr = arr[:, :, None]
    elif arr.shape[2] == 3:
        color_type, channels = 2, 3
    elif arr.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported channel count {arr.shape[2]}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.zeros((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 1:] = arr.reshape(h, w * channels)
    idat = zlib.compress(raw.tobytes(), level=6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a, b, c):
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes → HxWxC uint8 array (C = 1, 3, or 4)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0 or color_type not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color_type}, interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    channels = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = 1 + width * channels
    raw = raw.reshape(height, stride)
    filters = raw[:, 0]
    out = np.zeros((height, width * channels), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        line = raw[y, 1:].copy()
        f = filters[y]
        prev = out[y - 1] if y > 0 else np.zeros_like(line)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub
            for x in range(len(line)):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(line[x]) + int(left)) & 0xFF
        elif f == 2:  # Up
            out[y] = line + prev
        elif f == 3:  # Average
            for x in range(len(line)):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(len(line)):
                left = out[y, x - bpp] if x >= bpp else np.uint8(0)
                ul = prev[x - bpp] if x >= bpp else np.uint8(0)
                pred = _paeth(
                    np.array(left, dtype=np.uint8),
                    np.array(prev[x], dtype=np.uint8),
                    np.array(ul, dtype=np.uint8),
                )
                out[y, x] = (int(line[x]) + int(pred)) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
    return out.reshape(height, width, channels)


def png_size(data: bytes) -> tuple[int, int]:
    """(width, height) from IHDR without a full decode."""
    if data[:8] != _SIG or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", data[16:24])
    return int(w), int(h)


# --- perceptual hash ------------------------------------------------


def _to_gray(arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 2:
        return arr.astype(np.float64)
    if arr.shape[2] == 1:
        return arr[:, :, 0].astype(np.float64)
    rgb = arr[:, :, :3].astype(np.float64)
    return 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]


def _block_mean(gray: np.ndarray, n: int = 8) -> np.ndarray:
    h, w = gray.shape
    ys = (np.arange(n + 1) * h) // n
    xs = (np.arange(n + 1) * w) // n
    out = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            out[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                             xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    return out


def phash64(arr: np.ndarray) -> int:
    """8x8 average-hash over decoded pixels → signed int64 (LongType)."""
    blocks = _block_mean(_to_gray(arr), 8)
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)

"""Pure-Python BMP (Windows DIB) codec — the legacy raster format a
web crawl still encounters constantly.

Written from the public format layout (BITMAPFILEHEADER +
BITMAPINFOHEADER and its V4/V5 supersets share the same prefix):
bottom-up BGR rows padded to 4 bytes, palettized 1/4/8-bit with BGRA
color tables, 24/32-bit truecolor, and RLE8 compression (encoded
runs, absolute mode, end-of-line/bitmap and delta escapes).  The
encoder writes uncompressed 24-bit BI_RGB — the exact-roundtrip
subset every decoder reads.  BITFIELDS and RLE4 raise ``ValueError``
into the per-row error capture upstream.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 1 << 24  # same decoder cap as the JPEG/GIF codecs


def encode_bmp(rgb: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB (or HxW gray) → 24-bit uncompressed BMP."""
    arr = np.asarray(rgb, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None].repeat(3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected HxWx3 RGB or HxW gray")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return head + dib + data


def _decode_rle8(data: bytes, w: int, h: int) -> np.ndarray:
    """RLE8 → HxW palette indices (bottom-up rows, escapes per spec)."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    pos = 0
    n = len(data)
    while pos + 1 < n:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            end = min(x + cnt, w)
            if y < h:
                out[y, x:end] = val
            x = end
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 1 >= n:
                raise ValueError("truncated RLE8 delta")
            x = min(x + data[pos], w)
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: val pixels follow, word-aligned
            if pos + val > n:
                raise ValueError("truncated RLE8 absolute run")
            end = min(x + val, w)
            if y < h:
                out[y, x:end] = np.frombuffer(
                    data[pos : pos + (end - x)], dtype=np.uint8
                )
            x = end
            pos += val + (val & 1)
        if y >= h and x == 0:
            break
    return out[::-1]  # stored bottom-up


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → HxWx3 uint8 RGB."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    (_, _fsz, _r1, _r2, offset) = struct.unpack("<2sIHHI", data[:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    w, h, planes, bpp, comp, _isz, _xr, _yr, clr_used, _ = struct.unpack(
        "<iiHHIIiiII", data[18:54]
    )
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    if planes != 1:
        raise ValueError(f"bad plane count {planes}")
    if comp == 3:
        raise ValueError("BITFIELDS BMP not supported")
    if comp == 2:
        raise ValueError("RLE4 BMP not supported")
    if comp not in (0, 1):
        raise ValueError(f"unsupported BMP compression {comp}")

    palette = None
    if bpp <= 8:
        n_colors = clr_used or (1 << bpp)
        pal_off = 14 + hdr_size
        raw = data[pal_off : pal_off + 4 * n_colors]
        if len(raw) < 4 * n_colors:
            raise ValueError("truncated BMP palette")
        quads = np.frombuffer(raw, dtype=np.uint8).reshape(n_colors, 4)
        palette = quads[:, 2::-1].copy()  # BGRA → RGB

    if comp == 1:
        if bpp != 8:
            raise ValueError("RLE8 requires 8 bpp")
        idx = _decode_rle8(data[offset:], w, h)
        if top_down:
            idx = idx[::-1]
        return palette[idx]

    stride = ((w * bpp + 31) // 32) * 4
    need = stride * h
    pix = data[offset : offset + need]
    if len(pix) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(pix, dtype=np.uint8).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        rgb = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
        return rgb.copy()
    if bpp == 32:
        rgba = rows[:, : w * 4].reshape(h, w, 4)
        return rgba[:, :, 2::-1].copy()  # BGRX → RGB
    if bpp == 8:
        idx = rows[:, :w]
        if np.any(idx >= len(palette)):
            raise ValueError("BMP palette index out of range")
        return palette[idx]
    if bpp == 4:
        expanded = np.empty((h, stride * 2), dtype=np.uint8)
        expanded[:, 0::2] = rows >> 4
        expanded[:, 1::2] = rows & 0x0F
        idx = expanded[:, :w]
        if np.any(idx >= len(palette)):
            raise ValueError("BMP palette index out of range")
        return palette[idx]
    if bpp == 1:
        bits = np.unpackbits(rows, axis=1)
        idx = bits[:, :w]
        if np.any(idx >= len(palette)):
            raise ValueError("BMP palette index out of range")
        return palette[idx]
    raise ValueError(f"unsupported BMP bit depth {bpp}")

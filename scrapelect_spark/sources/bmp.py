"""Pure-Python BMP (Windows DIB) codec — the legacy raster format a
web crawl still encounters constantly.

Written from the public format layout (BITMAPFILEHEADER +
BITMAPINFOHEADER and its V4/V5 supersets share the same prefix):
bottom-up BGR rows padded to 4 bytes, palettized 1/4/8-bit with BGRA
color tables, 16/24/32-bit truecolor, RLE8 + RLE4 compression
(encoded runs, absolute mode, end-of-line/bitmap and delta escapes),
and BI_BITFIELDS with arbitrary contiguous channel masks (565/555/
8888 and friends; sub-8-bit channels scale to 0-255 by rounding).
The encoder writes uncompressed 24-bit BI_RGB — the exact-roundtrip
subset every decoder reads.
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


def _decode_rle4(data: bytes, w: int, h: int) -> np.ndarray:
    """RLE4 → HxW palette indices.  Encoded runs alternate the two
    nibbles of the value byte; absolute runs pack nibbles high-first
    and are word-aligned; escapes match RLE8."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    pos = 0
    n = len(data)
    while pos + 1 < n:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run: alternating high/low nibble
            end = min(x + cnt, w)
            if y < h and end > x:
                seq = np.empty(end - x, dtype=np.uint8)
                seq[0::2] = val >> 4
                seq[1::2] = val & 0x0F
                out[y, x:end] = seq
            x = end
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 1 >= n:
                raise ValueError("truncated RLE4 delta")
            x = min(x + data[pos], w)
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: val nibbles, high-first, word-aligned
            nbytes = (val + 1) // 2
            if pos + nbytes > n:
                raise ValueError("truncated RLE4 absolute run")
            b = np.frombuffer(data[pos : pos + nbytes], dtype=np.uint8)
            nib = np.empty(2 * nbytes, dtype=np.uint8)
            nib[0::2] = b >> 4
            nib[1::2] = b & 0x0F
            end = min(x + val, w)
            if y < h:
                out[y, x:end] = nib[: end - x]
            x = end
            pos += (nbytes + 1) & ~1
        if y >= h and x == 0:
            break
    return out[::-1]  # stored bottom-up


def _apply_masks(vals: np.ndarray, masks: tuple[int, int, int]) -> np.ndarray:
    """(h, w) uint32 pixel words + (r, g, b) channel masks → HxWx3
    uint8 RGB.  Each channel scales to 0-255 with round-to-nearest
    (identity for 8-bit masks, so 8888 BITFIELDS is lossless)."""
    chans = []
    for m in masks:
        m = int(m)
        if m == 0:
            chans.append(np.zeros(vals.shape, dtype=np.uint8))
            continue
        shift = (m & -m).bit_length() - 1
        width = (m >> shift).bit_length()
        if (m >> shift) != (1 << width) - 1:
            raise ValueError(f"non-contiguous BITFIELDS mask 0x{m:x}")
        maxv = (1 << width) - 1
        c = (vals >> shift) & maxv
        chans.append(((c * 255 + maxv // 2) // maxv).astype(np.uint8))
    return np.stack(chans, axis=-1)


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
    masks = None
    if comp == 3:  # BI_BITFIELDS
        if bpp not in (16, 32):
            raise ValueError(f"BITFIELDS requires 16/32 bpp, got {bpp}")
        # masks live at file offset 54 for every header: appended after
        # a 40-byte BITMAPINFOHEADER, in-header (DIB offset 40) for
        # the V2/V3/V4/V5 supersets
        if len(data) < 66:
            raise ValueError("truncated BITFIELDS masks")
        masks = struct.unpack("<III", data[54:66])
    elif comp not in (0, 1, 2):
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
    if comp == 2:
        if bpp != 4:
            raise ValueError("RLE4 requires 4 bpp")
        idx = _decode_rle4(data[offset:], w, h)
        if top_down:
            idx = idx[::-1]
        if np.any(idx >= len(palette)):
            raise ValueError("BMP palette index out of range")
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
    if bpp == 16:
        # BI_RGB 16-bit defaults to XRGB1555; BITFIELDS supplies masks
        if masks is None:
            masks = (0x7C00, 0x03E0, 0x001F)
        vals = (
            np.ascontiguousarray(rows[:, : w * 2])
            .view("<u2")
            .reshape(h, w)
            .astype(np.uint32)
        )
        return _apply_masks(vals, masks)
    if bpp == 32:
        if masks is not None:
            vals = (
                np.ascontiguousarray(rows[:, : w * 4])
                .view("<u4")
                .reshape(h, w)
            )
            return _apply_masks(vals, masks)
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

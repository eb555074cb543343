"""Pure-Python Truevision TGA codec — the game/texture raster a crawl
of asset sites keeps hitting.

Written from the public Truevision TGA 2.0 spec (18-byte header:
id-length, colormap spec, image type 1/2/3/9/10/11, origin/descriptor
bits): uncompressed and RLE image data (packet high bit = run, low 7
bits = count-1, raw packets carry count pixels), 8-bit grayscale,
8-bit color-mapped (15/16/24/32-bit BGR(A) palette entries), 15/16-bit
ARRRRRGG GGGBBBBB truecolor (5-bit channels scale by round(v*255/31)),
24-bit BGR and 32-bit BGRA, bottom-up (default) and top-down (bit 5)
row order plus right-to-left (bit 4) column order.  The decoder
returns HxW gray, HxWx3 RGB, or HxWx4 RGBA uint8; the encoder writes
type-10 RLE 24-bit BGR top-down — the compact exact-roundtrip subset.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 1 << 24  # same decoder cap as the JPEG/GIF/BMP codecs


def encode_tga(rgb: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB (or HxW gray) → type-10 (RLE truecolor) TGA,
    top-down, 24-bit."""
    arr = np.asarray(rgb, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None].repeat(3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected HxWx3 RGB or HxW gray")
    h, w, _ = arr.shape
    head = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, w, h, 24, 0x20
    )
    out = [head]
    bgr = arr[:, :, ::-1]
    for row in bgr:
        x = 0
        while x < w:
            # extend a run while the pixel repeats (max 128)
            run = 1
            while (
                x + run < w
                and run < 128
                and (row[x + run] == row[x]).all()
            ):
                run += 1
            if run >= 2:
                out.append(bytes((0x80 | (run - 1),)) + row[x].tobytes())
                x += run
            else:
                # literal packet: gather until a 2-run starts (max 128)
                start = x
                x += 1
                while x < w and x - start < 128:
                    if x + 1 < w and (row[x + 1] == row[x]).all():
                        break
                    x += 1
                cnt = x - start
                out.append(
                    bytes((cnt - 1,)) + row[start:x].tobytes()
                )
    return b"".join(out)


def _scale5(v: np.ndarray) -> np.ndarray:
    return np.floor(v * 255.0 / 31.0 + 0.5).astype(np.uint8)


def _unpack_pixels(raw: np.ndarray, bpp: int, n: int) -> np.ndarray:
    """(n*bytes,) uint8 → (n, channels) uint8 in RGB(A) order."""
    if bpp == 8:
        return raw.reshape(n, 1)
    if bpp in (15, 16):
        v = raw.reshape(n, 2).astype(np.uint16)
        val = v[:, 0] | (v[:, 1] << 8)
        r = _scale5((val >> 10) & 31)
        g = _scale5((val >> 5) & 31)
        b = _scale5(val & 31)
        return np.stack([r, g, b], axis=1)
    if bpp == 24:
        return raw.reshape(n, 3)[:, ::-1]  # BGR → RGB
    if bpp == 32:
        px = raw.reshape(n, 4)
        return px[:, [2, 1, 0, 3]]  # BGRA → RGBA
    raise ValueError(f"tga: unsupported depth {bpp}")


def _read_rle(data: bytes, pos: int, n_pix: int, nbytes: int) -> np.ndarray:
    """RLE packets → (n_pix*nbytes,) uint8."""
    out = np.empty(n_pix * nbytes, dtype=np.uint8)
    filled = 0
    total = n_pix * nbytes
    dn = len(data)
    while filled < total:
        if pos >= dn:
            raise ValueError("tga: truncated RLE data")
        hdr = data[pos]
        pos += 1
        count = (hdr & 0x7F) + 1
        if hdr & 0x80:  # run packet: one pixel repeated
            if pos + nbytes > dn:
                raise ValueError("tga: truncated RLE run")
            px = np.frombuffer(data, np.uint8, nbytes, pos)
            pos += nbytes
            take = min(count * nbytes, total - filled)
            out[filled : filled + take] = np.tile(px, count)[:take]
            filled += take
        else:  # raw packet
            need = count * nbytes
            if pos + need > dn:
                raise ValueError("tga: truncated RLE literal")
            take = min(need, total - filled)
            out[filled : filled + take] = np.frombuffer(
                data, np.uint8, take, pos
            )
            pos += need
            filled += take
    return out


def decode_tga(data: bytes) -> np.ndarray:
    """TGA → HxW gray / HxWx3 RGB / HxWx4 RGBA uint8."""
    if len(data) < 18:
        raise ValueError("tga: truncated header")
    (
        id_len,
        cmap_type,
        img_type,
        cmap_first,
        cmap_len,
        cmap_bpp,
        _x0,
        _y0,
        w,
        h,
        bpp,
        desc,
    ) = struct.unpack("<BBBHHBHHHHBB", data[:18])
    if img_type not in (1, 2, 3, 9, 10, 11):
        raise ValueError(f"tga: unsupported image type {img_type}")
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError("tga: bad dimensions")
    pos = 18 + id_len
    palette = None
    if cmap_type == 1:
        entry_bytes = (cmap_bpp + 7) // 8
        need = cmap_len * entry_bytes
        if len(data) < pos + need:
            raise ValueError("tga: truncated color map")
        raw = np.frombuffer(data, np.uint8, need, pos)
        palette = _unpack_pixels(raw, cmap_bpp, cmap_len)
        pos += need
    mapped = img_type in (1, 9)
    if mapped and palette is None:
        raise ValueError("tga: color-mapped image without color map")
    nbytes = (bpp + 7) // 8
    n_pix = w * h
    if img_type >= 9:  # RLE variants
        raw = _read_rle(data, pos, n_pix, nbytes)
    else:
        need = n_pix * nbytes
        if len(data) < pos + need:
            raise ValueError("tga: truncated image data")
        raw = np.frombuffer(data, np.uint8, need, pos)
    if mapped:
        if bpp != 8:
            raise ValueError("tga: only 8-bit palette indices supported")
        idx = raw.astype(np.int64) - cmap_first
        if idx.min() < 0 or idx.max() >= len(palette):
            raise ValueError("tga: palette index out of range")
        px = palette[idx]
    else:
        px = _unpack_pixels(raw, bpp, n_pix)
    img = px.reshape(h, w, px.shape[1])
    if not desc & 0x20:  # bit 5 clear → bottom-up
        img = img[::-1]
    if desc & 0x10:  # bit 4 → right-to-left
        img = img[:, ::-1]
    if img.shape[2] == 1:
        img = img[:, :, 0]
    return np.ascontiguousarray(img)

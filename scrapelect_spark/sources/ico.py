"""Pure-Python ICO (Windows icon) reader — favicons are the single
most-fetched image class in a web crawl.

Written from the public ICONDIR/ICONDIRENTRY layout: a 6-byte header
(reserved=0, type=1) and 16-byte directory entries pointing at image
blobs that are either (a) a PNG stream (Vista+ icons — detected by
signature) decoded by ``sources/png.py``, or (b) a headerless DIB: a
BITMAPINFOHEADER whose biHeight covers BOTH the XOR (color) and AND
(1-bit transparency mask) bitmaps.  The DIB path reuses the BMP
codec's pixel machinery by synthesizing a BITMAPFILEHEADER around the
XOR half, then applies the AND mask as an alpha channel (mask bit set
→ transparent).  ``decode_ico`` returns the LARGEST image in the file
(area, then bit depth) as HxWx4 RGBA; ``ico_entries`` lists all
directory entries for metadata extraction.
"""

from __future__ import annotations

import struct

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def ico_entries(data: bytes) -> list[dict]:
    """Parse the ICONDIR: [{w, h, bpp, size, offset}, ...]."""
    if len(data) < 6:
        raise ValueError("ico: truncated header")
    reserved, kind, count = struct.unpack("<HHH", data[:6])
    if reserved != 0 or kind not in (1, 2) or count == 0:
        raise ValueError("ico: not an icon file")
    out = []
    for i in range(count):
        off = 6 + 16 * i
        if len(data) < off + 16:
            raise ValueError("ico: truncated directory")
        w, h, _colors, _rsv, _planes, bpp, size, img_off = struct.unpack(
            "<BBBBHHII", data[off : off + 16]
        )
        if img_off + size > len(data):
            raise ValueError("ico: entry points past EOF")
        out.append(
            {
                "w": w or 256,  # 0 encodes 256 per spec
                "h": h or 256,
                "bpp": bpp,
                "size": size,
                "offset": img_off,
            }
        )
    return out


def _decode_dib_entry(blob: bytes) -> np.ndarray:
    """Headerless DIB (XOR + AND bitmaps) → HxWx4 RGBA."""
    from .bmp import decode_bmp

    if len(blob) < 40:
        raise ValueError("ico: truncated DIB")
    (size, w, h2) = struct.unpack("<Iii", blob[:12])
    bpp = struct.unpack("<H", blob[14:16])[0]
    if size < 40 or h2 % 2 != 0:
        raise ValueError("ico: bad DIB header")
    h = h2 // 2
    # rebuild a standalone BMP carrying only the XOR half: patch
    # biHeight, recompute the pixel-array offset (header + palette)
    ncolors = struct.unpack("<I", blob[32:36])[0]
    if ncolors == 0 and bpp <= 8:
        ncolors = 1 << bpp
    xor_off = size + ncolors * 4
    xor_stride = ((w * bpp + 31) // 32) * 4
    if bpp == 32:
        # decode_bmp drops the 4th byte — read BGRA rows directly
        need = xor_stride * h
        if len(blob) < xor_off + need:
            raise ValueError("ico: truncated 32-bit XOR bitmap")
        rows = np.frombuffer(blob, np.uint8, need, xor_off).reshape(
            h, xor_stride
        )[:, : w * 4]
        rgba = np.ascontiguousarray(
            rows.reshape(h, w, 4)[::-1][:, :, [2, 1, 0, 3]]
        )
        return rgba
    # ≤24-bit: rebuild a standalone BMP around the XOR half and reuse
    # the BMP codec, then apply the AND mask as alpha
    hdr = bytearray(blob[:size])
    struct.pack_into("<i", hdr, 8, h)
    fhdr = struct.pack("<2sIHHI", b"BM", 14 + len(blob), 0, 0, 14 + xor_off)
    rgb = decode_bmp(bytes(fhdr) + bytes(hdr) + blob[size:])
    if rgb.ndim == 2:
        rgb = rgb[:, :, None].repeat(3, axis=2)
    rgba = np.concatenate(
        [rgb[:, :, :3], np.full((h, w, 1), 255, np.uint8)], axis=2
    )
    # AND mask: 1-bit rows padded to 32 bits, bottom-up, AFTER the XOR
    # bitmap; set bits mean transparent
    and_off = xor_off + xor_stride * h
    and_stride = ((w + 31) // 32) * 4
    if len(blob) >= and_off + and_stride * h:
        rows = np.frombuffer(
            blob, np.uint8, and_stride * h, and_off
        ).reshape(h, and_stride)
        bits = np.unpackbits(rows, axis=1)[:, :w][::-1]  # bottom-up
        rgba[:, :, 3] = np.where(bits == 1, 0, rgba[:, :, 3])
    return rgba


def decode_ico(data: bytes) -> np.ndarray:
    """ICO → the largest contained image as HxWx4 RGBA uint8."""
    entries = ico_entries(data)
    best = max(entries, key=lambda e: (e["w"] * e["h"], e["bpp"]))
    blob = data[best["offset"] : best["offset"] + best["size"]]
    if blob.startswith(_PNG_SIG):
        from .png import decode_png

        arr = decode_png(blob)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if arr.shape[2] == 1:
            arr = arr.repeat(3, axis=2)
        if arr.shape[2] == 3:
            arr = np.concatenate(
                [arr, np.full((*arr.shape[:2], 1), 255, np.uint8)], axis=2
            )
        return arr
    return _decode_dib_entry(blob)


def encode_ico(rgba: np.ndarray) -> bytes:
    """HxWx4 RGBA (or HxWx3 / HxW) uint8 → single-entry ICO carrying a
    32-bit DIB with AND mask derived from alpha<128."""
    arr = np.asarray(rgba, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None].repeat(3, axis=2)
    if arr.shape[2] == 3:
        arr = np.concatenate(
            [arr, np.full((*arr.shape[:2], 1), 255, np.uint8)], axis=2
        )
    h, w, _ = arr.shape
    if w > 256 or h > 256:
        raise ValueError("ico: max dimension is 256")
    bgra = arr[::-1, :, [2, 1, 0, 3]]  # bottom-up BGRA
    xor = bgra.tobytes()
    and_stride = ((w + 31) // 32) * 4
    mask_bits = (arr[::-1, :, 3] < 128).astype(np.uint8)
    rows = np.zeros((h, and_stride * 8), dtype=np.uint8)
    rows[:, :w] = mask_bits
    and_map = np.packbits(rows, axis=1).tobytes()
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0, len(xor) + len(and_map),
        0, 0, 0, 0,
    )
    blob = dib + xor + and_map
    entry = struct.pack(
        "<BBBBHHII",
        w % 256,
        h % 256,
        0,
        0,
        1,
        32,
        len(blob),
        6 + 16,
    )
    return struct.pack("<HHH", 0, 1, 1) + entry + blob

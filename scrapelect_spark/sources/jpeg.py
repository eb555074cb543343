"""Pure-numpy baseline JFIF (JPEG) codec.

The runtime has no PIL/libjpeg, but the ``input_hint`` corpus schema
(``fmt:string``) and the BASELINE.json per-row invariant ("decoded-pixel
allclose, PSNR ≥ 40 dB for lossy formats") presuppose lossy images — so
the decode path must be REAL, not a stub.  This module implements the
baseline sequential DCT process (ITU-T T.81 / ISO 10918-1, the profile
virtually all web JPEGs use) plus the progressive DCT process (SOF2):

- encoder: level shift → 8×8 DCT-II (one einsum over all blocks) →
  Annex-K quantization tables scaled by the libjpeg quality formula →
  zigzag → differential-DC / run-length-AC Huffman coding with the
  Annex-K standard tables → JFIF container (SOI APP0 DQT SOF0 DHT SOS
  EOI), with optional 4:2:0 chroma subsampling, restart markers, and a
  progressive mode (SOF2 with a spectral-selection +
  DC-successive-approximation scan script);
- decoder: marker parse (APPn/COM skip, DQT 8/16-bit, DHT, DRI,
  SOF0/1/2, multi-scan SOS), canonical Huffman decode with byte
  unstuffing and RSTn restart handling; progressive scans cover DC/AC
  first and refinement passes, EOB runs, and non-interleaved
  per-component geometry (T.81 §G); dequant + vectorized IDCT,
  sampling-factor chroma upsampling, YCbCr→RGB (BT.601 full-range).

Hierarchical, lossless, arithmetic coding, and 12-bit precision raise
``NotImplementedError`` — the two DCT Huffman processes above are the
declared scope (they cover essentially all web JPEGs).

Everything here is from the public spec; tables are ITU T.81 Annex K.
"""

from __future__ import annotations

import struct

import numpy as np

#: decoder safety cap (4096×4096): above this, coefficient grids reach
#: hundreds of MB and the per-block Python loop runs minutes — one
#: poisoned row must fail per-row, not stall an executor task
MAX_PIXELS = 1 << 24

# --- constants (ITU T.81 Annex K) ------------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II basis: forward F = A B Aᵀ, inverse B = Aᵀ F A
_A = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    _A[_k] = _c * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16.0)



def _comp_block_dims(fw: int, fh: int, hs: int, vs: int, hmax: int, vmax: int):
    """A component's TRUE block grid (bw, bh): ceil(ceil(dim*s/smax)/8)
    — the non-interleaved scan geometry (T.81 A.1.1 / A.2.3)."""
    comp_w = -(-fw * hs // hmax)
    comp_h = -(-fh * vs // vmax)
    return -(-comp_w // 8), -(-comp_h // 8)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality → table scaling (public formula)."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((table * scale + 50) / 100)
    return np.clip(q, 1, 255)


# --- Huffman code construction ---------------------------------------


def _build_codes(bits, vals):
    """symbol → (code, length) from the DHT bits/vals form."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Pad the partial byte with 1-bits (spec padding)."""
        if self.nbits:
            pad = 8 - self.nbits
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.nbits = 0

    def raw(self, b: bytes) -> None:
        """Append marker bytes verbatim (no stuffing)."""
        self.buf += b

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(category s, s-bit code) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _encode_blocks(
    writer: _BitWriter, coeffs: np.ndarray, dc_codes, ac_codes, pred: int
) -> int:
    """Huffman-encode zigzagged integer coefficient blocks
    (n, 64); returns the updated DC predictor."""
    for blk in coeffs:
        s, code = _magnitude(int(blk[0]) - pred)
        pred = int(blk[0])
        c, ln = dc_codes[s]
        writer.write(c, ln)
        if s:
            writer.write(code, s)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]  # ZRL
                writer.write(c, ln)
                run -= 16
            s, code = _magnitude(v)
            c, ln = ac_codes[(run << 4) | s]
            writer.write(c, ln)
            writer.write(code, s)
            run = 0
        if last < 63:
            c, ln = ac_codes[0x00]  # EOB
            writer.write(c, ln)
    return pred


def _plane_to_coeffs(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) → (nblocks, 64) quantized
    zigzag coefficients; block order is raster within the plane."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    f = np.einsum("ij,njk,lk->nil", _A, blocks, _A)
    q = np.round(f / qtab).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _pad_replicate(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (h + mh - 1) // mh * mh
    pw = (w + mw - 1) // mw * mw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 → JFIF.
    ``subsampling``: "444" (no chroma subsampling) or "420";
    ``restart_interval``: emit a DRI segment + RSTn marker every that
    many MCUs (0 = none; sequential only); ``progressive``: emit the
    progressive DCT process (SOF2) with a spectral-selection +
    DC-successive-approximation scan script."""
    arr = np.asarray(arr)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    if not gray and arr.shape[2] != 3:
        raise ValueError(f"unsupported channel count {arr.shape[2]}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = arr.shape[:2]
    qy = _quality_scale(Q_LUMA, quality)
    qc = _quality_scale(Q_CHROMA, quality)

    dc_y = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_y = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    if gray:
        comps = [(1, 1, 1, 0)]  # id, hs, vs, qid
        planes = [arr.astype(np.float64) - 128.0]
    else:
        ycc = rgb_to_ycbcr(arr)
        if subsampling == "444":
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            planes = [ycc[..., i] - 128.0 for i in range(3)]
        else:  # 420: full-res Y, 2x2-mean-downsampled chroma
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]

            def down(p):
                p = _pad_replicate(p, 2, 2)
                return (
                    p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
                    .mean(axis=(1, 3))
                )

            planes = [
                ycc[..., 0] - 128.0,
                down(ycc[..., 1]) - 128.0,
                down(ycc[..., 2]) - 128.0,
            ]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    # per-component quantized zigzag blocks, in plane-raster order
    comp_coeffs = []
    comp_bw = []  # blocks per row
    for (cid, hs, vs, qid), plane in zip(comps, planes):
        full = _pad_replicate(plane, 8, 8)  # edge-pad to 8x8 blocks
        qtab = qy if qid == 0 else qc
        comp_coeffs.append(_plane_to_coeffs(full, qtab))
        comp_bw.append(full.shape[1] // 8)

    # interleaved MCU entropy stream
    writer = _BitWriter()
    preds = [0] * len(comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # re-pad coefficient grids so every MCU block index exists
    grids = []
    for (cid, hs, vs, qid), coeffs, bw in zip(comps, comp_coeffs, comp_bw):
        need_bw = mcus_x * hs
        need_bh = mcus_y * vs
        bh = coeffs.shape[0] // bw
        g = coeffs.reshape(bh, bw, 64)
        if bw < need_bw or bh < need_bh:
            g = np.pad(
                g, ((0, need_bh - bh), (0, need_bw - bw), (0, 0)), mode="edge"
            )
        grids.append(g)
    scans: list[bytes] = []  # (SOS header + entropy) per scan
    if progressive:
        if restart_interval:
            raise ValueError("restart_interval with progressive not supported")
        scans = _progressive_scans(
            comps, grids, mcus_x, mcus_y, hmax, vmax, w, h,
            dc_y, ac_y, dc_c, ac_c,
        )
        entropy = b""
    else:
        mcu_index = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                    writer.align()
                    writer.raw(
                        bytes([0xFF, 0xD0 + (mcu_index // restart_interval - 1) % 8])
                    )
                    preds = [0] * len(comps)
                mcu_index += 1
                for ci, (cid, hs, vs, qid) in enumerate(comps):
                    dc = dc_y if ci == 0 else dc_c
                    ac = ac_y if ci == 0 else ac_c
                    for by in range(vs):
                        for bx in range(hs):
                            blk = grids[ci][my * vs + by, mx * hs + bx][None, :]
                            preds[ci] = _encode_blocks(writer, blk, dc, ac, preds[ci])
        entropy = writer.flush()

    # --- container ---
    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for qid, qtab in ((0, qy), (1, qc)) if not gray else ((0, qy),):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([qid])
        out += bytes(int(v) for v in qtab.reshape(64)[ZIGZAG])
    ncomp = len(comps)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    sof = 0xC2 if progressive else 0xC0
    out += bytes([0xFF, sof]) + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid, hs, vs, qid in comps:
        out += bytes([cid, (hs << 4) | vs, qid])
    tables = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
              (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
                   (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    for tc, bits, vals in tables:
        out += b"\xFF\xC4" + struct.pack(">H", 3 + 16 + len(vals)) + bytes([tc])
        out += bytes(bits) + bytes(vals)
    if progressive:
        for seg in scans:
            out += seg
    else:
        out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
        for ci, (cid, hs, vs, qid) in enumerate(comps):
            td = 0 if ci == 0 else 1
            out += bytes([cid, (td << 4) | td])
        out += b"\x00\x3F\x00"
        out += entropy
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def _sos_header(scan_comps: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
    """SOS segment: [(cid, td, ta)], spectral band, approximation."""
    ns = len(scan_comps)
    out = bytearray(b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ns, ns))
    for cid, td, ta in scan_comps:
        out += bytes([cid, (td << 4) | ta])
    out += bytes([ss, se, (ah << 4) | al])
    return bytes(out)


def _progressive_scans(
    comps, grids, mcus_x, mcus_y, hmax, vmax, w, h, dc_y, ac_y, dc_c, ac_c
) -> list[bytes]:
    """Progressive scan script: interleaved DC first (Al=1) → per-
    component AC bands 1-5 and 6-63 (Al=0, EOB0-terminated — standard
    Annex-K tables can't code EOBn, which is an encoder choice) →
    interleaved DC refinement (Ah=1, Al=0)."""
    segs: list[bytes] = []

    # 1. DC first pass, interleaved, point transform Al=1
    writer = _BitWriter()
    preds = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (cid, hs, vs, qid) in enumerate(comps):
                dct = dc_y if ci == 0 else dc_c
                for by in range(vs):
                    for bx in range(hs):
                        dc = int(grids[ci][my * vs + by, mx * hs + bx][0])
                        t = dc >> 1  # arithmetic shift = T.81 point transform
                        s, code = _magnitude(t - preds[ci])
                        preds[ci] = t
                        c, ln = dct[s]
                        writer.write(c, ln)
                        if s:
                            writer.write(code, s)
    segs.append(
        _sos_header(
            [(cid, (0 if ci == 0 else 1), 0)
             for ci, (cid, _, _, _) in enumerate(comps)],
            0, 0, 0, 1,
        )
        + writer.flush()
    )

    # 2. AC bands per component, Al=0, over the TRUE block grid
    for ci, (cid, hs, vs, qid) in enumerate(comps):
        act = ac_y if ci == 0 else ac_c
        bw_c, bh_c = _comp_block_dims(w, h, hs, vs, hmax, vmax)
        for ss, se in ((1, 5), (6, 63)):
            writer = _BitWriter()
            for by in range(bh_c):
                for bx in range(bw_c):
                    blk = grids[ci][by, bx]
                    run = 0
                    for k in range(ss, se + 1):
                        v = int(blk[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            c, ln = act[0xF0]  # ZRL
                            writer.write(c, ln)
                            run -= 16
                        s, code = _magnitude(v)
                        c, ln = act[(run << 4) | s]
                        writer.write(c, ln)
                        writer.write(code, s)
                        run = 0
                    if run > 0:
                        c, ln = act[0x00]  # EOB0
                        writer.write(c, ln)
            segs.append(
                _sos_header([(cid, 0, (0 if ci == 0 else 1))], ss, se, 0, 0)
                + writer.flush()
            )

    # 3. DC refinement: raw bit Al=0 per block, interleaved
    writer = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (cid, hs, vs, qid) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        dc = int(grids[ci][my * vs + by, mx * hs + bx][0])
                        writer.write(dc & 1, 1)
    segs.append(
        _sos_header(
            [(cid, 0, 0) for cid, _, _, _ in comps], 0, 0, 1, 0
        )
        + writer.flush()
    )
    return segs


# --- decoder ----------------------------------------------------------


class _HuffTable:
    __slots__ = ("maxcode", "mincode", "valptr", "vals")

    def __init__(self, bits, vals):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    non-RST marker."""

    __slots__ = ("data", "pos", "acc", "nbits", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            self.acc = (self.acc << 8) | 0
            self.nbits += 8
            return
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, t: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            if t.maxcode[length] >= code >= t.mincode[length]:
                return t.vals[t.valptr[length] + code - t.mincode[length]]
        raise ValueError("bad Huffman code")

    def restart(self) -> None:
        """Align to byte, consume the RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos`` (skipping
    entropy bytes, 0xFF00 stuffing, and fill 0xFF bytes)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00 or nxt == 0xFF:
            pos += 2 if nxt == 0x00 else 1
            continue
        return pos
    return n


def _dc_block(reader, blk, htabs, td, ah, al, preds, cs):
    if ah == 0:
        s = reader.huff(htabs[(0, td)])
        diff = _extend(reader.bits(s), s) if s else 0
        preds[cs] += diff
        blk[0] = preds[cs] << al
    else:
        if reader.bits(1):
            blk[0] = int(blk[0]) | (1 << al)


def _decode_dc_scan(
    reader, scan, by_id, grids, htabs, mcus_x, mcus_y, hmax, vmax,
    fw, fh, ah, al, restart_interval,
):
    """DC scan (Ss=0,Se=0): interleaved MCU walk when the scan covers
    several components; a single-component DC scan walks that
    component's TRUE block grid (one data unit per MCU, T.81 A.2.3).
    Ah=0 → first pass (diff-coded, point-transformed), Ah>0 → one
    refinement bit per block."""
    preds = {cs: 0 for cs, _, _ in scan}
    if len(scan) == 1 and len(by_id) > 1:
        cs, td, ta = scan[0]
        cid, hs, vs, tq = by_id[cs]
        bw_c, bh_c = _comp_block_dims(fw, fh, hs, vs, hmax, vmax)
        blk_index = 0
        for by in range(bh_c):
            for bx in range(bw_c):
                if (
                    restart_interval
                    and blk_index
                    and blk_index % restart_interval == 0
                ):
                    reader.restart()
                    preds = {cs: 0}
                blk_index += 1
                _dc_block(reader, grids[cs][by, bx], htabs, td, ah, al, preds, cs)
        return
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.restart()
                preds = {cs: 0 for cs, _, _ in scan}
            mcu_index += 1
            for cs, td, ta in scan:
                cid, hs, vs, tq = by_id[cs]
                for by in range(vs):
                    for bx in range(hs):
                        blk = grids[cs][my * vs + by, mx * hs + bx]
                        _dc_block(reader, blk, htabs, td, ah, al, preds, cs)


def _decode_ac_scan(
    reader, cs, comp, grids, act, ss, se, ah, al, bw_c, bh_c, restart_interval
):
    """AC scan (Ss≥1): single-component block raster over the
    component's true block grid; Ah=0 → first pass with EOB runs,
    Ah>0 → successive-approximation refinement (T.81 G.1.2.3)."""
    eobrun = 0
    p1 = 1 << al
    m1 = -p1
    blk_index = 0
    for by in range(bh_c):
        for bx in range(bw_c):
            if restart_interval and blk_index and blk_index % restart_interval == 0:
                reader.restart()
                eobrun = 0
            blk_index += 1
            blk = grids[cs][by, bx]
            if ah == 0:  # first pass for this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.huff(act)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("AC run overflow")
                    blk[k] = _extend(reader.bits(s), s) << al
                    k += 1
            else:  # refinement pass
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.huff(act)
                        r, s = rs >> 4, rs & 0x0F
                        val = 0
                        if s == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.bits(r)
                                break
                            # r == 15 (ZRL): skip 16 zero-history coeffs
                        else:
                            if s != 1:
                                raise ValueError("bad AC refinement size")
                            val = p1 if reader.bits(1) else m1
                        while k <= se:
                            c = int(blk[k])
                            if c != 0:
                                if reader.bits(1) and (abs(c) & p1) == 0:
                                    blk[k] = c + (p1 if c > 0 else m1)
                            else:
                                r -= 1
                                if r < 0:
                                    break
                            k += 1
                        if val and k <= se:
                            blk[k] = val
                        k += 1
                if eobrun > 0:
                    # correction bits for the rest of this block's band
                    while k <= se:
                        c = int(blk[k])
                        if c != 0:
                            if reader.bits(1) and (abs(c) & p1) == 0:
                                blk[k] = c + (p1 if c > 0 else m1)
                        k += 1
                    eobrun -= 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode JFIF bytes → HxWxC uint8 (C=1 gray, 3 RGB).

    Supports the baseline sequential process (SOF0/1) and the
    progressive DCT process (SOF2: spectral selection + successive
    approximation, DC and AC first/refinement scans, EOB runs,
    restart markers) — together these cover essentially all web
    JPEGs.  Hierarchical/lossless/arithmetic/12-bit still raise."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    progressive = False
    restart_interval = 0
    grids: dict[int, np.ndarray] = {}
    geo = None  # (hmax, vmax)
    saw_scan = False
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    tab = np.frombuffer(body[p : p + 64], dtype=np.uint8).astype(
                        np.float64
                    )
                    p += 64
                else:
                    tab = np.frombuffer(
                        body[p : p + 128], dtype=">u2"
                    ).astype(np.float64)
                    p += 128
                q = np.zeros(64)
                q[ZIGZAG] = tab
                qtabs[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                htabs[(tc, th)] = _HuffTable(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            if fh == 0 or fw == 0 or fh * fw > MAX_PIXELS:
                # corrupt/adversarial SOF dims would drive a multi-GB
                # coefficient allocation and a multi-minute Python
                # block loop — refuse like real decoders cap
                raise ValueError(
                    f"JPEG dimensions {fw}x{fh} exceed the decoder pixel "
                    f"cap ({MAX_PIXELS})"
                )
            if nc not in (1, 3) or len(body) < 6 + 3 * nc:
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            if nc == 1:
                # single-component frames: sampling factors are
                # irrelevant (one data unit per MCU, T.81 A.2.2) —
                # normalize so the MCU grid is the 8x8 block grid
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            for cid, hs, vs, tq in comps:
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"bad sampling factors {hs}x{vs}")
            frame = (fh, fw, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG process (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            fh, fw, comps = frame
            if not progressive:
                if ns != len(comps):
                    # a baseline file may legally split components
                    # across several scans (non-interleaved); decoding
                    # only the first would silently return Y-only
                    # pixels — refuse into per-row error capture
                    raise NotImplementedError(
                        f"non-interleaved baseline JPEG ({ns} of "
                        f"{len(comps)} components in scan) not supported"
                    )
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError("bad sequential scan parameters")
            else:
                if ss == 0 and se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                if ss > 0 and (ns != 1 or se < ss or se > 63):
                    raise ValueError("bad progressive AC scan parameters")
                if ss > 0 and ah == 0 and al > 13:
                    raise ValueError("bad successive approximation")
            known = {c[0] for c in comps}
            for cs, td, ta in scan:
                if cs not in known:
                    raise ValueError(f"SOS references unknown component {cs}")
                # table presence per scan kind: sequential needs both;
                # progressive DC-first needs DC only; DC-refine needs
                # neither; AC scans need AC only
                needs_dc = (not progressive) or (ss == 0 and ah == 0)
                needs_ac = (not progressive) or ss > 0
                if needs_dc and (0, td) not in htabs:
                    raise ValueError("SOS references missing DC table")
                if needs_ac and (1, ta) not in htabs:
                    raise ValueError("SOS references missing AC table")
            for cid, hs, vs, tq in comps:
                if tq not in qtabs:
                    raise ValueError(f"missing quantization table {tq}")
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-fw // (8 * hmax))
            mcus_y = -(-fh // (8 * vmax))
            geo = (hmax, vmax)
            by_id = {c[0]: c for c in comps}
            for cid, hs, vs, tq in comps:
                if cid not in grids:
                    grids[cid] = np.zeros(
                        (mcus_y * vs, mcus_x * hs, 64), dtype=np.float64
                    )
            reader = _BitReader(data, pos + seglen)
            saw_scan = True
            if not progressive:
                # sequential: interleaved DC+AC per block
                preds = {cs: 0 for cs, _, _ in scan}
                mcu_index = 0
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        if (
                            restart_interval
                            and mcu_index
                            and mcu_index % restart_interval == 0
                        ):
                            reader.restart()
                            preds = {cs: 0 for cs, _, _ in scan}
                        mcu_index += 1
                        for cs, td, ta in scan:
                            cid, hs, vs, tq = by_id[cs]
                            dct = htabs[(0, td)]
                            act = htabs[(1, ta)]
                            for by in range(vs):
                                for bx in range(hs):
                                    blk = np.zeros(64)
                                    s = reader.huff(dct)
                                    diff = (
                                        _extend(reader.bits(s), s) if s else 0
                                    )
                                    preds[cs] += diff
                                    blk[0] = preds[cs]
                                    k = 1
                                    while k < 64:
                                        rs = reader.huff(act)
                                        r, size = rs >> 4, rs & 0x0F
                                        if size == 0:
                                            if r == 15:
                                                k += 16
                                                continue
                                            break  # EOB
                                        k += r
                                        if k > 63:
                                            raise ValueError("AC run overflow")
                                        blk[k] = _extend(
                                            reader.bits(size), size
                                        )
                                        k += 1
                                    grids[cs][my * vs + by, mx * hs + bx] = blk
            elif ss == 0:
                _decode_dc_scan(
                    reader, scan, by_id, grids, htabs, mcus_x, mcus_y,
                    hmax, vmax, fw, fh, ah, al, restart_interval,
                )
            else:
                cs, td, ta = scan[0]
                cid, hs, vs, tq = by_id[cs]
                # the component's TRUE block grid (not MCU-padded)
                bw_c, bh_c = _comp_block_dims(fw, fh, hs, vs, hmax, vmax)
                _decode_ac_scan(
                    reader, cs, by_id[cs], grids, htabs[(1, ta)],
                    ss, se, ah, al, bw_c, bh_c, restart_interval,
                )
            # skip past this scan's entropy data to the next marker
            pos = _next_marker(data, max(reader.pos, pos + seglen))
            continue
        pos += seglen
    if not saw_scan or frame is None:
        raise ValueError("no scan data found")
    # dequant + IDCT, vectorized per component
    fh, fw, comps = frame
    hmax, vmax = geo
    planes = {}
    for cid, hs, vs, tq in comps:
        g = grids[cid]
        bh, bw = g.shape[:2]
        coeff = np.zeros((bh * bw, 64))
        coeff[:, ZIGZAG] = g.reshape(-1, 64)
        coeff = coeff.reshape(-1, 8, 8) * qtabs[tq]
        blocks = np.einsum("ji,njk,kl->nil", _A, coeff, _A)
        plane = (
            blocks.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution by sample replication
        plane = np.repeat(
            np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
        )
        planes[cid] = plane[:fh, :fw] + 128.0
    if len(comps) == 1:
        y = np.clip(np.round(planes[comps[0][0]]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    ycc = np.stack([planes[cid] for cid, _, _, _ in comps], axis=-1)
    return ycbcr_to_rgb(ycc)


def jpeg_size(data: bytes) -> tuple[int, int]:
    """(width, height) from the SOF header without a full decode."""
    pos = 2
    n = len(data)
    while pos < n - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xC0, 0xC1, 0xC2):
            _, h, w = struct.unpack(">BHH", data[pos + 4 : pos + 9])
            return int(w), int(h)
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        pos += 2 + seglen
    raise ValueError("no SOF marker")


def jpeg_quant_tables(data: bytes) -> dict[int, np.ndarray]:
    """All DQT tables (id → 8x8 natural-order array) from a marker
    walk, stopping at SOS — no entropy-coded data is touched."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    n = len(data)
    qtabs: dict[int, np.ndarray] = {}
    while pos < n - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xDA, 0xD9):  # SOS / EOI: tables are all read
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if marker == 0xDB:
            body = data[pos + 4 : pos + 2 + seglen]
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                width = 128 if pq else 64
                raw = body[p : p + width]
                if len(raw) < width:
                    raise ValueError("truncated DQT segment")
                tab = np.frombuffer(
                    raw, dtype=">u2" if pq else np.uint8
                ).astype(np.float64)
                p += width
                q = np.zeros(64)
                q[ZIGZAG] = tab
                qtabs[tq] = q.reshape(8, 8)
        pos += 2 + seglen
    if not qtabs:
        raise ValueError("no DQT segment")
    return qtabs


def estimate_jpeg_quality(data: bytes) -> int:
    """Estimate the libjpeg-style quality setting (1..100) from the
    stream's quantization tables, the standard inverse of the Annex-K
    x quality-scaling construction encoders share: score every
    candidate quality's scaled Annex-K tables against the stream's
    (luma, and chroma when present) by summed absolute difference and
    return the best (ties → higher quality).  Exact for streams this
    module's encoder produced; nearest-fit for foreign tables."""
    qtabs = jpeg_quant_tables(data)
    if 0 not in qtabs:
        raise ValueError("no luma quantization table")
    best_q, best_err = 1, float("inf")
    for q in range(1, 101):
        err = np.abs(_quality_scale(Q_LUMA, q) - qtabs[0]).sum()
        if 1 in qtabs:
            err += np.abs(_quality_scale(Q_CHROMA, q) - qtabs[1]).sum()
        if err <= best_err:  # <= : prefer the higher quality on ties
            best_q, best_err = q, err
    return best_q

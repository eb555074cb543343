"""Full-surface PNG decode (sources/png.py): hand-built streams for
every color type × bit depth combination the encoder never emits —
palette (PLTE) at 1/2/4/8 bits with and without tRNS alpha,
sub-byte and 16-bit grayscale, 16-bit RGB/RGBA (MSB reduction),
grayscale+alpha expansion, the single-transparent-color tRNS form,
Adam7 interlacing (per-pass filtering), filter coverage inside
passes, and reject paths.  Every expected array is computed
independently of the decoder from the PNG 1.2 spec rules."""

import struct
import zlib

import numpy as np
import pytest

from scrapelect_spark.sources.png import decode_png, encode_png

SIG = b"\x89PNG\r\n\x1a\n"


def chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def build(w, h, depth, color, scanlines, extra=b"", interlace=0):
    """Assemble a PNG from pre-filtered scanline bytes."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    idat = zlib.compress(scanlines)
    return (
        SIG + chunk(b"IHDR", ihdr) + extra + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def pack_bits(vals, depth):
    """Pack per-pixel values into one scanline's bytes, MSB-first."""
    bits = []
    for v in vals:
        bits.extend((v >> (depth - 1 - i)) & 1 for i in range(depth))
    while len(bits) % 8:
        bits.append(0)
    return bytes(
        int("".join(map(str, bits[i : i + 8])), 2)
        for i in range(0, len(bits), 8)
    )


# --- palette ----------------------------------------------------------


def test_palette_8bit():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    rows = b"\x00" + bytes([0, 1, 2, 3]) + b"\x00" + bytes([3, 2, 1, 0])
    png = build(4, 2, 8, 3, rows, extra=chunk(b"PLTE", plte))
    got = decode_png(png)
    exp = np.array(
        [
            [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]],
            [[7, 8, 9], [0, 0, 255], [0, 255, 0], [255, 0, 0]],
        ],
        np.uint8,
    )
    assert np.array_equal(got, exp)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_palette_subbyte(depth):
    n = 1 << depth
    plte = bytes(v for i in range(n) for v in (i * 17 % 256, i, 255 - i))
    w = 5
    vals0 = [i % n for i in range(w)]
    vals1 = [(i * 3) % n for i in range(w)]
    rows = (
        b"\x00" + pack_bits(vals0, depth) + b"\x00" + pack_bits(vals1, depth)
    )
    png = build(w, 2, depth, 3, rows, extra=chunk(b"PLTE", plte))
    got = decode_png(png)
    pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
    exp = np.stack([pal[vals0], pal[vals1]])
    assert np.array_equal(got, exp)


def test_palette_trns_alpha():
    plte = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])
    trns = bytes([255, 0])  # entry 1 fully transparent, entry 2 → 255
    rows = b"\x00" + bytes([0, 1, 2])
    png = build(
        3, 1, 8, 3, rows,
        extra=chunk(b"PLTE", plte) + chunk(b"tRNS", trns),
    )
    got = decode_png(png)
    exp = np.array(
        [[[10, 20, 30, 255], [40, 50, 60, 0], [70, 80, 90, 255]]], np.uint8
    )
    assert np.array_equal(got, exp)


def test_palette_index_out_of_range_rejected():
    plte = bytes([1, 2, 3])  # one entry
    rows = b"\x00" + bytes([1])
    png = build(1, 1, 8, 3, rows, extra=chunk(b"PLTE", plte))
    with pytest.raises(ValueError, match="index out of range"):
        decode_png(png)


def test_palette_without_plte_rejected():
    png = build(1, 1, 8, 3, b"\x00\x00")
    with pytest.raises(ValueError, match="without PLTE"):
        decode_png(png)


# --- grayscale depths -------------------------------------------------


def test_gray_1bit_scales_to_full_range():
    # 1-bit: 0 → 0, 1 → 255
    vals = [1, 0, 1, 1, 0, 0, 1, 0, 1]  # 9 px: crosses a byte boundary
    rows = b"\x00" + pack_bits(vals, 1)
    got = decode_png(build(9, 1, 1, 0, rows))
    assert got.shape == (1, 9, 1)
    assert list(got[0, :, 0]) == [255 * v for v in vals]


@pytest.mark.parametrize("depth", [2, 4])
def test_gray_subbyte_scaling(depth):
    n = 1 << depth
    vals = list(range(n))
    rows = b"\x00" + pack_bits(vals, depth)
    got = decode_png(build(n, 1, depth, 0, rows))
    exp = [v * 255 // (n - 1) for v in vals]
    assert list(got[0, :, 0]) == exp


def test_gray_16bit_takes_msb():
    samples = [0xABCD, 0x0102, 0xFFFE, 0x8000]
    rows = b"\x00" + struct.pack(">4H", *samples)
    got = decode_png(build(4, 1, 16, 0, rows))
    assert list(got[0, :, 0]) == [0xAB, 0x01, 0xFF, 0x80]


def test_rgb_16bit():
    px = [(0x1122, 0x3344, 0x5566), (0xFF00, 0x00FF, 0x8081)]
    rows = b"\x00" + b"".join(struct.pack(">3H", *p) for p in px)
    got = decode_png(build(2, 1, 16, 2, rows))
    exp = np.array([[[0x11, 0x33, 0x55], [0xFF, 0x00, 0x80]]], np.uint8)
    assert np.array_equal(got, exp)


def test_rgba_16bit_with_sub_filter():
    # two rows; second row uses Sub filter with bpp=8 (4ch × 2 bytes)
    row0 = struct.pack(">8H", 10, 20, 30, 0xFFFF, 1000, 2000, 3000, 0x8000)
    base = np.frombuffer(row0, np.uint8)
    raw1 = np.arange(16, dtype=np.uint8) * 3 + 1
    # Sub filtering: filt[x] = raw[x] - raw[x-bpp]
    filt1 = raw1.copy()
    filt1[8:] = (raw1[8:].astype(int) - raw1[:8].astype(int)) % 256
    rows = b"\x00" + row0 + b"\x01" + filt1.tobytes()
    got = decode_png(build(2, 2, 16, 6, rows))
    exp0 = base.reshape(2, 8)[:, 0::2]
    exp1 = raw1.reshape(2, 8)[:, 0::2]
    assert np.array_equal(got[0], exp0)
    assert np.array_equal(got[1], exp1)


# --- grayscale + alpha ------------------------------------------------


def test_gray_alpha_expands_to_rgba():
    rows = b"\x00" + bytes([100, 255, 200, 0])
    got = decode_png(build(2, 1, 8, 4, rows))
    exp = np.array(
        [[[100, 100, 100, 255], [200, 200, 200, 0]]], np.uint8
    )
    assert np.array_equal(got, exp)


def test_gray_alpha_16bit():
    rows = b"\x00" + struct.pack(">4H", 0xAA00, 0xFFFF, 0x1234, 0x0000)
    got = decode_png(build(2, 1, 16, 4, rows))
    exp = np.array([[[0xAA] * 3 + [0xFF], [0x12] * 3 + [0x00]]], np.uint8)
    assert np.array_equal(got, exp)


# --- tRNS transparent color -------------------------------------------


def test_trns_gray_8bit():
    rows = b"\x00" + bytes([5, 9, 5])
    png = build(3, 1, 8, 0, rows, extra=chunk(b"tRNS", struct.pack(">H", 5)))
    got = decode_png(png)
    exp = np.array(
        [[[5, 5, 5, 0], [9, 9, 9, 255], [5, 5, 5, 0]]], np.uint8
    )
    assert np.array_equal(got, exp)


def test_trns_rgb_16bit_msb_match():
    # key matches on the 8-bit reduction of the 16-bit samples
    key = (0x1100, 0x2200, 0x3300)
    px = [key, (0x1101, 0x2202, 0x3303), (0x4400, 0x5500, 0x6600)]
    rows = b"\x00" + b"".join(struct.pack(">3H", *p) for p in px)
    png = build(
        3, 1, 16, 2, rows, extra=chunk(b"tRNS", struct.pack(">3H", *key))
    )
    got = decode_png(png)
    # pixel 2 reduces to the same MSBs as the key → also transparent
    assert list(got[0, :, 3]) == [0, 0, 255]
    assert np.array_equal(got[0, 2, :3], [0x44, 0x55, 0x66])


def test_trns_gray_1bit():
    vals = [1, 0, 1]
    rows = b"\x00" + pack_bits(vals, 1)
    png = build(3, 1, 1, 0, rows, extra=chunk(b"tRNS", struct.pack(">H", 1)))
    got = decode_png(png)
    assert list(got[0, :, 3]) == [0, 255, 0]
    assert list(got[0, :, 0]) == [255, 0, 255]


# --- Adam7 interlacing -------------------------------------------------


def adam7_scanlines(img, depth=8):
    """Split an HxWxC image into Adam7 pass scanlines (filter 0)."""
    passes = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )
    out = b""
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            out += b"\x00" + row.tobytes()
    return out


@pytest.mark.parametrize("shape", [(8, 8), (9, 13), (3, 5), (1, 1), (2, 2)])
def test_adam7_rgb_matches_sequential(shape):
    h, w = shape
    rng = np.random.default_rng(hash(shape) % 2**32)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    png = build(w, h, 8, 2, adam7_scanlines(img), interlace=1)
    assert np.array_equal(decode_png(png), img)


def test_adam7_gray_and_rgba():
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (10, 11, 1), dtype=np.uint8)
    png = build(11, 10, 8, 0, adam7_scanlines(gray), interlace=1)
    assert np.array_equal(decode_png(png), gray)
    rgba = rng.integers(0, 256, (6, 7, 4), dtype=np.uint8)
    png = build(7, 6, 8, 6, adam7_scanlines(rgba), interlace=1)
    assert np.array_equal(decode_png(png), rgba)


def test_adam7_palette_subbyte():
    # 2-bit palette, 9x9: pass rows pack bits independently per pass
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 4, (9, 9), dtype=np.uint8)
    plte = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    passes = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )
    scan = b""
    for x0, y0, dx, dy in passes:
        sub = idx[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            scan += b"\x00" + pack_bits(list(row), 2)
    png = build(9, 9, 2, 3, scan, extra=chunk(b"PLTE", plte), interlace=1)
    pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
    assert np.array_equal(decode_png(png), pal[idx])


def test_adam7_with_per_pass_filters():
    """Each pass is an independent sub-image: an Up filter on the first
    row of a LATER pass must reference that pass's own (zero) prior
    row, not the previous pass's last scanline."""
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    passes = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )
    scan = b""
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx].reshape(-1, ((8 - x0 + dx - 1) // dx) * 3)
        prev = np.zeros(sub.shape[1], np.uint8)
        for row in sub:
            scan += b"\x02" + ((row.astype(int) - prev.astype(int)) % 256).astype(np.uint8).tobytes()
            prev = row
    png = build(8, 8, 8, 2, scan, interlace=1)
    assert np.array_equal(decode_png(png), img)


# --- reject paths and roundtrip sanity ---------------------------------


def test_encode_decode_still_roundtrips():
    rng = np.random.default_rng(3)
    for shape in ((5, 7), (5, 7, 3), (5, 7, 4)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        got = decode_png(encode_png(img))
        assert np.array_equal(got.reshape(shape), img)


@pytest.mark.parametrize(
    "depth,color",
    [(16, 3), (2, 2), (4, 6), (1, 4), (3, 0), (8, 5)],
)
def test_illegal_depth_color_combos_rejected(depth, color):
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(build(1, 1, depth, color, b"\x00\x00"))


def test_truncated_idat_rejected():
    png = build(4, 4, 8, 2, b"\x00" + bytes(12))  # 1 of 4 rows
    with pytest.raises(ValueError, match="truncated"):
        decode_png(png)


def test_zero_dimensions_rejected():
    with pytest.raises(ValueError, match="bad dimensions"):
        decode_png(build(0, 1, 8, 2, b""))


def test_mutation_fuzz_never_hangs():
    img = np.arange(6 * 6 * 3, dtype=np.uint8).reshape(6, 6, 3)
    data = bytearray(encode_png(img))
    rng = np.random.default_rng(13)
    for _ in range(300):
        mut = bytearray(data)
        for _ in range(rng.integers(1, 4)):
            mut[rng.integers(8, len(mut))] = rng.integers(0, 256)
        try:
            out = decode_png(bytes(mut))
            assert out.ndim == 3
        except (ValueError, zlib.error, struct.error):
            pass

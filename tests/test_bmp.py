"""BMP codec tests (sources/bmp.py).  Encoder covers 24-bit BI_RGB;
palettized 1/4/8-bit, 32-bit, top-down, and RLE8 decode paths are
proven with hand-built files whose expected pixels are computed
independently."""

import struct

import numpy as np
import pytest

from scrapelect_spark.sources.bmp import decode_bmp, encode_bmp

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("shape", [(7, 5), (16, 16), (33, 31), (1, 1), (10, 3)])
def test_roundtrip_24bit(shape):
    img = RNG.integers(0, 256, (*shape, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_gray_input_expands():
    g = RNG.integers(0, 256, (9, 9), dtype=np.uint8)
    out = decode_bmp(encode_bmp(g))
    assert np.array_equal(out, g[:, :, None].repeat(3, axis=2))


def _build(w, h, bpp, pixel_rows, palette=None, comp=0, top_down=False):
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp, comp,
        len(pixel_rows), 0, 0, len(palette) if palette is not None else 0, 0,
    )
    pal = b""
    if palette is not None:
        pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    offset = 14 + 40 + len(pal)
    head = struct.pack("<2sIHHI", b"BM", offset + len(pixel_rows), 0, 0, offset)
    return head + dib + pal + pixel_rows


def test_8bit_palette():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)  # 2 rows, w=3
    stride = 4  # 3 bytes padded to 4
    rows = b"".join(bytes(r) + b"\x00" for r in idx[::-1])  # bottom-up
    out = decode_bmp(_build(3, 2, 8, rows, palette=pal))
    expect = np.array(pal, dtype=np.uint8)[idx]
    assert out.shape == (2, 3, 3) and np.array_equal(out, expect)
    del stride


def test_4bit_and_1bit_palette():
    pal4 = [(i * 16, 0, 255 - i * 16) for i in range(16)]
    # w=3, 4bpp: each row = 2 bytes data (3 nibbles) padded to 4
    rows = bytes([0x12, 0x30, 0, 0]) + bytes([0xFA, 0xB0, 0, 0])
    out = decode_bmp(_build(3, 2, 4, rows, palette=pal4))
    p = np.array(pal4, dtype=np.uint8)
    assert np.array_equal(out[1], p[[1, 2, 3]])  # bottom row came first
    assert np.array_equal(out[0], p[[15, 10, 11]])

    pal1 = [(0, 0, 0), (255, 255, 255)]
    rows1 = bytes([0b10100000, 0, 0, 0])  # one row, w=3 → bits 1,0,1
    out1 = decode_bmp(_build(3, 1, 1, rows1, palette=pal1))
    assert np.array_equal(
        out1[0], np.array([[255] * 3, [0] * 3, [255] * 3], dtype=np.uint8)
    )


def test_32bit_and_topdown():
    # 1x2, 32bpp BGRX, top-down: first stored row IS the top row
    rows = bytes([10, 20, 30, 0, 40, 50, 60, 0])
    out = decode_bmp(_build(2, 1, 32, rows, top_down=True))
    assert np.array_equal(out[0, 0], [30, 20, 10])
    assert np.array_equal(out[0, 1], [60, 50, 40])


def test_rle8():
    pal = [(i, i, i) for i in range(256)]
    # 4x2: row A = 3x color 7 then 1x color 9; row B = absolute [1,2,3,4]
    rle = bytes(
        [3, 7, 1, 9, 0, 0]  # run 3x7, run 1x9, EOL
        + [0, 4, 1, 2, 3, 4]  # absolute 4 pixels (even count: no pad)
        + [0, 1]  # end of bitmap
    )
    out = decode_bmp(_build(4, 2, 8, rle, palette=pal, comp=1))
    p = np.array(pal, dtype=np.uint8)
    assert np.array_equal(out[1], p[[7, 7, 7, 9]])  # first stored row = bottom
    assert np.array_equal(out[0], p[[1, 2, 3, 4]])


def test_rle8_delta_skips():
    pal = [(i, 0, 0) for i in range(256)]
    # delta (2,1): skip 2 right, 1 row up from bottom-left, then run
    rle = bytes([0, 2, 2, 1, 2, 5, 0, 1])
    out = decode_bmp(_build(4, 2, 8, rle, palette=pal, comp=1))
    p = np.array(pal, dtype=np.uint8)
    assert np.array_equal(out[0], p[[0, 0, 5, 5]])  # top row got the run
    assert np.array_equal(out[1], p[[0, 0, 0, 0]])


def test_rle4():
    pal = [(i * 16, 255 - i * 16, i) for i in range(16)]
    p = np.array(pal, dtype=np.uint8)
    # 6x2: row A = run of 5 alternating (3,8) + run 1x2; row B = absolute
    rle = bytes(
        [5, 0x38, 1, 0x20, 0, 0]  # run 3,8,3,8,3 then 2; EOL
        + [0, 5, 0x12, 0x34, 0x50, 0x00, 1, 0x90, 0, 1]
        # absolute 5 nibbles 1,2,3,4,5 (3 bytes + 1 pad), run 1x9, EOB
    )
    out = decode_bmp(_build(6, 2, 4, rle, palette=pal, comp=2))
    assert np.array_equal(out[1], p[[3, 8, 3, 8, 3, 2]])  # bottom first
    assert np.array_equal(out[0], p[[1, 2, 3, 4, 5, 9]])


def test_rle4_delta_skips():
    pal = [(i, 0, 0) for i in range(16)]
    rle = bytes([0, 2, 2, 1, 2, 0x57, 0, 1])  # delta (2,1), run 5,7
    out = decode_bmp(_build(4, 2, 4, rle, palette=pal, comp=2))
    p = np.array(pal, dtype=np.uint8)
    assert np.array_equal(out[0], p[[0, 0, 5, 7]])
    assert np.array_equal(out[1], p[[0, 0, 0, 0]])


def _build_bf(w, h, bpp, pixel_rows, masks):
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 3, len(pixel_rows), 0, 0, 0, 0
    )
    mask_bytes = struct.pack("<III", *masks)
    offset = 14 + 40 + 12
    head = struct.pack("<2sIHHI", b"BM", offset + len(pixel_rows), 0, 0, offset)
    return head + dib + mask_bytes + pixel_rows


def test_bitfields_565():
    # 2x1, RGB565: (31,63,31)=white-ish max; (16,32,8)
    v0 = (31 << 11) | (63 << 5) | 31
    v1 = (16 << 11) | (32 << 5) | 8
    rows = struct.pack("<HH", v0, v1)
    out = decode_bmp(_build_bf(2, 1, 16, rows, (0xF800, 0x07E0, 0x001F)))
    assert np.array_equal(out[0, 0], [255, 255, 255])
    # round-to-nearest scaling: (c*255 + max//2) // max
    assert np.array_equal(
        out[0, 1],
        [(16 * 255 + 15) // 31, (32 * 255 + 31) // 63, (8 * 255 + 15) // 31],
    )


def test_bitfields_8888_lossless():
    img = RNG.integers(0, 256, (3, 5, 3), dtype=np.uint8)
    rows = b""
    stride_pad = b""  # w*4 already dword-aligned
    for r in img[::-1]:  # bottom-up
        rows += b"".join(
            struct.pack("<I", (c[0] << 16) | (c[1] << 8) | c[2]) for c in r
        )
    out = decode_bmp(
        _build_bf(5, 3, 32, rows + stride_pad, (0xFF0000, 0x00FF00, 0x0000FF))
    )
    assert np.array_equal(out, img)


def test_16bpp_rgb_defaults_to_555():
    v = (10 << 10) | (20 << 5) | 30
    rows = struct.pack("<H", v) + b"\x00\x00"  # pad to dword
    out = decode_bmp(_build(1, 1, 16, rows))
    assert np.array_equal(
        out[0, 0],
        [(10 * 255 + 15) // 31, (20 * 255 + 15) // 31, (30 * 255 + 15) // 31],
    )


def test_bitfields_noncontiguous_mask_rejected():
    rows = struct.pack("<HH", 0, 0)
    with pytest.raises(ValueError, match="non-contiguous"):
        decode_bmp(_build_bf(2, 1, 16, rows, (0xF0F0, 0x0F00, 0x000F)))


@pytest.mark.parametrize("mutilate,msg", [
    (lambda b: b"XX" + b[2:], "not a BMP"),
    (lambda b: b[:-8], "truncated BMP pixel"),
    # compression byte @30 → BITFIELDS, but the image is 24bpp
    (lambda b: b[:30] + b"\x03" + b[31:], "BITFIELDS requires 16/32"),
])
def test_errors(mutilate, msg):
    img = RNG.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    blob = encode_bmp(img)
    with pytest.raises(ValueError, match=msg):
        decode_bmp(mutilate(blob))


def test_oversized_rejected():
    dib = struct.pack("<IiiHHIIiiII", 40, 1 << 14, 1 << 14, 1, 24, 0, 0, 0, 0, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    with pytest.raises(ValueError, match="dimensions"):
        decode_bmp(head + dib)


def test_mutation_fuzz():
    img = RNG.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    blob = encode_bmp(img)
    rng = np.random.default_rng(4)
    for _ in range(300):
        b = bytearray(blob)
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 256))
        try:
            decode_bmp(bytes(b))
        except (ValueError, struct.error):
            pass

"""Netpbm / TGA / ICO codecs (sources/netpbm.py, tga.py, ico.py):
foreign-feature decode proven with hand-built streams, matching the
GIF/BMP/TIFF test convention.  The Spark-side gate
(image_foreign_formats) parity runs in tests/test_oracle_parity.py."""

import struct

import numpy as np
import pytest

from scrapelect_spark.sources.netpbm import decode_netpbm, encode_netpbm
from scrapelect_spark.sources.tga import decode_tga, encode_tga
from scrapelect_spark.sources.ico import decode_ico, encode_ico, ico_entries


# ---------------------------------------------------------------- netpbm

def test_p1_ascii_packed_digits_and_comments():
    # P1 rows may pack digits with no separators; 1 = black
    data = b"P1\n# comment\n4 2\n0110\n# mid raster\n1001\n"
    out = decode_netpbm(data)
    want = np.where(
        np.array([[0, 1, 1, 0], [1, 0, 0, 1]]) == 1, 0, 255
    ).astype(np.uint8)
    assert np.array_equal(out, want)


def test_p2_ascii_gray_with_maxval_scaling():
    data = b"P2\n3 1\n15\n0 7 15\n"
    out = decode_netpbm(data)
    # round(v*255/15): 0, 119, 255
    assert out.tolist() == [[0, 119, 255]]


def test_p3_ascii_rgb():
    data = b"P3 2 1 255  1 2 3  250 251 252\n"
    out = decode_netpbm(data)
    assert out.tolist() == [[[1, 2, 3], [250, 251, 252]]]


def test_p4_packed_bits_msb_first():
    # 10 columns → 2 bytes per row, MSB first
    row0 = 0b10110000_01000000
    data = b"P4\n10 1\n" + bytes([row0 >> 8, row0 & 0xFF])
    out = decode_netpbm(data)
    bits = [1, 0, 1, 1, 0, 0, 0, 0, 0, 1]
    assert out.tolist() == [[0 if b else 255 for b in bits]]


def test_p5_16bit_big_endian():
    data = b"P5\n2 1\n65535\n" + struct.pack(">HH", 0, 65535)
    assert decode_netpbm(data).tolist() == [[0, 255]]


def test_p6_binary_rgb_roundtrip_and_single_ws():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    blob = encode_netpbm(img)
    assert blob.startswith(b"P6\n3 2\n255\n")
    assert np.array_equal(decode_netpbm(blob), img)


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"P7\n1 1\n255\nx",
        b"P5\n0 4\n255\n",
        b"P5\n2 2\n0\n....",
        b"P5\n2 2\n255\nxyz",  # truncated raster
        b"P2\n2 1\n15\n1 99\n",  # sample > maxval
    ],
)
def test_netpbm_rejects(bad):
    with pytest.raises(ValueError):
        decode_netpbm(bad)


# ------------------------------------------------------------------- tga

def _tga_header(img_type, w, h, bpp, desc, id_len=0, cmap=(0, 0, 0, 0)):
    cmap_type, first, length, entry_bpp = cmap
    return struct.pack(
        "<BBBHHBHHHHBB",
        id_len,
        cmap_type,
        img_type,
        first,
        length,
        entry_bpp,
        0,
        0,
        w,
        h,
        bpp,
        desc,
    )


def test_tga_uncompressed_24bit_bottom_up():
    # 2x2 BGR, bottom-up (desc bit5 clear): file row 0 is IMAGE row 1
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    data = _tga_header(2, 2, 2, 24, 0x00) + px
    out = decode_tga(data)
    assert out.tolist() == [
        [[255, 0, 0], [30, 20, 10]],  # image top = file bottom row
        [[0, 0, 255], [0, 255, 0]],
    ]


def test_tga_right_to_left_order():
    px = bytes([1, 1, 1, 2, 2, 2])
    data = _tga_header(2, 2, 1, 24, 0x30) + px  # top-down + R-to-L
    out = decode_tga(data)
    assert out.tolist() == [[[2, 2, 2], [1, 1, 1]]]


def test_tga_gray_type3():
    data = _tga_header(3, 3, 1, 8, 0x20) + bytes([0, 128, 255])
    assert decode_tga(data).tolist() == [[0, 128, 255]]


def test_tga_16bit_555_scaling():
    # value = A RRRRR GGGGG BBBBB; r=31 g=0 b=16
    val = (31 << 10) | (0 << 5) | 16
    data = _tga_header(2, 1, 1, 16, 0x20) + struct.pack("<H", val)
    out = decode_tga(data)
    assert out.tolist() == [[[255, 0, 132]]]  # round(16*255/31)=132


def test_tga_palette_8bit():
    pal = bytes([10, 20, 30, 40, 50, 60])  # 2 BGR entries
    data = (
        _tga_header(1, 2, 1, 8, 0x20, cmap=(1, 0, 2, 24))
        + pal
        + bytes([1, 0])
    )
    out = decode_tga(data)
    assert out.tolist() == [[[60, 50, 40], [30, 20, 10]]]


def test_tga_rle_runs_and_literals():
    img = np.array(
        [[[5, 5, 5]] * 4 + [[1, 2, 3], [4, 5, 6]]], dtype=np.uint8
    )
    blob = encode_tga(img)
    assert np.array_equal(decode_tga(blob), img)
    # RLE really compressed the flat run
    raw_size = 18 + img.shape[0] * img.shape[1] * 3
    assert len(blob) < raw_size


def test_tga_id_field_skipped():
    px = bytes([9, 9, 9])
    data = _tga_header(2, 1, 1, 24, 0x20, id_len=4) + b"ABCD" + px
    assert decode_tga(data).tolist() == [[[9, 9, 9]]]


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        _tga_header(7, 1, 1, 24, 0),  # unknown type
        _tga_header(2, 1, 1, 24, 0),  # truncated raster
        _tga_header(10, 2, 2, 24, 0) + b"\x83",  # truncated RLE
        _tga_header(1, 1, 1, 8, 0) + b"\x05",  # mapped w/o color map
    ],
)
def test_tga_rejects(bad):
    with pytest.raises(ValueError):
        decode_tga(bad)


# ------------------------------------------------------------------- ico

def test_ico_roundtrip_alpha():
    rng = np.random.RandomState(1)
    rgba = rng.randint(0, 256, (7, 5, 4)).astype(np.uint8)
    blob = encode_ico(rgba)
    ents = ico_entries(blob)
    assert ents == [
        {"w": 5, "h": 7, "bpp": 32, "size": ents[0]["size"], "offset": 22}
    ]
    assert np.array_equal(decode_ico(blob), rgba)


def test_ico_png_entry():
    from scrapelect_spark.sources.png import encode_png

    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    png = encode_png(img)
    entry = struct.pack("<BBBBHHII", 2, 2, 0, 0, 1, 32, len(png), 22)
    blob = struct.pack("<HHH", 0, 1, 1) + entry + png
    out = decode_ico(blob)
    assert out.shape == (2, 2, 4)
    assert np.array_equal(out[:, :, :3], img)
    assert (out[:, :, 3] == 255).all()


def test_ico_palette_dib_with_and_mask():
    # 2x2, 8-bit palette DIB: palette idx 0 → (10,20,30), idx 1 → white
    w = h = 2
    pal = bytes([30, 20, 10, 0, 255, 255, 255, 0])  # BGRA entries
    # XOR rows bottom-up, stride 4: image rows: top [0,1], bottom [1,0]
    xor = bytes([1, 0, 0, 0]) + bytes([0, 1, 0, 0])
    # AND mask stride 4 bytes (32 bits): transparent at image (0,0)
    and_rows = bytes([0b00000000, 0, 0, 0]) + bytes([0b10000000, 0, 0, 0])
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h * 2, 1, 8, 0, 0, 0, 0, 2, 0
    )
    blob = dib + pal + xor + and_rows
    entry = struct.pack("<BBBBHHII", w, h, 2, 0, 1, 8, len(blob), 22)
    data = struct.pack("<HHH", 0, 1, 1) + entry + blob
    out = decode_ico(data)
    assert out.shape == (2, 2, 4)
    # bottom-up: file row 0 is image row 1; AND bit set → transparent
    assert out[0, 0].tolist() == [10, 20, 30, 0]  # masked transparent
    assert out[0, 1].tolist() == [255, 255, 255, 255]
    assert out[1, 0].tolist() == [255, 255, 255, 255]
    assert out[1, 1].tolist() == [10, 20, 30, 255]


def test_ico_picks_largest_entry():
    a = np.full((2, 2, 4), 7, np.uint8)
    b = np.full((4, 4, 4), 9, np.uint8)
    blob_a = encode_ico(a)[22:]
    blob_b = encode_ico(b)[22:]
    e1 = struct.pack("<BBBBHHII", 2, 2, 0, 0, 1, 32, len(blob_a), 38)
    e2 = struct.pack(
        "<BBBBHHII", 4, 4, 0, 0, 1, 32, len(blob_b), 38 + len(blob_a)
    )
    data = struct.pack("<HHH", 0, 1, 2) + e1 + e2 + blob_a + blob_b
    out = decode_ico(data)
    assert out.shape == (4, 4, 4) and (out == 9).all()


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        struct.pack("<HHH", 1, 1, 1) + b"\x00" * 16,  # reserved != 0
        struct.pack("<HHH", 0, 3, 1) + b"\x00" * 16,  # bad type
        struct.pack("<HHH", 0, 1, 0),  # zero entries
        struct.pack("<HHH", 0, 1, 1)
        + struct.pack("<BBBBHHII", 1, 1, 0, 0, 1, 32, 999, 22),  # past EOF
    ],
)
def test_ico_rejects(bad):
    with pytest.raises(ValueError):
        decode_ico(bad)

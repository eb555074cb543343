"""Baseline TIFF codec tests (sources/tiff.py): header/IFD grammar
(both byte orders, inline vs overflow values, multi-strip layout),
PackBits edge cases (128 no-op, maximal runs), TIFF-variant LZW
(EarlyChange width bumps, ClearCode resets, KwKwK), horizontal
predictor, hand-built foreign features (bilevel both photometric
polarities, palette-color via ColorMap, RGBA alpha compositing),
bounds-check error paths, and mutation fuzz."""

import struct

import numpy as np
import pytest

from scrapelect_spark.sources import tiff as T
from scrapelect_spark.sources.tiff import decode_tiff, encode_tiff, is_tiff

RNG = np.random.default_rng(5)


def rgb(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    img[: h // 2, : w // 2] = 180  # flat region for RLE paths
    return img


# --- roundtrips -------------------------------------------------------


@pytest.mark.parametrize("comp", [1, 32773, 5])
@pytest.mark.parametrize("bo", ["II", "MM"])
def test_rgb_roundtrip(comp, bo):
    img = rgb(23, 31, seed=comp)
    blob = encode_tiff(img, compression=comp, byte_order=bo)
    assert is_tiff(blob)
    assert np.array_equal(decode_tiff(blob), img)


@pytest.mark.parametrize("comp", [1, 32773, 5])
def test_gray_roundtrip(comp):
    g = RNG.integers(0, 256, (17, 19), dtype=np.uint8)
    out = decode_tiff(encode_tiff(g, compression=comp))
    assert np.array_equal(out, np.stack([g, g, g], axis=-1))


def test_multi_strip_roundtrip():
    img = rgb(37, 11, seed=9)
    for comp in (1, 32773, 5):
        blob = encode_tiff(img, compression=comp, rows_per_strip=4)
        assert np.array_equal(decode_tiff(blob), img)


def test_lzw_predictor_roundtrip_and_compression():
    yy, xx = np.mgrid[0:64, 0:64]
    smooth = np.stack(
        [(yy * 2) % 256, (xx * 3) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)
    blob = encode_tiff(smooth, compression=5, predictor=2)
    assert np.array_equal(decode_tiff(blob), smooth)
    assert len(blob) < smooth.size // 4  # really compresses


def test_deterministic():
    img = rgb(12, 12, seed=3)
    assert encode_tiff(img, compression=5) == encode_tiff(
        img, compression=5
    )


def test_single_pixel_and_tall_thin():
    for shape in ((1, 1, 3), (64, 1, 3), (1, 64, 3)):
        img = RNG.integers(0, 256, shape, dtype=np.uint8)
        for comp in (1, 32773, 5):
            assert np.array_equal(
                decode_tiff(encode_tiff(img, compression=comp)), img
            )


# --- PackBits ---------------------------------------------------------


def test_packbits_roundtrip_edge_cases():
    cases = [
        b"",
        b"\x00",
        b"\xaa" * 300,  # > max run
        bytes(range(256)),
        b"abcaaaaaaaabc",
    ]
    for raw in cases:
        enc = T._packbits(raw)
        assert T._unpackbits(enc, len(raw)) == raw


def test_packbits_noop_128_is_skipped():
    # 128 is a no-op per the spec; foreign encoders may emit it
    enc = b"\x80" + b"\x01\xff\xff" + b"\x80"  # run of 256? no: 0x01=2 literals
    # literal of 2 bytes then noop
    assert T._unpackbits(b"\x80\x01\xab\xcd", 2) == b"\xab\xcd"


def test_packbits_truncation_raises():
    with pytest.raises(ValueError):
        T._unpackbits(b"\x05\xaa", 6)  # literal overruns
    with pytest.raises(ValueError):
        T._unpackbits(b"\xfe", 3)  # run with no byte


# --- LZW --------------------------------------------------------------


def test_lzw_roundtrip_various():
    cases = [
        b"",
        b"\x00" * 5000,  # long run → KwKwK codes + width growth
        bytes(RNG.integers(0, 256, 4096, dtype=np.uint8)),
        b"TOBEORNOTTOBEORTOBEORNOT" * 50,
    ]
    for raw in cases:
        enc = T._lzw_encode(raw)
        assert T._lzw_decode(enc, len(raw)) == raw


def test_lzw_table_overflow_reset():
    # enough distinct material to push past 4094 entries → encoder
    # emits ClearCode mid-stream; decoder must reset
    raw = bytes(RNG.integers(0, 256, 20000, dtype=np.uint8))
    enc = T._lzw_encode(raw)
    assert T._lzw_decode(enc, len(raw)) == raw


def test_lzw_truncation_raises():
    enc = T._lzw_encode(b"hello world")
    with pytest.raises(ValueError):
        T._lzw_decode(enc[:2], 11)


# --- hand-built foreign features --------------------------------------


def _build_tiff(bo, entries, payload):
    """Minimal hand TIFF: header + one IFD (+4-byte inline values
    only) + payload blob at offset ``base``."""
    pre = struct.pack(bo + "2sHI",
                      b"II" if bo == "<" else b"MM", 42, 8)
    ifd = struct.pack(bo + "H", len(entries))
    for tag, typ, cnt, val4 in sorted(entries):
        ifd += struct.pack(bo + "HHI", tag, typ, cnt) + val4
    ifd += struct.pack(bo + "I", 0)
    return pre + ifd + payload, len(pre) + len(ifd)


def _inline(bo, typ, *vals):
    fmt = {3: "H", 4: "I"}[typ]
    return struct.pack(bo + str(len(vals)) + fmt, *vals).ljust(4, b"\x00")


@pytest.mark.parametrize("photometric,invert", [(1, False), (0, True)])
def test_bilevel_decode_both_polarities(photometric, invert):
    # 2 rows x 10 cols of 1-bit data, rows byte-padded
    bits = np.array([[1, 0] * 5, [0, 1] * 5], dtype=np.uint8)
    packed = np.packbits(bits, axis=1).tobytes()
    bo = "<"
    body_off = 10 + 12 * 7 + 4 + 4  # computed below via _build_tiff
    entries = [
        (T._T_WIDTH, 3, 1, _inline(bo, 3, 10)),
        (T._T_LENGTH, 3, 1, _inline(bo, 3, 2)),
        (T._T_BITS, 3, 1, _inline(bo, 3, 1)),
        (T._T_PHOTOMETRIC, 3, 1, _inline(bo, 3, photometric)),
        (T._T_SAMPLES, 3, 1, _inline(bo, 3, 1)),
        (T._T_STRIP_COUNTS, 4, 1, _inline(bo, 4, len(packed))),
        (T._T_STRIP_OFFSETS, 4, 1, b"\x00\x00\x00\x00"),
    ]
    blob, base = _build_tiff(bo, entries, packed)
    # patch the strip offset now that base is known
    blob = bytearray(blob)
    idx = blob.index(struct.pack(bo + "HHI", T._T_STRIP_OFFSETS, 4, 1))
    blob[idx + 8:idx + 12] = struct.pack(bo + "I", base)
    out = decode_tiff(bytes(blob))
    expect = (bits * 255).astype(np.uint8)
    if invert:
        expect = 255 - expect
    assert np.array_equal(out, np.stack([expect] * 3, axis=-1))


def test_palette_decode():
    idxs = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    cmap = np.zeros((3, 256), dtype=np.uint16)
    cmap[:, 0] = (65535, 0, 0)       # red
    cmap[:, 1] = (0, 65535, 0)       # green
    cmap[:, 2] = (32896, 32896, 65535)  # halfish blue
    bo = "<"
    cmap_bytes = struct.pack(bo + "768H", *cmap.reshape(-1))
    entries = [
        (T._T_WIDTH, 3, 1, _inline(bo, 3, 2)),
        (T._T_LENGTH, 3, 1, _inline(bo, 3, 2)),
        (T._T_BITS, 3, 1, _inline(bo, 3, 8)),
        (T._T_PHOTOMETRIC, 3, 1, _inline(bo, 3, 3)),
        (T._T_SAMPLES, 3, 1, _inline(bo, 3, 1)),
        (T._T_STRIP_COUNTS, 4, 1, _inline(bo, 4, 4)),
        (T._T_STRIP_OFFSETS, 4, 1, b"\x00\x00\x00\x00"),
        (T._T_COLORMAP, 3, 768, b"\x00\x00\x00\x00"),
    ]
    blob, base = _build_tiff(bo, entries, idxs.tobytes() + cmap_bytes)
    blob = bytearray(blob)
    i = blob.index(struct.pack(bo + "HHI", T._T_STRIP_OFFSETS, 4, 1))
    blob[i + 8:i + 12] = struct.pack(bo + "I", base)
    i = blob.index(struct.pack(bo + "HHI", T._T_COLORMAP, 3, 768))
    blob[i + 8:i + 12] = struct.pack(bo + "I", base + 4)
    out = decode_tiff(bytes(blob))
    assert tuple(out[0, 0]) == (255, 0, 0)
    assert tuple(out[0, 1]) == (0, 255, 0)
    assert tuple(out[1, 0]) == (128, 128, 255)


def test_rgba_composites_over_white():
    h, w = 3, 3
    px = np.zeros((h, w, 4), dtype=np.uint8)
    px[..., :3] = (200, 40, 90)
    px[..., 3] = 255
    px[1, 1, 3] = 0       # transparent → white
    px[2, 2, 3] = 128     # half
    bo = "<"
    entries = [
        (T._T_WIDTH, 3, 1, _inline(bo, 3, w)),
        (T._T_LENGTH, 3, 1, _inline(bo, 3, h)),
        (T._T_BITS, 3, 4, b"\x00\x00\x00\x00"),
        (T._T_PHOTOMETRIC, 3, 1, _inline(bo, 3, 2)),
        (T._T_SAMPLES, 3, 1, _inline(bo, 3, 4)),
        (T._T_EXTRA_SAMPLES, 3, 1, _inline(bo, 3, 2)),
        (T._T_STRIP_COUNTS, 4, 1, _inline(bo, 4, h * w * 4)),
        (T._T_STRIP_OFFSETS, 4, 1, b"\x00\x00\x00\x00"),
    ]
    bits_payload = struct.pack(bo + "4H", 8, 8, 8, 8)
    blob, base = _build_tiff(bo, entries, bits_payload + px.tobytes())
    blob = bytearray(blob)
    i = blob.index(struct.pack(bo + "HHI", T._T_BITS, 3, 4))
    blob[i + 8:i + 12] = struct.pack(bo + "I", base)
    i = blob.index(struct.pack(bo + "HHI", T._T_STRIP_OFFSETS, 4, 1))
    blob[i + 8:i + 12] = struct.pack(bo + "I", base + 8)
    out = decode_tiff(bytes(blob))
    assert tuple(out[0, 0]) == (200, 40, 90)
    assert tuple(out[1, 1]) == (255, 255, 255)
    assert tuple(out[2, 2]) == (227, 147, 172)  # (v*128+255*127+127)//255


# --- error paths ------------------------------------------------------


def test_error_paths():
    img = rgb(8, 8)
    blob = bytearray(encode_tiff(img))
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + bytes(blob[2:]))
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"II\x2b\x00" + bytes(blob[4:]))
    with pytest.raises(ValueError):
        decode_tiff(bytes(blob[:20]))
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(encode_and_patch_short(img, T._T_COMPRESSION, 6))
    with pytest.raises(ValueError, match="planar"):
        decode_tiff(encode_and_patch_short(img, T._T_PLANAR, 2))
    with pytest.raises(ValueError):
        encode_tiff(img, compression=7)
    with pytest.raises(ValueError):
        encode_tiff(img, compression=1, predictor=2)
    with pytest.raises(ValueError):
        encode_tiff(np.zeros((0, 4, 3), np.uint8))


def encode_and_patch_short(img, tag, new_value):
    """Patch a SHORT IFD entry value in an encoded stream (insert the
    tag by rewriting an existing one if absent is not needed here —
    both patched tags exist or are added by re-encode)."""
    bo = "<"
    blob = bytearray(encode_tiff(img))
    (n,) = struct.unpack_from(bo + "H", blob, 8)
    for i in range(n):
        t, typ, cnt = struct.unpack_from(bo + "HHI", blob, 10 + 12 * i)
        if t == tag:
            struct.pack_into(bo + "H", blob, 10 + 12 * i + 8, new_value)
            return bytes(blob)
    # tag absent (e.g. PlanarConfiguration defaults): rewrite the
    # Compression entry's tag id — same 12-byte layout
    for i in range(n):
        t, typ, cnt = struct.unpack_from(bo + "HHI", blob, 10 + 12 * i)
        if t == T._T_COMPRESSION and tag != T._T_COMPRESSION:
            struct.pack_into(bo + "HHIH", blob, 10 + 12 * i,
                             tag, 3, 1, new_value)
            return bytes(blob)
    raise AssertionError("tag not found")


def test_strip_outside_file_raises():
    img = rgb(8, 8)
    blob = bytearray(encode_tiff(img))
    bo = "<"
    (n,) = struct.unpack_from(bo + "H", blob, 8)
    for i in range(n):
        t, typ, cnt = struct.unpack_from(bo + "HHI", blob, 10 + 12 * i)
        if t == T._T_STRIP_OFFSETS and cnt == 1:
            struct.pack_into(bo + "I", blob, 10 + 12 * i + 8,
                             len(blob) - 3)
    with pytest.raises(ValueError):
        decode_tiff(bytes(blob))


def test_mutation_fuzz_never_hangs_or_segfaults():
    img = rgb(12, 16, seed=7)
    for comp in (1, 32773, 5):
        data = bytearray(encode_tiff(img, compression=comp))
        rng = np.random.default_rng(42 + comp)
        for _ in range(150):
            mut = bytearray(data)
            for _ in range(rng.integers(1, 4)):
                mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
            try:
                out = decode_tiff(bytes(mut))
                assert out.ndim == 3
            except (ValueError, IndexError, struct.error):
                pass

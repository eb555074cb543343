"""MPEG-1 intra-only video codec tests (sources/mpeg1.py): VLC table
integrity (prefix-freeness, canonical DC/AC codes), bitstream grammar
(start codes, sequence/picture headers, slice addressing), roundtrip
quality across qscales and dimensions, the ESCAPE coefficient path,
P/B-picture rejection (the declared motion-compensation boundary),
hand-built foreign-feature streams (quantizer update macroblocks,
zero-byte stuffing before start codes, MBA stuffing codes), mutation
fuzz, and frame_sample routing."""

import numpy as np
import pytest

from scrapelect_spark.sources import mpeg1 as M
from scrapelect_spark.sources.mpeg1 import (
    decode_m1v_frames,
    encode_m1v,
    is_m1v,
    mpeg1_meta,
)

RNG = np.random.default_rng(5)


def smooth(h, w, seed=0, shift=0):
    y, x = np.mgrid[0:h, 0:w]
    rng = np.random.default_rng(seed)
    a, b, c = rng.uniform(3, 9, 3)
    r = 128 + 90 * np.sin(x / a + shift)
    g = 128 + 70 * np.cos(y / b - shift / 2)
    bl = 128 + 60 * np.sin((x + y) / c)
    return np.clip(
        np.round(np.stack([r, g, bl], axis=-1)), 0, 255
    ).astype(np.uint8)


def psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _assert_prefix_free(table):
    codes = [format(c, f"0{n}b") for (c, n) in table]
    assert len(set(codes)) == len(codes)
    for a in codes:
        for b in codes:
            assert a == b or not b.startswith(a), (a, b)


# --- table integrity --------------------------------------------------


def test_ac_table_prefix_free_with_eob_and_escape():
    _assert_prefix_free(M._AC_DEC)


def test_mba_table_prefix_free():
    _assert_prefix_free(M._MBA_DEC)


def test_dc_tables_prefix_free():
    _assert_prefix_free(M._DC_LUMA_DEC)
    _assert_prefix_free(M._DC_CHROMA_DEC)


def test_known_codes():
    # spot-check Table B.12/B.13/B.14 anchor codes
    assert M._DC_LUMA[0] == (0b100, 3)
    assert M._DC_LUMA[1] == (0b00, 2)
    assert M._DC_CHROMA[0] == (0b00, 2)
    assert M._AC_TABLE[(0, 1)] == (0b11, 2)  # dct_coeff_next
    assert M._AC_TABLE[(1, 1)] == (0b011, 3)
    assert M._EOB == (0b10, 2)
    assert M._ESCAPE == (0b000001, 6)


# --- headers / sniff --------------------------------------------------


def test_sequence_header_and_meta():
    frames = [smooth(18, 27, seed=1)]
    data = encode_m1v(frames, fps=29.5, qscale=3)
    assert is_m1v(data)
    w, h, rate, n = mpeg1_meta(data)
    assert (w, h, n) == (27, 18, 1)
    assert rate == pytest.approx(29.97)  # nearest picture_rate code
    assert data.endswith(b"\x00\x00\x01\xb7")  # sequence_end_code


def test_not_m1v_sniffs():
    assert not is_m1v(b"RIFF....AVI ")
    assert not is_m1v(b"\x00\x00\x01\x00rest")
    with pytest.raises(ValueError):
        list(decode_m1v_frames(b"\x00\x00\x01\xb7"))


# --- roundtrip quality ------------------------------------------------


@pytest.mark.parametrize("qscale,floor", [(1, 33.0), (2, 33.0), (4, 31.0)])
def test_roundtrip_quality_by_qscale(qscale, floor):
    f = smooth(32, 48, seed=2)
    data = encode_m1v([f], qscale=qscale)
    (_, dec), = decode_m1v_frames(data)
    assert dec.shape == f.shape
    assert psnr(f, dec) >= floor


@pytest.mark.parametrize("h,w", [(8, 8), (16, 16), (17, 31), (48, 64), (23, 105)])
def test_roundtrip_odd_dimensions_crop(h, w):
    f = smooth(h, w, seed=h * 100 + w)
    (_, dec), = decode_m1v_frames(encode_m1v([f], qscale=2))
    assert dec.shape == (h, w, 3)
    assert psnr(f, dec) >= 31.0


def test_flat_frame_exact():
    f = np.full((16, 32, 3), 77, np.uint8)
    (_, dec), = decode_m1v_frames(encode_m1v([f], qscale=1))
    assert np.array_equal(dec, f)


def test_grayscale_noise_survives_luma_path():
    # pure-luma noise exercises ESCAPE coefficients heavily; 4:2:0
    # cannot lose anything on gray content
    g = RNG.integers(0, 256, (24, 24), dtype=np.uint8)
    f = np.stack([g, g, g], axis=-1)
    (_, dec), = decode_m1v_frames(encode_m1v([f], qscale=1))
    assert psnr(f, dec) >= 40.0


def test_multiframe_sampling_skips_decode():
    frames = [smooth(16, 16, seed=9, shift=i) for i in range(7)]
    data = encode_m1v(frames, qscale=2)
    got = dict(decode_m1v_frames(data, every_n=3))
    assert sorted(got) == [0, 3, 6]
    for i, dec in got.items():
        assert psnr(frames[i], dec) >= 32.0


def test_deterministic_encode():
    f = smooth(16, 24, seed=4)
    assert encode_m1v([f]) == encode_m1v([f])


# --- declared boundary: P/B pictures ----------------------------------


def _patch_picture_types(data: bytes, ptype: int) -> bytes:
    out = bytearray(data)
    i = out.find(b"\x00\x00\x01\x00")
    while i != -1:
        out[i + 5] = (out[i + 5] & 0b11000111) | (ptype << 3)
        i = out.find(b"\x00\x00\x01\x00", i + 4)
    return bytes(out)


@pytest.mark.parametrize("ptype", [2, 3])
def test_sampled_pb_picture_raises(ptype):
    data = _patch_picture_types(encode_m1v([smooth(16, 16)]), ptype)
    with pytest.raises(ValueError, match="motion compensation"):
        list(decode_m1v_frames(data))


def test_skipped_p_pictures_are_not_decoded():
    # pictures 1..5 are P-patched; sampling every 6th only touches the
    # I-pictures — proof that skip really is a start-code scan
    frames = [smooth(16, 16, seed=3, shift=i) for i in range(7)]
    data = bytearray(encode_m1v(frames, qscale=2))
    starts = []
    i = data.find(b"\x00\x00\x01\x00")
    while i != -1:
        starts.append(i)
        i = data.find(b"\x00\x00\x01\x00", i + 4)
    for k in starts[1:6]:
        data[k + 5] = (data[k + 5] & 0b11000111) | (2 << 3)
    got = dict(decode_m1v_frames(bytes(data), every_n=6))
    assert sorted(got) == [0, 6]


# --- foreign-feature streams (hand-built via the module's writer) -----


def test_quantizer_update_macroblock():
    """macroblock_type '01' + new quantizer_scale, which our encoder
    never emits, must decode (foreign-encoder surface)."""
    f = np.full((16, 16, 3), 200, np.uint8)
    ref = encode_m1v([f], qscale=2)
    # rebuild the slice by hand: one MB, type '01', qscale 2
    w = M._BitWriter()
    w.write(31, 5)  # slice quantizer_scale (overridden per-MB)
    w.write(0, 1)
    w.write(1, 1)  # address increment 1
    w.write(0b01, 2)  # intra + quant
    w.write(2, 5)  # new quantizer_scale
    ycc = M.rgb_to_ycbcr(f.astype(np.uint8))
    dcs = {"y": round(ycc[0, 0, 0]), "cb": round(ycc[0, 0, 1]),
           "cr": round(ycc[0, 0, 2])}
    preds = {"y": 128, "cb": 128, "cr": 128}
    for comp in ("y", "y", "y", "y", "cb", "cr"):
        table = M._DC_LUMA if comp == "y" else M._DC_CHROMA
        M._write_dc(w, dcs[comp] - preds[comp], table)
        preds[comp] = dcs[comp]
        w.write(M._EOB[0], M._EOB[1])
    w.byte_align()
    hand = (ref[: ref.find(b"\x00\x00\x01\x01")]
            + b"\x00\x00\x01\x01" + w.bytes() + b"\x00\x00\x01\xb7")
    (_, dec), = decode_m1v_frames(hand)
    assert psnr(f, dec) >= 40.0


def test_zero_stuffing_before_start_codes():
    f = smooth(16, 16, seed=6)
    data = encode_m1v([f], qscale=2)
    # insert zero-byte stuffing before every start code (legal filler)
    stuffed = data.replace(b"\x00\x00\x01", b"\x00\x00\x00\x00\x00\x01")
    (_, dec), = decode_m1v_frames(stuffed)
    assert psnr(f, dec) >= 33.0


def test_mba_stuffing_code_is_skipped():
    f = np.full((16, 16, 3), 150, np.uint8)
    ref = encode_m1v([f], qscale=2)
    head, slice_start = ref.split(b"\x00\x00\x01\x01", 1)
    # strip the trailing sequence_end_code BEFORE bit-copying: the
    # 11-bit stuffing insert would shift it off byte alignment
    assert slice_start.endswith(b"\x00\x00\x01\xb7")
    slice_start = slice_start[:-4]
    r = M._BitReader(slice_start, 0)
    q = r.read(5)
    eb = r.read(1)
    w = M._BitWriter()
    w.write(q, 5)
    w.write(eb, 1)
    w.write(M._MBA_DEC and 0b00000001111, 11)  # macroblock_stuffing
    # copy the remaining slice bits verbatim
    rest_bits = (len(slice_start) - r.pos) * 8 - r.bit
    for _ in range(rest_bits):
        w.write(r.read(1), 1)
    w.byte_align()
    hand = head + b"\x00\x00\x01\x01" + w.bytes()
    if not hand.endswith(b"\x00\x00\x01\xb7"):
        hand += b"\x00\x00\x01\xb7"
    (_, dec), = decode_m1v_frames(hand)
    assert np.array_equal(dec, np.full((16, 16, 3), 150, np.uint8)) or \
        psnr(f, dec) >= 40.0


# --- escape coefficient path ------------------------------------------


def test_escape_levels_roundtrip_through_writer():
    """All escape level magnitudes (1..255 both signs) survive the
    write→read cycle bit-exactly."""
    w = M._BitWriter()
    levels = [lv for lv in range(-255, 256)
              if lv != 0 and (63, abs(lv)) not in M._AC_TABLE]
    for lv in levels:
        M._write_ac(w, 63, lv)
    w.byte_align()
    r = M._BitReader(w.bytes(), 0)
    for lv in levels:
        assert M._read_ac(r) == (63, lv)


def test_ac_vlc_roundtrip_all_table_entries():
    w = M._BitWriter()
    pairs = sorted(M._AC_TABLE)
    for run, level in pairs:
        M._write_ac(w, run, level)
        M._write_ac(w, run, -level)
    w.byte_align()
    r = M._BitReader(w.bytes(), 0)
    for run, level in pairs:
        assert M._read_ac(r) == (run, level)
        assert M._read_ac(r) == (run, -level)


def test_dc_differential_roundtrip():
    w = M._BitWriter()
    diffs = list(range(-255, 256))
    for d in diffs:
        M._write_dc(w, d, M._DC_LUMA)
    w.byte_align()
    r = M._BitReader(w.bytes(), 0)
    for d in diffs:
        assert M._read_dc(r, M._DC_LUMA_DEC) == d


# --- robustness -------------------------------------------------------


def test_truncated_stream_raises():
    data = encode_m1v([smooth(32, 32, seed=7)], qscale=2)
    with pytest.raises(ValueError):
        list(decode_m1v_frames(data[: len(data) * 2 // 3]))


def test_mutation_fuzz_never_hangs_or_segfaults():
    f = smooth(16, 24, seed=8)
    data = bytearray(encode_m1v([f], qscale=2))
    rng = np.random.default_rng(42)
    for _ in range(200):
        mut = bytearray(data)
        for _ in range(rng.integers(1, 4)):
            mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
        try:
            for _idx, frame in decode_m1v_frames(bytes(mut)):
                assert frame.ndim == 3
        except (ValueError, IndexError):
            pass  # rejection is fine; crashes/hangs are not


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_m1v([])
    with pytest.raises(ValueError):
        encode_m1v([smooth(16, 16)], qscale=0)
    with pytest.raises(ValueError):
        encode_m1v([smooth(16, 16)], qscale=32)
    with pytest.raises(ValueError):
        encode_m1v([smooth(16, 16), smooth(32, 16)])

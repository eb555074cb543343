"""Progressive (SOF2) JPEG decoder tests.

The encoder's own script (spectral selection + DC successive
approximation) is covered by bit-equality with the sequential decode in
test_roundtrip_*; this file drives the decoder paths that script does
not emit — EOBn runs (r>0) and AC successive-approximation refinement
scans — with hand-built streams over a custom Huffman table, following
T.81 §G.1.2 (the encoder side here mirrors libjpeg's
encode_mcu_AC_refine, an independent public formulation)."""

import struct

import numpy as np
import pytest

from scrapelect_spark.sources.jpeg import (
    ZIGZAG,
    _A,
    _BitWriter,
    _build_codes,
    _magnitude,
    decode_jpeg,
    encode_jpeg,
)

# custom AC table: EOBn symbols (s=0, r=0..14) + ZRL + (r,1)/(r,2) codes
_AC_SYMS = (
    [r << 4 for r in range(15)]  # EOB0..EOB14
    + [0xF0]  # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 5)]
)
_DC_SYMS = list(range(12))


def _dht_payload(syms):
    """bits/vals arrays assigning ascending canonical code lengths."""
    # simple: put min(len,16)-ish — use length = 8 for all (fits 256)
    bits = [0] * 16
    bits[7] = len(syms)  # all codes length 8
    return bits, syms


def _huff_writer_codes(syms):
    bits, vals = _dht_payload(syms)
    return _build_codes(bits, vals)


def _container(scans, h=16, w=16):
    """Gray SOF2 container with an all-ones quant table and custom
    DC/AC Huffman tables."""
    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0]) + bytes([1] * 64)
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    for tc, syms in ((0x00, _DC_SYMS), (0x10, _AC_SYMS)):
        bits, vals = _dht_payload(syms)
        out += b"\xFF\xC4" + struct.pack(">H", 3 + 16 + len(vals)) + bytes([tc])
        out += bytes(bits) + bytes(vals)
    for seg in scans:
        out += seg
    out += b"\xFF\xD9"
    return bytes(out)


def _sos(ss, se, ah, al):
    return b"\xFF\xDA" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, ss, se, (ah << 4) | al])


def _expected_pixels(blocks, h=16, w=16):
    """IDCT of the zigzag coefficient blocks (quant table = 1)."""
    bh, bw = h // 8, w // 8
    out = np.zeros((h, w))
    for i, blk in enumerate(blocks):
        by, bx = divmod(i, bw)
        coeff = np.zeros(64)
        coeff[ZIGZAG] = blk
        block = _A.T @ coeff.reshape(8, 8) @ _A
        out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)[:, :, None]


def _encode_dc_first(writer, blocks, dc_codes, al):
    pred = 0
    for blk in blocks:
        t = int(blk[0]) >> al
        s, code = _magnitude(t - pred)
        pred = t
        c, ln = dc_codes[s]
        writer.write(c, ln)
        if s:
            writer.write(code, s)


def _encode_ac_first(writer, blocks, ac_codes, ss, se, al):
    """AC first scan WITH EOBn runs (unlike the module encoder)."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        while eobrun > 0:
            r = min(14, eobrun.bit_length() - 1)
            c, ln = ac_codes[r << 4]
            writer.write(c, ln)
            extra = eobrun - (1 << r)
            if r:
                writer.write(extra, r)
            eobrun = 0

    for blk in blocks:
        band = [int(blk[k]) // (1 << al) if blk[k] >= 0
                else -(int(-blk[k]) >> al) for k in range(ss, se + 1)]
        if not any(band):
            eobrun += 1
            continue
        flush_eob()
        run = 0
        for v in band:
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]
                writer.write(c, ln)
                run -= 16
            s, code = _magnitude(v)
            c, ln = ac_codes[(run << 4) | s]
            writer.write(c, ln)
            writer.write(code, s)
            run = 0
        if run > 0:
            eobrun += 1
    flush_eob()


def _encode_ac_refine(writer, blocks, ac_codes, ss, se, al):
    """Mirror of the T.81 §G.1.2.3 refinement coder (libjpeg's
    encode_mcu_AC_refine): ZRL is emitted AT the coefficient where the
    zero-history run crosses 16 (never past the last newly-significant
    index — trailing content folds into the EOB run), with correction
    bits buffered and flushed after each emitted symbol."""
    eobrun = 0
    pending: list[int] = []

    def emit_eobrun():
        nonlocal eobrun, pending
        if eobrun > 0:
            r = min(14, eobrun.bit_length() - 1)
            c, ln = ac_codes[r << 4]
            writer.write(c, ln)
            if r:
                writer.write(eobrun - (1 << r), r)
            for b in pending:
                writer.write(b, 1)
            eobrun = 0
            pending = []

    for blk in blocks:
        absv = [(abs(int(blk[k])) >> al, int(blk[k])) for k in range(ss, se + 1)]
        eob_idx = -1
        for i, (t, _) in enumerate(absv):
            if t == 1:
                eob_idx = i
        r = 0
        br: list[int] = []
        for i, (t, v) in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob_idx:
                emit_eobrun()
                c, ln = ac_codes[0xF0]
                writer.write(c, ln)
                r -= 16
                for b in br:
                    writer.write(b, 1)
                br = []
            if t > 1:  # already significant → buffer correction bit
                br.append(t & 1)
                continue
            emit_eobrun()
            c, ln = ac_codes[(r << 4) | 1]
            writer.write(c, ln)
            writer.write(1 if v > 0 else 0, 1)  # sign bit
            for b in br:
                writer.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
    emit_eobrun()


def _case_blocks(seed):
    rng = np.random.RandomState(seed)
    blocks = []
    for b in range(4):
        blk = np.zeros(64)
        blk[0] = int(rng.randint(-40, 40))
        for _ in range(rng.randint(0, 7)):
            k = int(rng.randint(1, 64))
            blk[k] = int(rng.randint(-15, 16)) or 3
        blocks.append(blk)
    if seed % 3 == 0:
        blocks[2][:] = 0
        blocks[2][0] = 4  # AC-empty block → EOB runs
        blocks[3][1:] = 0
    return blocks


@pytest.mark.parametrize("seed", range(25))
def test_successive_approximation_roundtrip(seed):
    """DC(Al=1)+refine and AC(Al=1)+refine over hand-encoded scans with
    EOBn runs must reconstruct the exact coefficients."""
    blocks = _case_blocks(seed)
    dc_codes = _huff_writer_codes(_DC_SYMS)
    ac_codes = _huff_writer_codes(_AC_SYMS)

    w1 = _BitWriter()
    _encode_dc_first(w1, blocks, dc_codes, al=1)
    w2 = _BitWriter()
    _encode_ac_first(w2, blocks, ac_codes, 1, 63, al=1)
    w3 = _BitWriter()
    _encode_dc_refine = lambda: [w3.write(int(b[0]) & 1, 1) for b in blocks]
    _encode_dc_refine()
    w4 = _BitWriter()
    _encode_ac_refine(w4, blocks, ac_codes, 1, 63, al=0)

    data = _container(
        [
            _sos(0, 0, 0, 1) + w1.flush(),
            _sos(1, 63, 0, 1) + w2.flush(),
            _sos(0, 0, 1, 0) + w3.flush(),
            _sos(1, 63, 1, 0) + w4.flush(),
        ]
    )
    got = decode_jpeg(data)
    want = _expected_pixels(blocks)
    assert np.array_equal(got, want), seed


def test_eobrun_skips_whole_blocks():
    """An EOB2 emitted in block 0 must skip the AC bands of blocks 1-2
    entirely (coefficients stay zero)."""
    blocks = [np.zeros(64) for _ in range(4)]
    blocks[0][0], blocks[0][1] = 8, 5
    blocks[3][2] = -3
    dc_codes = _huff_writer_codes(_DC_SYMS)
    ac_codes = _huff_writer_codes(_AC_SYMS)
    w1 = _BitWriter()
    _encode_dc_first(w1, blocks, dc_codes, al=0)
    w2 = _BitWriter()
    _encode_ac_first(w2, blocks, ac_codes, 1, 63, al=0)
    data = _container(
        [_sos(0, 0, 0, 0) + w1.flush(), _sos(1, 63, 0, 0) + w2.flush()]
    )
    assert np.array_equal(decode_jpeg(data), _expected_pixels(blocks))


def test_progressive_matches_sequential_bit_exact():
    """The module's own progressive script decodes bit-identically to
    the sequential encoding of the same image (same coefficients)."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (40, 56, 3), dtype=np.uint8)
    for sub in ("444", "420"):
        seq = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg(img, quality=85, subsampling=sub, progressive=True)
        )
        assert np.array_equal(seq, prog), sub


def test_progressive_through_image_operator(spark):
    """fmt='jpeg' rows with SOF2 payloads decode through
    with_image_features like any other JPEG."""
    from scrapelect_spark.operators.multimodal import with_image_features

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 24, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("p1", bytearray(encode_jpeg(img, progressive=True)), "jpeg", "cap")],
        "image_id string, bytes binary, fmt string, caption string",
    )
    row = with_image_features(df).collect()[0]
    assert row.decode_error is None
    assert (row.w, row.h) == (24, 16)


@pytest.mark.parametrize("seed", range(60))
def test_progressive_mutation_fuzz(seed):
    import random

    r = random.Random(seed)
    data = bytearray(
        encode_jpeg(
            np.tile(np.arange(24, dtype=np.uint8)[None, :, None], (16, 1, 3)),
            progressive=True,
        )
    )
    if r.random() < 0.5:
        data[r.randrange(2, len(data) - 2)] = r.randrange(256)
    else:
        data = data[: r.randrange(4, len(data))]
    try:
        out = decode_jpeg(bytes(data))
        assert out.dtype == np.uint8 and out.ndim == 3
    except (ValueError, NotImplementedError, struct.error, IndexError):
        pass

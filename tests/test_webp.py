"""WebP-lossless codec (sources/webp.py): encoder↔decoder roundtrips
plus FOREIGN-feature decode proven with hand-built VP8L bitstreams
(features the encoder never emits: color cache, predictor & color
transforms, palette bundling, meta-prefix groups, 2D LZ77 plane codes,
the max-symbol cap) — the FLAC/GIF/TIFF test convention."""

import numpy as np
import pytest

from scrapelect_spark.sources.webp import (
    BitReader,
    BitWriter,
    _DIST_TABLE,
    _prefix_encode_value,
    _write_prefix_code,
    canonical_codes,
    decode_webp,
    encode_webp,
)


# ------------------------------------------------------------ roundtrips

@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (7, 5, 3), (6, 4, 4), (16, 16)])
def test_roundtrip_random(shape):
    rng = np.random.RandomState(sum(shape))
    arr = rng.randint(0, 256, size=shape).astype(np.uint8)
    out = decode_webp(encode_webp(arr))
    ref = arr if arr.ndim == 3 else arr[:, :, None].repeat(3, axis=2)
    if ref.shape[2] == 3:
        assert np.array_equal(out[:, :, :3], ref)
        assert (out[:, :, 3] == 255).all()
    else:
        assert np.array_equal(out, ref)


def test_flat_image_compresses():
    flat = np.full((64, 64, 3), 123, np.uint8)
    blob = encode_webp(flat)
    assert len(blob) < 64 * 64 * 3 // 20
    assert np.array_equal(decode_webp(blob)[:, :, :3], flat)


def test_distance_table_matches_spec_head():
    # first rows of the spec's plane-code table
    assert _DIST_TABLE[:22] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2),
    ]
    assert len(_DIST_TABLE) == 120


# --------------------------------------------------- hand-built streams

def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _single_code(bw, sym, alphabet):
    """Simple prefix code with ONE symbol (0-bit reads)."""
    _write_prefix_code(bw, {sym: 1}, alphabet)


def _pair_code(bw, s0, s1, alphabet):
    """Simple prefix code with two 1-bit symbols; returns {sym: bit}."""
    _write_prefix_code(bw, {s0: 1, s1: 1}, alphabet)
    lo, hi = min(s0, s1), max(s0, s1)
    return {lo: 0, hi: 1}


def test_hand_built_color_cache():
    # 1x4 image [A, B, A, A]; third/fourth pixels via the color cache
    A = 0xFF102030
    B = 0xFF405060
    bits = 6
    idx_a = (0x1E35A7BD * A & 0xFFFFFFFF) >> (32 - bits)
    idx_b = (0x1E35A7BD * B & 0xFFFFFFFF) >> (32 - bits)
    assert idx_a != idx_b
    bw = BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache
    bw.write(bits, 4)
    bw.write(0, 1)  # no meta
    cache_size = 1 << bits
    ga, gb = (A >> 8) & 255, (B >> 8) & 255
    cache_a = 256 + 24 + idx_a
    green = {ga: None, gb: None, cache_a: None}
    glen = {ga: 2, gb: 2, cache_a: 1}
    _write_prefix_code(bw, glen, 256 + 24 + cache_size)
    gc = canonical_codes(
        [glen.get(s, 0) for s in range(256 + 24 + cache_size)]
    )
    rcodes = _pair_code(bw, (A >> 16) & 255, (B >> 16) & 255, 256)
    bcodes = _pair_code(bw, A & 255, B & 255, 256)
    _single_code(bw, 0xFF, 256)  # alpha
    _single_code(bw, 0, 40)  # distance (unused)
    # pixel A: green, red, blue (alpha is 0-bit)
    for pix in (A, B):
        c, l = gc[(pix >> 8) & 255]
        bw.write_code(c, l)
        bw.write(rcodes[(pix >> 16) & 255], 1)
        bw.write(bcodes[pix & 255], 1)
    # two cache hits for A
    for _ in range(2):
        c, l = gc[cache_a]
        bw.write_code(c, l)
    out = decode_webp(bytes(bw.getvalue()))
    assert out.shape == (1, 4, 4)
    want = np.array(
        [[[16, 32, 48, 255], [64, 80, 96, 255], [16, 32, 48, 255], [16, 32, 48, 255]]]
    )
    assert np.array_equal(out, want)


def _literal_stream(bw, pixels, alphabet_extra=24):
    """Write one prefix group + the literal pixels (no cache)."""
    greens = [((p >> 8) & 255) for p in pixels]
    reds = [((p >> 16) & 255) for p in pixels]
    blues = [p & 255 for p in pixels]
    alphas = [((p >> 24) & 255) for p in pixels]

    def code_for(vals, alphabet):
        syms = sorted(set(vals))
        if len(syms) == 1:
            _single_code(bw, syms[0], alphabet)
            return {syms[0]: (0, 0)}
        if len(syms) == 2:
            m = _pair_code(bw, syms[0], syms[1], alphabet)
            return {s: (bit, 1) for s, bit in m.items()}
        lens = {s: max(2, (len(syms) - 1).bit_length()) for s in syms}
        # make kraft feasible: give all equal lengths ceil(log2(n))
        L = (len(syms) - 1).bit_length()
        L = max(L, 1)
        while (len(syms) << (15 - L)) > (1 << 15):
            L += 1
        lens = {s: L for s in syms}
        _write_prefix_code(bw, lens, alphabet)
        cc = canonical_codes(
            [lens.get(s, 0) for s in range(alphabet)]
        )
        return cc

    gcodes = code_for(greens, 256 + alphabet_extra)
    rcodes = code_for(reds, 256)
    bcodes = code_for(blues, 256)
    acodes = code_for(alphas, 256)
    _single_code(bw, 0, 40)
    for p in pixels:
        for codes, v in (
            (gcodes, (p >> 8) & 255),
            (rcodes, (p >> 16) & 255),
            (bcodes, p & 255),
            (acodes, (p >> 24) & 255),
        ):
            c, l = codes[v]
            if l:
                bw.write_code(c, l)


def _subimage(bw, pixels):
    """Entropy-coded sub-image (no transforms, no meta): cache bit +
    one group + literals."""
    bw.write(0, 1)  # no color cache
    _literal_stream(bw, pixels)


def test_hand_built_predictor_transform():
    # 2x2 constant image via predictor mode 2 (T) in a single block
    target = 0xFF0A141E  # (10,20,30)
    bw = BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # PREDICTOR
    bw.write(2, 3)  # size_bits = 4 → one 16px block
    _subimage(bw, [0xFF000200])  # mode 2 in the green channel
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # residuals: (0,0) = target - black; (0,1) vs L → 0; (1,0) vs T → 0;
    # (1,1) mode T → 0   (all per-channel mod 256)
    res00 = 0x000A141E
    _literal_stream(bw, [res00, 0, 0, 0])
    out = decode_webp(bytes(bw.getvalue()))
    want = np.tile(np.array([10, 20, 30, 255], np.uint8), (2, 2, 1))
    assert np.array_equal(out, want)


def test_hand_built_color_transform():
    # 1x1 image, green_to_red = 64 (i.e. +2 per green=1? (64*g)>>5)
    g2r, g2b, r2b = 64, 32, 0
    cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    g = 16
    # stored red/blue chosen so output is exact
    dr = (64 * 16) >> 5  # 32
    db = (32 * 16) >> 5  # 16
    stored = (0xFF << 24) | (100 << 16) | (g << 8) | 200
    bw = BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR transform
    bw.write(2, 3)  # size_bits 4
    _subimage(bw, [cte])
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    _literal_stream(bw, [stored])
    out = decode_webp(bytes(bw.getvalue()))
    red = (100 + dr) & 255
    # r2b=0 → blue only shifts by green delta
    blue = (200 + db) & 255
    assert out[0, 0].tolist() == [red, g, blue, 255]


def test_hand_built_palette_with_bundling():
    # 4-color palette over a 6x1 image → width_bits=2, packed w=2
    colors = [0xFF000000, 0xFF0000FF, 0xFF00FF00, 0xFFFF0000]
    idxs = [0, 1, 2, 3, 1, 0]
    bw = BitWriter()
    _header(bw, 6, 1)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(3, 8)  # 4 colors - 1
    # palette sub-image is DELTA coded per channel
    deltas = []
    prev = 0
    for c in colors:
        d = 0
        for sh in (24, 16, 8, 0):
            d |= (((c >> sh) - (prev >> sh)) & 255) << sh
        deltas.append(d)
        prev = c
    _subimage(bw, deltas)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # packed pixels: 2 bits per index, lowest bits = leftmost pixel
    p0 = idxs[0] | (idxs[1] << 2) | (idxs[2] << 4) | (idxs[3] << 6)
    p1 = idxs[4] | (idxs[5] << 2)
    _literal_stream(bw, [0xFF000000 | (p0 << 8), 0xFF000000 | (p1 << 8)])
    out = decode_webp(bytes(bw.getvalue()))
    assert out.shape == (1, 6, 4)
    want_rgb = [
        [0, 0, 0], [0, 0, 255], [0, 255, 0], [255, 0, 0], [0, 0, 255], [0, 0, 0]
    ]
    assert out[0, :, :3].tolist() == want_rgb


def test_hand_built_meta_prefix_groups():
    # 16x1 image, 8px blocks → entropy image 2x1 picking two groups
    bw = BitWriter()
    _header(bw, 16, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta-prefix present
    bw.write(1, 3)  # huffman_bits = 3 → 8px blocks
    # entropy image: meta index in (red<<8)|green → pixels 0 and 1
    _subimage(bw, [0xFF000000, 0xFF000100])
    # group 0: all-A pixels, group 1: all-B pixels
    A, B = 0xFF111111, 0xFF222222
    for pix in (A, B):
        _single_code(bw, (pix >> 8) & 255, 256 + 24)
        _single_code(bw, (pix >> 16) & 255, 256)
        _single_code(bw, pix & 255, 256)
        _single_code(bw, (pix >> 24) & 255, 256)
        _single_code(bw, 0, 40)
    # all 16 pixels decode with 0-bit codes — nothing more to write
    out = decode_webp(bytes(bw.getvalue()))
    assert (out[0, :8, :3] == 17).all()
    assert (out[0, 8:, :3] == 34).all()


def test_hand_built_lz77_plane_code_row_above():
    # 4x2: row 1 copies row 0 via plane code 1 = (0,1) → dist = xsize
    pix = [0xFF010203, 0xFF040506, 0xFF070809, 0xFF0A0B0C]
    bw = BitWriter()
    _header(bw, 4, 2)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    greens = sorted({(p >> 8) & 255 for p in pix})
    L = 3
    glen = {g: L for g in greens}
    len_sym = 256 + _prefix_encode_value(4)[0]  # length 4 → sym 3
    glen[len_sym] = L
    _write_prefix_code(bw, glen, 256 + 24)
    gc = canonical_codes([glen.get(s, 0) for s in range(256 + 24)])
    rc = {}
    reds = sorted({(p >> 16) & 255 for p in pix})
    rlen = {v: 2 for v in reds}
    _write_prefix_code(bw, rlen, 256)
    rc = canonical_codes([rlen.get(s, 0) for s in range(256)])
    blues = sorted({p & 255 for p in pix})
    blen = {v: 2 for v in blues}
    _write_prefix_code(bw, blen, 256)
    bc = canonical_codes([blen.get(s, 0) for s in range(256)])
    _single_code(bw, 0xFF, 256)
    _single_code(bw, 0, 40)  # distance code 0 → plane value 1? No:
    # distance prefix symbol 0 decodes to value 1 = plane code 1 = (0,1)
    for p in pix:
        c, l = gc[(p >> 8) & 255]
        bw.write_code(c, l)
        c, l = rc[(p >> 16) & 255]
        bw.write_code(c, l)
        c, l = bc[p & 255]
        bw.write_code(c, l)
    # copy: length 4 (sym 3, no extra), distance handled by 0-bit code
    c, l = gc[len_sym]
    bw.write_code(c, l)
    out = decode_webp(bytes(bw.getvalue()))
    assert np.array_equal(out[0], out[1])
    assert out[0, 0, :3].tolist() == [1, 2, 3]


def test_hand_built_max_symbol_cap():
    # normal-form green code written WITH the max-symbol cap: only the
    # first 2 symbols coded, rest implicitly zero
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # green code: symbols 0 and 1 with length 1 — via normal form + cap
    bw.write(0, 1)  # not simple
    # code length code: symbol 1 (lengths "1") gets cl-length 1 →
    # single-symbol cl code (0 bits per read)
    order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
    cl_lengths = {1: 1}
    num = order.index(1) + 1  # position of symbol 1 in the order
    bw.write(max(num, 4) - 4, 4)
    for i in range(max(num, 4)):
        bw.write(cl_lengths.get(order[i], 0), 3)
    bw.write(1, 1)  # use max-symbol cap
    bw.write(0, 3)  # length_nbits = 2
    bw.write(0, 2)  # max_symbol = 2
    # two decodes of the single-symbol cl code → lengths [1, 1], rest 0
    _single_code(bw, 0, 256)  # red
    _single_code(bw, 0, 256)  # blue
    _single_code(bw, 0xFF, 256)  # alpha
    _single_code(bw, 0, 40)
    bw.write(0, 1)  # green sym 0 (code 0)
    bw.write(1, 1)  # green sym 1 (code 1)
    out = decode_webp(bytes(bw.getvalue()))
    assert out[0, 0].tolist() == [0, 0, 0, 255]
    assert out[0, 1].tolist() == [0, 1, 0, 255]


def test_hand_built_direct_distance():
    # distance plane code 124 → direct distance 4 (the full row width)
    pix = [0xFF310203, 0xFF340506, 0xFF370809, 0xFF3A0B0C]
    bw = BitWriter()
    _header(bw, 4, 2)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    greens = sorted({(p >> 8) & 255 for p in pix})
    glen = {g: 3 for g in greens}
    len_sym = 256 + _prefix_encode_value(4)[0]
    glen[len_sym] = 3
    _write_prefix_code(bw, glen, 256 + 24)
    gc = canonical_codes([glen.get(s, 0) for s in range(256 + 24)])
    rlen = {v: 2 for v in sorted({(p >> 16) & 255 for p in pix})}
    _write_prefix_code(bw, rlen, 256)
    rc = canonical_codes([rlen.get(s, 0) for s in range(256)])
    blen = {v: 2 for v in sorted({p & 255 for p in pix})}
    _write_prefix_code(bw, blen, 256)
    bc = canonical_codes([blen.get(s, 0) for s in range(256)])
    _single_code(bw, 0xFF, 256)
    dsym, deb, dev = _prefix_encode_value(124)
    _single_code(bw, dsym, 40)
    for p in pix:
        c, l = gc[(p >> 8) & 255]
        bw.write_code(c, l)
        c, l = rc[(p >> 16) & 255]
        bw.write_code(c, l)
        c, l = bc[p & 255]
        bw.write_code(c, l)
    c, l = gc[len_sym]
    bw.write_code(c, l)
    if deb:
        bw.write(dev, deb)
    out = decode_webp(bytes(bw.getvalue()))
    assert np.array_equal(out[0], out[1])


# ---------------------------------------------------------------- errors

@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"RIFF\x04\x00\x00\x00WAVE",
        b"\x30\x00\x00\x00\x00",  # bad signature
        b"\x2f\x00\x00",  # truncated header
    ],
)
def test_webp_rejects(bad):
    with pytest.raises(ValueError):
        decode_webp(bad)


def test_truncated_stream_raises():
    blob = encode_webp(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    with pytest.raises(ValueError):
        decode_webp(blob[: len(blob) - 4])

"""MS Video 1 (CRAM / MSVC) codec tests (sources/msvc.py): the real
INTERFRAME path — skip blocks copy from the previous frame, so decode
is stateful across frames.  Bitstream-level layout, exactness for
≤2-color blocks, deterministic lossy quantization for dense blocks,
the flags-bit-15 constraint, AVI integration, frame_sample routing,
and mutation fuzz."""

import struct

import numpy as np
import pytest

from scrapelect_spark.sources.msvc import (
    decode_avi_msvc_frames,
    decode_msvc_frame,
    encode_avi_msvc,
    encode_msvc_frame,
    rgb555_to_888,
    rgb888_to_555,
)

RNG = np.random.default_rng(11)
# channel values that survive 888→555→888 exactly
EXACT = np.array([(k << 3) | (k >> 2) for k in range(32)], dtype=np.uint8)


def exact_img(h, w, ncolors=4, seed=0):
    """Per-pixel random colors — blocks usually need lossy 8-color."""
    rng = np.random.default_rng(seed)
    pal = EXACT[rng.integers(0, 32, (ncolors, 3))]
    return pal[rng.integers(0, ncolors, (h, w))]


def blocky_img(h, w, seed=0, ncolors=6):
    """≤2 exact-555 colors per 4x4 block — the exact-roundtrip set."""
    rng = np.random.default_rng(seed)
    pal = EXACT[rng.integers(0, 32, (ncolors, 3))]
    img = pal[rng.integers(0, ncolors, (h // 4, w // 4))]
    img = img.repeat(4, axis=0).repeat(4, axis=1)
    for by in range(0, h, 8):  # second color in every other block
        for bx in range(0, w, 8):
            img[by : by + 2, bx : bx + 2] = pal[rng.integers(0, ncolors)]
    return img


# ------------------------------------------------------------ frame level


def test_keyframe_roundtrip_two_color_blocks_exact():
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :] = EXACT[[3, 9, 3]]
    img[2:6, 2:6] = EXACT[[20, 5, 20]]
    c = rgb888_to_555(img)
    data, recon = encode_msvc_frame(c, None)
    assert np.array_equal(recon, c)  # ≤2 colors per block → exact
    out = decode_msvc_frame(data, 8, 8, None)
    assert np.array_equal(out, c)


def test_solid_frame_uses_one_color_words():
    c = rgb888_to_555(np.full((4, 8, 3), EXACT[10], np.uint8))
    data, recon = encode_msvc_frame(c, None)
    assert len(data) == 4  # two blocks, one word each
    w0, w1 = struct.unpack("<HH", data)
    assert w0 == w1 and (w0 & 0x8000) and (w0 & 0x7FFF) == int(c[0, 0])
    assert np.array_equal(decode_msvc_frame(data, 8, 4, None), c)


def test_solid_color_in_skip_collision_range_escapes_to_two_color():
    """RGB555 values 0x0400-0x07FF would read as skip words when OR'd
    with 0x8000 — the encoder must emit them as flags=0 2-color."""
    c555 = 0x0555  # in the collision range
    c = np.full((4, 4), c555, dtype=np.uint16)
    data, recon = encode_msvc_frame(c, None)
    assert len(data) == 6  # flags word + two color words
    flags, c0, c1 = struct.unpack("<HHH", data)
    assert flags == 0 and c0 == c1 == c555
    assert np.array_equal(decode_msvc_frame(data, 4, 4, None), c)


def test_skip_blocks_copy_previous_frame():
    base = blocky_img(16, 16, seed=1)
    c0 = rgb888_to_555(base)
    d0, r0 = encode_msvc_frame(c0, None)
    # change exactly one block
    c1 = c0.copy()
    c1[4:8, 8:12] = int(rgb888_to_555(EXACT[[7, 7, 7]][None, None])[0, 0])
    d1, r1 = encode_msvc_frame(c1, r0)
    # stream: skip run + 1 block + skip run — far smaller than keyframe
    assert len(d1) < len(d0) / 2
    words = struct.unpack("<%dH" % (len(d1) // 2), d1)
    skip_words = [w for w in words if (w & 0xFC00) == 0x8400]
    assert skip_words and sum(w & 0x3FF for w in skip_words) == 15
    out1 = decode_msvc_frame(d1, 16, 16, decode_msvc_frame(d0, 16, 16, None))
    assert np.array_equal(out1, c1)


def test_skip_in_keyframe_rejected():
    data = struct.pack("<H", 0x8401)
    with pytest.raises(ValueError, match="skip code in keyframe"):
        decode_msvc_frame(data, 4, 4, None)


def test_identical_frame_is_all_skip():
    c = rgb888_to_555(exact_img(16, 24, seed=2))
    d0, r0 = encode_msvc_frame(c, None)
    d1, r1 = encode_msvc_frame(c, c, r0)  # same source → all skip,
    # even though the dense keyframe was quantized lossily
    assert len(d1) == 2  # one skip word covering all 24 blocks
    (w,) = struct.unpack("<H", d1)
    assert (w & 0xFC00) == 0x8400 and (w & 0x3FF) == 24


def test_long_skip_runs_split_at_1023():
    h, w = 4, 4 * 1200  # 1200 blocks in one row
    c = np.full((h, w), 33, dtype=np.uint16)
    d0, r0 = encode_msvc_frame(c, None)
    d1, _ = encode_msvc_frame(c, c, r0)
    words = struct.unpack("<%dH" % (len(d1) // 2), d1)
    assert [x & 0x3FF for x in words] == [1023, 177]
    assert np.array_equal(
        decode_msvc_frame(d1, w, h, decode_msvc_frame(d0, w, h, None)), c
    )


def test_eight_color_block_deterministic_and_decodable():
    img = EXACT[RNG.integers(0, 32, (4, 4, 3))]  # dense block
    c = rgb888_to_555(img)
    data, recon = encode_msvc_frame(c, None)
    assert len(data) == 18  # flags + 8 colors
    flags = struct.unpack("<H", data[:2])[0]
    assert not (flags & 0x8000)  # flag bit 15 must be 0
    c0 = struct.unpack("<H", data[2:4])[0]
    assert c0 & 0x8000  # 8-color discriminator
    out = decode_msvc_frame(data, 4, 4, None)
    assert np.array_equal(out, recon)
    # deterministic: re-encode gives identical bytes
    data2, _ = encode_msvc_frame(c, None)
    assert data2 == data
    # lossy but bounded: each quadrant uses 2 reps chosen from within
    # its own pixel range
    assert out.max() <= 0x7FFF


def test_two_color_flag_bit15_constraint():
    """Any 2-color block must encode a flags word < 0x8000, whatever
    the color layout (else the decoder reads it as 1-color/skip)."""
    for seed in range(20):
        img = exact_img(4, 4, ncolors=2, seed=seed)
        c = rgb888_to_555(img)
        data, recon = encode_msvc_frame(c, None)
        assert np.array_equal(recon, c)
        if len(data) == 6:
            flags = struct.unpack("<H", data[:2])[0]
            assert flags < 0x8000
        assert np.array_equal(decode_msvc_frame(data, 4, 4, None), c)


def test_bottom_up_block_order():
    """First emitted block is the BOTTOM-left one (DIB convention)."""
    c = np.zeros((8, 4), dtype=np.uint16)
    c[4:, :] = 100  # bottom half (high row indices)
    c[:4, :] = 200  # top half
    data, _ = encode_msvc_frame(c, None)
    w0, w1 = struct.unpack("<HH", data)
    assert (w0 & 0x7FFF) == 100 and (w1 & 0x7FFF) == 200


def test_dimension_validation():
    with pytest.raises(ValueError, match="multiples of 4"):
        encode_msvc_frame(np.zeros((6, 8), np.uint16), None)
    with pytest.raises(ValueError, match="bad MSVC dimensions"):
        decode_msvc_frame(b"", 6, 8, None)


def test_truncated_streams_rejected():
    c = rgb888_to_555(exact_img(8, 8, seed=3))
    data, _ = encode_msvc_frame(c, None)
    for cut in (1, 3, len(data) - 1):
        with pytest.raises(ValueError, match="truncated|bad MSVC"):
            decode_msvc_frame(data[:cut], 8, 8, None)


@pytest.mark.parametrize("seed", range(40))
def test_mutation_fuzz_no_hang(seed):
    r = np.random.default_rng(seed)
    c = rgb888_to_555(exact_img(16, 16, ncolors=6, seed=seed))
    data = bytearray(encode_msvc_frame(c, None)[0])
    if r.random() < 0.5 and data:
        data[r.integers(0, len(data))] = r.integers(0, 256)
    else:
        data = data[: r.integers(0, len(data) + 1)]
    try:
        out = decode_msvc_frame(bytes(data), 16, 16, None)
        assert out.shape == (16, 16)
    except ValueError:
        pass  # clean rejection is the contract


# -------------------------------------------------------------- 888 bridge


def test_rgb_conversion_exact_on_replicated_values():
    img = exact_img(8, 12, ncolors=8, seed=4)
    assert np.array_equal(rgb555_to_888(rgb888_to_555(img)), img)


def test_rgb_conversion_psnr_on_arbitrary_values():
    img = RNG.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    back = rgb555_to_888(rgb888_to_555(img))
    err = (img.astype(np.int64) - back.astype(np.int64)) ** 2
    psnr = 10 * np.log10(255**2 / err.mean())
    assert psnr > 30  # 5-bit quantization bound


# ----------------------------------------------------------------- AVI


def test_avi_roundtrip_and_keyframe_flags():
    frames = [blocky_img(16, 16, seed=s) for s in (5, 5, 6, 6)]
    blob = encode_avi_msvc(frames, fps=12)
    from scrapelect_spark.sources.avi import avi_meta, avi_video_fourcc

    assert avi_video_fourcc(blob) == b"CRAM"
    assert avi_meta(blob) == (16, 16, 4, 12)
    out = list(decode_avi_msvc_frames(blob))
    assert [i for i, _ in out] == [0, 1, 2, 3]
    for (_, got), src in zip(out, frames):
        assert np.array_equal(got, src)
    # idx1: only frame 0 carries AVIIF_KEYFRAME
    i = blob.index(b"idx1")
    entries = blob[i + 8 :]
    flags = [
        struct.unpack("<I", entries[16 * k + 4 : 16 * k + 8])[0]
        for k in range(4)
    ]
    assert flags == [0x10, 0, 0, 0]


def test_avi_sampling_composites_through_skipped_frames():
    """every_n sampling still decodes EVERY frame (interframe), and a
    sampled frame reflects state built by unsampled ones."""
    f0 = blocky_img(16, 16, seed=7)
    f1 = f0.copy()
    f1[0:4, 0:4] = EXACT[[1, 1, 1]]
    f2 = f1.copy()  # identical to f1 → all-skip
    blob = encode_avi_msvc([f0, f1, f2])
    out = dict(decode_avi_msvc_frames(blob, every_n=2))
    assert sorted(out) == [0, 2]
    assert np.array_equal(out[2], f2)  # needs frame 1's blocks


def test_frame_sample_operator_routes_msvc(spark):
    import pandas as pd

    from scrapelect_spark.operators.multimodal import frame_sample
    from scrapelect_spark.sources.png import decode_png

    frames = [blocky_img(16, 16, seed=s) for s in range(5)]
    blob = encode_avi_msvc(frames)
    video = spark.createDataFrame(
        pd.DataFrame({"video_id": ["v1"], "bytes": [blob]})
    )
    rows = frame_sample(video, every_n=2).collect()
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    assert all(r.decode_error is None for r in rows)
    for r in rows:
        assert np.array_equal(decode_png(bytes(r.bytes)), frames[r.frame_idx])

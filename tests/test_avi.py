"""MJPEG-AVI container tests: header metadata, frame chunk walk,
sampling stride, roundtrip PSNR, and malformed-input rejection."""

import struct

import numpy as np
import pytest

from scrapelect_spark.sources.avi import (
    avi_frame_chunks,
    avi_meta,
    decode_avi_mjpeg_frames,
    encode_avi_mjpeg,
)
from scrapelect_spark.sources.png import psnr


def grad(h, w, shift=0):
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255 // max(w - 1, 1)).astype(np.int32)
    g = (y * 255 // max(h - 1, 1)).astype(np.int32)
    b = ((x + y) * 255 // max(w + h - 2, 1)).astype(np.int32)
    return np.clip(np.stack([r, g, b], axis=-1) + shift, 0, 255).astype(np.uint8)


def test_meta_and_chunk_walk():
    frames = [grad(24, 32, 5 * f) for f in range(6)]
    data = encode_avi_mjpeg(frames, fps=10, quality=90)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert avi_meta(data) == (32, 24, 6, 10)
    chunks = list(avi_frame_chunks(data))
    assert len(chunks) == 6
    # every chunk is an independent baseline JPEG (SOI marker)
    assert all(c[:2] == b"\xFF\xD8" for c in chunks)


@pytest.mark.parametrize("every_n,expect", [(1, [0, 1, 2, 3, 4, 5]),
                                            (2, [0, 2, 4]), (3, [0, 3]),
                                            (6, [0]), (10, [0])])
def test_sampling_stride(every_n, expect):
    data = encode_avi_mjpeg([grad(16, 16, f) for f in range(6)], quality=90)
    assert [i for i, _ in decode_avi_mjpeg_frames(data, every_n)] == expect


def test_roundtrip_psnr():
    frames = [grad(24, 32, 5 * f) for f in range(6)]
    data = encode_avi_mjpeg(frames, quality=90)
    for idx, arr in decode_avi_mjpeg_frames(data, every_n=2):
        assert arr.shape == (24, 32, 3)
        assert psnr(frames[idx], arr) >= 40.0


def test_odd_sized_jpeg_chunks_padded():
    """RIFF chunks are word-aligned; odd-length JPEG payloads must not
    desync the chunk walk."""
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
              for _ in range(5)]
    data = encode_avi_mjpeg(frames, quality=85)
    assert len(list(avi_frame_chunks(data))) == 5
    assert [i for i, _ in decode_avi_mjpeg_frames(data, 1)] == list(range(5))


def test_rejects_non_avi():
    with pytest.raises(ValueError):
        avi_meta(b"RIFFxxxxWAVEdata")
    with pytest.raises(ValueError):
        list(avi_frame_chunks(b"not a riff at all----"))
    with pytest.raises(ValueError):
        encode_avi_mjpeg([])


def test_rejects_mismatched_frames():
    with pytest.raises(ValueError):
        encode_avi_mjpeg([grad(16, 16), grad(16, 24)])


@pytest.mark.parametrize("seed", range(60))
def test_mutation_fuzz_no_hang(seed):
    """Corrupt AVI streams decode or raise promptly — never hang."""
    import random

    r = random.Random(seed)
    data = bytearray(
        encode_avi_mjpeg([grad(16, 16, f) for f in range(4)], quality=85)
    )
    if r.random() < 0.5:
        data[r.randrange(4, len(data))] = r.randrange(256)
    else:
        data = data[: r.randrange(4, len(data))]
    try:
        for _idx, arr in decode_avi_mjpeg_frames(bytes(data), 1):
            assert arr.ndim == 3 and arr.shape[0] * arr.shape[1] <= (1 << 28)
        avi_meta(bytes(data))
    except (ValueError, NotImplementedError, struct.error, IndexError, KeyError):
        pass


def test_rec_list_nested_frames():
    """Interleaved AVIs group frame chunks inside LIST 'rec ' — the
    walker must descend into them (muxer layout, OpenDML)."""
    frames = [grad(16, 16, 3 * f) for f in range(4)]
    flat = encode_avi_mjpeg(frames, quality=88)
    # rebuild: wrap each 00dc chunk in its own LIST 'rec '
    import struct as _s

    def chunk(tag, body):
        pad = b"\x00" if len(body) % 2 else b""
        return tag + _s.pack("<I", len(body)) + body + pad

    chunks = list(avi_frame_chunks(flat))
    movi_body = b"movi" + b"".join(
        chunk(b"LIST", b"rec " + chunk(b"00dc", c)) for c in chunks
    )
    # splice the rec-wrapped movi into a fresh RIFF with the old hdrl
    i = flat.find(b"LIST", 12)
    # copy everything up to the original movi LIST
    j = flat.find(b"movi") - 8
    head = flat[12:j]
    body = b"AVI " + head[: 0] + flat[12:j] + chunk(b"LIST", movi_body)
    data = b"RIFF" + _s.pack("<I", len(body)) + body
    out = list(decode_avi_mjpeg_frames(data, every_n=1))
    assert [i for i, _ in out] == [0, 1, 2, 3]
    for k, (idx, arr) in enumerate(out):
        assert psnr(frames[idx], arr) >= 40.0


def test_shape_mismatch_raises_before_encoding():
    import time

    big = [grad(64, 64)] * 50 + [grad(64, 32)]
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="differ in size"):
        encode_avi_mjpeg(big)
    assert time.perf_counter() - t0 < 0.5  # no 50-frame encode first

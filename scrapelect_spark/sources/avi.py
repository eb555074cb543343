"""Minimal AVI (RIFF) container codec for MJPEG video — pure Python.

Retires the video-frame-sampling stub: MJPEG-in-AVI is the simplest
real video format (each frame is an independent baseline JPEG, decoded
by sources/jpeg.py), and the RIFF container layout is fully public
(Microsoft AVI spec / OpenDML).  Writer emits a single 'vids'/'MJPG'
stream (avih + strh/strf headers, 'movi' chunk list, idx1 index);
reader walks the RIFF tree and yields the '00dc'/'00db' frame chunks.

``mux_avi`` is codec-agnostic (sources/msvc.py reuses it for
interframe MS Video 1 / CRAM streams).  Motion-compensated codecs
(H.264 etc.) stay out of scope — they need a real codec library; the
contract documented on ``operators/multimodal.frame_sample`` is
unchanged for them.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def mux_avi(
    chunks: list[bytes],
    w: int,
    h: int,
    fps: int = 10,
    fourcc: bytes = b"MJPG",
    bitcount: int = 24,
    keyframes: list[bool] | None = None,
) -> bytes:
    """Compressed frame chunks → single-video-stream AVI bytes
    (avih + strh/strf headers, 'movi' list, idx1 index).  ``keyframes``
    marks which idx1 entries get AVIIF_KEYFRAME (all, when omitted —
    correct for intraframe codecs like MJPEG)."""
    if not chunks:
        raise ValueError("no frames")
    if keyframes is None:
        keyframes = [True] * len(chunks)
    jpegs = chunks
    n = len(jpegs)
    max_bytes = max(len(j) for j in jpegs)

    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,  # dwMicroSecPerFrame
            max_bytes * fps,  # dwMaxBytesPerSec
            0,  # dwPaddingGranularity
            0x10,  # dwFlags: AVIF_HASINDEX
            n,  # dwTotalFrames
            0,  # dwInitialFrames
            1,  # dwStreams
            max_bytes,  # dwSuggestedBufferSize
            w,
            h,
            0, 0, 0, 0,  # dwReserved
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids"
        + fourcc
        + struct.pack(
            "<IHHIIIIIIIi4H",
            0,  # dwFlags
            0, 0,  # priority, language
            0,  # initial frames
            1, fps,  # scale, rate → fps
            0, n,  # start, length
            max_bytes,  # bufsize
            0,  # quality
            0,  # samplesize
            0, 0, w, h,  # rcFrame
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40,  # biSize
            w,
            h,
            1,  # planes
            bitcount,
            fourcc,  # compression
            w * h * (bitcount // 8),  # size image
            0, 0, 0, 0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_chunks = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_chunks)
    # idx1: one entry per frame — offset relative to 'movi' fourcc
    idx_entries = []
    off = 4
    for j, key in zip(jpegs, keyframes):
        idx_entries.append(
            b"00dc" + struct.pack("<III", 0x10 if key else 0, off, len(j))
        )
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 90
) -> bytes:
    """Encode uint8 frames (all same HxW[x3]) → MJPEG AVI bytes."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("frames differ in size")
    return mux_avi(
        [encode_jpeg(f, quality=quality) for f in frames], w, h, fps
    )


def avi_video_fourcc(data: bytes) -> bytes:
    """The first video stream's codec fourcc (from strh), uppercased —
    how frame_sample routes MJPG vs CRAM/MSVC payloads."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    for fourcc, start, length in _walk_chunks(data, 12, len(data)):
        if fourcc == b"LIST" and data[start : start + 4] == b"hdrl":
            for f2, s2, l2 in _walk_chunks(data, start + 4, start + length):
                if f2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                    for f3, s3, l3 in _walk_chunks(data, s2 + 4, s2 + l2):
                        if f3 == b"strh" and data[s3 : s3 + 4] == b"vids":
                            return data[s3 + 4 : s3 + 8].upper()
    raise ValueError("no video stream header")


def _walk_chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, body_start, body_len) over a chunk run."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, pos + 8, length
        pos += 8 + length + (length % 2)


def avi_meta(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, fps) from the avih/strh headers."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    for fourcc, start, length in _walk_chunks(data, 12, len(data)):
        if fourcc == b"LIST" and data[start : start + 4] == b"hdrl":
            for f2, s2, l2 in _walk_chunks(data, start + 4, start + length):
                if f2 == b"avih":
                    vals = struct.unpack("<14I", data[s2 : s2 + 56])
                    fps = 1_000_000 // vals[0] if vals[0] else 0
                    return int(vals[8]), int(vals[9]), int(vals[4]), int(fps)
    raise ValueError("no avih header")


def avi_frame_chunks(data: bytes) -> Iterator[bytes]:
    """Yield each video frame's compressed bytes ('00dc'/'00db'),
    including frames grouped inside interleave LIST 'rec ' chunks
    (the layout muxers emit when interleaving audio+video)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")

    def walk(pos: int, end: int) -> Iterator[bytes]:
        for f2, s2, l2 in _walk_chunks(data, pos, end):
            if f2 == b"LIST" and data[s2 : s2 + 4] == b"rec ":
                yield from walk(s2 + 4, s2 + l2)
            elif f2[2:4] in (b"dc", b"db"):
                yield data[s2 : s2 + l2]

    for fourcc, start, length in _walk_chunks(data, 12, len(data)):
        if fourcc == b"LIST" and data[start : start + 4] == b"movi":
            yield from walk(start + 4, start + length)


def decode_avi_mjpeg_frames(
    data: bytes, every_n: int = 1
) -> Iterator[tuple[int, np.ndarray]]:
    """Decode every ``every_n``-th frame → (frame_idx, HxWxC uint8).
    Skipped frames are never JPEG-decoded (chunk walk is free) — the
    point of frame *sampling*."""
    for idx, chunk in enumerate(avi_frame_chunks(data)):
        if idx % every_n == 0:
            yield idx, decode_jpeg(chunk)

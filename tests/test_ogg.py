"""Ogg container (RFC 3533) + FLAC-in-Ogg mapping: page round-trips
across every lacing edge (empty packet, exact-255 multiples, packets
spanning pages, >255-segment packets), CRC vectors and corruption
rejection, flag discipline, and the full PCM → FLAC → Ogg → FLAC →
PCM bit-exact loop.
"""

import struct

import numpy as np
import pytest

from scrapelect_spark.sources.flac import decode_flac, encode_flac, encode_flac_parts
from scrapelect_spark.sources.ogg import (
    demux_flac_ogg,
    mux_flac_ogg,
    ogg_crc,
    read_ogg,
    write_ogg,
)


def test_crc_known_vector():
    # independently computable: CRC of a single zero byte under
    # poly 0x04C11DB7, init 0, unreflected = the poly-shifted table row
    assert ogg_crc(b"\x00") == 0
    assert ogg_crc(b"\x01") == 0x04C11DB7
    # linearity sanity: crc(a) != crc(b) for distinct short strings
    assert ogg_crc(b"OggS") != ogg_crc(b"oggs")


@pytest.mark.parametrize(
    "sizes",
    [
        [10],
        [0],                       # empty packet → single 0 lacing
        [255],                     # exact multiple → trailing 0 lacing
        [510, 3],
        [70_000],                  # spans pages (>255 segments)
        [255 * 255],               # page break exactly on boundary
        [1, 0, 255, 256, 1000, 0],
    ],
)
def test_page_roundtrip(sizes):
    rng = np.random.default_rng(sum(sizes) + len(sizes))
    packets = [
        (rng.integers(0, 256, n, dtype=np.uint8).tobytes(), 100 + i)
        for i, n in enumerate(sizes)
    ]
    blob = write_ogg(packets)
    got = read_ogg(blob)
    assert [p for p, _ in got] == [p for p, _ in packets]
    # each packet's reported granule is the granule of the page it
    # completed on — at these sizes every packet completes on some page
    assert all(isinstance(g, int) for _, g in got)
    # structure flags: exactly one BOS (first page), one EOS (last)
    assert blob[:4] == b"OggS" and blob[5] & 0x02
    assert blob.count(b"OggS") >= 1


def test_corruption_rejected():
    blob = write_ogg([(b"hello world", 1)])
    bad = bytearray(blob)
    bad[-1] ^= 0xFF  # flip a body byte → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        read_ogg(bytes(bad))
    with pytest.raises(ValueError, match="capture"):
        read_ogg(b"NotO" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        read_ogg(blob[: len(blob) // 2])
    # missing EOS: strip the flag and re-CRC (reader verifies CRC first)
    noeos = bytearray(blob)
    noeos[5] &= ~0x04
    noeos[22:26] = b"\x00\x00\x00\x00"
    noeos[22:26] = struct.pack("<I", ogg_crc(bytes(noeos)))
    with pytest.raises(ValueError, match="EOS"):
        read_ogg(bytes(noeos))


def test_flac_ogg_roundtrip_bit_exact():
    rng = np.random.default_rng(5)
    pcm = (rng.integers(-2000, 2000, 10_000)).astype(np.int16)
    header, frames = encode_flac_parts(pcm, 16_000, block_size=4096)
    spf = [4096, 4096, 10_000 - 2 * 4096]
    assert len(frames) == 3
    ogg_blob = mux_flac_ogg(header, frames, spf)
    native = demux_flac_ogg(ogg_blob)
    assert native == encode_flac(pcm, 16_000, block_size=4096)
    samples, rate = decode_flac(native)
    assert rate == 16_000
    assert np.array_equal(np.asarray(samples, dtype=np.int16).ravel(), pcm)
    # final page granule = total samples (the mapping's seek contract)
    pkts = read_ogg(ogg_blob)
    assert pkts[-1][1] == 10_000


def test_flac_ogg_stereo_and_errors():
    rng = np.random.default_rng(6)
    pcm = rng.integers(-500, 500, (5000, 2)).astype(np.int16)
    header, frames = encode_flac_parts(pcm, 44_100)
    blob = mux_flac_ogg(header, frames, [4096, 5000 - 4096])
    samples, rate = decode_flac(demux_flac_ogg(blob))
    assert np.asarray(samples).shape == (5000, 2) and np.array_equal(
        np.asarray(samples, dtype=np.int16), pcm
    )
    with pytest.raises(ValueError, match="mapping"):
        demux_flac_ogg(write_ogg([(b"\x01vorbis-ish", 0)]))
    with pytest.raises(ValueError):
        mux_flac_ogg(b"junk", [b"f"], [1])

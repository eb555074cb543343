"""ID3 codec: v2.3/v2.4 round-trips in every writer encoding, v2.2 and
unsynchronized tags from hand-built streams, the v1 trailer fallback,
precedence, and malformed-tag rejection.
"""

import struct

import pytest

from scrapelect_spark.sources.id3 import (
    _syncsafe,
    encode_id3v1,
    encode_id3v2,
    extract_tags,
    parse_id3v1,
    parse_id3v2,
)

TAGS = {
    "title": "Círculo — Test",
    "artist": "Ärtist",
    "album": "Album 1",
    "track": "7",
    "year": "1999",
}


@pytest.mark.parametrize(
    "version,encoding",
    [(3, 0), (3, 1), (4, 0), (4, 1), (4, 3)],
)
def test_v2_roundtrip(version, encoding):
    tags = dict(TAGS)
    if encoding == 0:
        # latin-1 writer: use latin-1-encodable strings
        tags["title"] = "Círculo - Test"
        tags["artist"] = "Ärtist"
    audio = b"\x01\x02" * 9
    blob = encode_id3v2(tags, audio, version=version, encoding=encoding)
    fields, off = parse_id3v2(blob)
    assert fields == tags
    assert blob[off:] == audio
    assert extract_tags(blob) == tags


def test_v24_year_frame_is_tdrc():
    blob = encode_id3v2({"year": "2001"}, version=4)
    assert b"TDRC" in blob and b"TYER" not in blob
    blob3 = encode_id3v2({"year": "2001"}, version=3)
    assert b"TYER" in blob3 and b"TDRC" not in blob3


def test_v22_hand_built():
    # 3-byte ids, 3-byte big-endian sizes, no frame flags
    payload = b"\x00Old title\x00"
    frame = b"TT2" + len(payload).to_bytes(3, "big") + payload
    blob = b"ID3" + bytes([2, 0, 0]) + _syncsafe(len(frame)) + frame
    fields, off = parse_id3v2(blob)
    assert fields == {"title": "Old title"}
    assert off == len(blob)


def test_unsynchronized_tag():
    # body containing 0xFF 0x00 pairs written unsynchronized: the
    # parser must undo the stuffing before reading frame sizes
    payload = b"\x00A\xffB\x00"
    frame = b"TIT2" + struct.pack(">I", len(payload)) + b"\x00\x00" + payload
    stuffed = frame.replace(b"\xff", b"\xff\x00")
    blob = b"ID3" + bytes([3, 0, 0x80]) + _syncsafe(len(stuffed)) + stuffed
    fields, _ = parse_id3v2(blob)
    assert fields["title"] == "A\xffB"


def test_v1_trailer_and_precedence():
    audio = b"zz" * 40
    v1 = encode_id3v1(TAGS, audio)
    got = parse_id3v1(v1)
    assert got["title"].startswith("C")  # latin-1 replacement-safe
    assert got["track"] == "7" and got["year"] == "1999"
    assert parse_id3v2(v1) is None
    # both present → v2 wins
    both = encode_id3v2({"title": "v2 wins"}, v1, version=3, encoding=0)
    assert extract_tags(both) == {"title": "v2 wins"}


def test_malformed_and_untagged():
    with pytest.raises(ValueError):
        extract_tags(b"\x00" * 64)  # no tag at all
    good = encode_id3v2(TAGS, b"", version=3, encoding=1)
    with pytest.raises(ValueError):
        parse_id3v2(good[:12])  # truncated tag
    # frame size overrunning the tag body
    payload = b"\x00hi\x00"
    frame = b"TIT2" + struct.pack(">I", 1000) + b"\x00\x00" + payload
    blob = b"ID3" + bytes([3, 0, 0]) + _syncsafe(len(frame)) + frame
    with pytest.raises(ValueError):
        parse_id3v2(blob)


def test_long_v1_fields_truncate():
    tags = {"title": "x" * 64, "artist": "y" * 64, "album": "z" * 64,
            "year": "1984", "track": "3"}
    got = parse_id3v1(encode_id3v1(tags))
    assert got["title"] == "x" * 30 and got["album"] == "z" * 30


# --------------------------------------------------- mp3 header scan


def test_mp3_scan_basics():
    from scrapelect_spark.sources.mp3 import make_header, scan_mp3

    def frames(specs):
        out = bytearray()
        for kbps, rate, pad in specs:
            fb = 144 * kbps * 1000 // rate + pad
            out += make_header(kbps, rate, pad) + b"\x00" * (fb - 4)
        return bytes(out)

    cbr = frames([(128, 44_100, 0)] * 5)
    m = scan_mp3(cbr)
    assert m["n_frames"] == 5 and m["sample_rate"] == 44_100
    assert m["is_cbr"] and not m["has_id3"]
    assert m["duration_s"] == pytest.approx(5 * 1152 / 44_100)

    vbr = frames([(128, 48_000, 0), (320, 48_000, 1), (192, 48_000, 0)])
    m = scan_mp3(vbr)
    assert (m["bitrate_min_kbps"], m["bitrate_max_kbps"]) == (128, 320)
    assert not m["is_cbr"]

    # padding bit changes the frame size by exactly one byte — the
    # walk must land on the next sync either way (covered by vbr above)

    # leading ID3v2 skipped
    tagged = encode_id3v2({"title": "x"}) + cbr
    m = scan_mp3(tagged)
    assert m["has_id3"] and m["n_frames"] == 5

    # truncated final frame still counts
    m = scan_mp3(cbr[:-30])
    assert m["n_frames"] == 5


def test_mp3_scan_rejections():
    from scrapelect_spark.sources.mp3 import make_header, scan_mp3

    with pytest.raises(ValueError, match="no frames"):
        scan_mp3(b"")
    with pytest.raises(ValueError, match="bad frame header"):
        scan_mp3(b"\x00" * 100)
    good = make_header(128, 44_100) + b"\x00" * 500
    bad = bytearray(good + good[:4] + b"\x00" * 10)
    bad[len(good)] = 0x12  # second header loses sync
    with pytest.raises(ValueError, match="bad frame header"):
        scan_mp3(bytes(bad))
    # Layer II header must be rejected by the L3 scanner
    l2 = bytearray(make_header(128, 44_100))
    l2[1] = (l2[1] & ~0b110) | (0b10 << 1)  # layer bits → Layer II
    with pytest.raises(ValueError, match="bad frame header"):
        scan_mp3(bytes(l2) + b"\x00" * 100)

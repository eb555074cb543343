"""MPEG-1 Layer III frame-HEADER scanning — honest metadata-level
support for .mp3 corpora: duration, bitrate profile, sample rate and
frame count come from the 4-byte frame headers alone (ISO 11172-3
§2.4.1.3, the same header grammar as the in-repo Layer I/II codecs in
mp2.py); the Huffman-coded payload itself remains a declared stub.

A training-data pipeline needs exactly this level for audio corpus
stats and curation (drop sub-second clips, bucket by bitrate, detect
CBR vs VBR) — none of which requires synthesizing PCM.

Header layout (32 bits): 11-bit sync, 2-bit version (11 = MPEG-1),
2-bit layer (01 = Layer III), protection bit, 4-bit bitrate index,
2-bit sample-rate index, padding bit, private, 2-bit channel mode,
mode extension, copyright, original, emphasis.  Frame size for
MPEG-1 Layer III = ``144 * bitrate / rate + padding`` bytes; 1152
samples per frame.  A leading ID3v2 tag (sources/id3.py) is skipped.
"""

from __future__ import annotations

#: MPEG-1 Layer III bitrates, kbps, by the 4-bit index (0 = free, 15 = bad)
BITRATES_V1L3 = [
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
    None,
]

SAMPLE_RATES_V1 = [44_100, 48_000, 32_000, None]

SAMPLES_PER_FRAME = 1152


def _parse_header(b: bytes):
    """4 header bytes → (bitrate_kbps, sample_rate, frame_bytes) or
    None when the bytes are not a valid MPEG-1 Layer III header."""
    if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        return None
    version = (b[1] >> 3) & 0x3
    layer = (b[1] >> 1) & 0x3
    if version != 0b11 or layer != 0b01:  # MPEG-1, Layer III
        return None
    br_idx = (b[2] >> 4) & 0xF
    sr_idx = (b[2] >> 2) & 0x3
    padding = (b[2] >> 1) & 0x1
    bitrate = BITRATES_V1L3[br_idx]
    rate = SAMPLE_RATES_V1[sr_idx]
    if bitrate is None or rate is None:
        return None
    frame_bytes = 144 * bitrate * 1000 // rate + padding
    return bitrate, rate, frame_bytes


def make_header(bitrate_kbps: int, rate: int, padding: int = 0) -> bytes:
    """Serialize a valid MPEG-1 Layer III frame header (mono, no CRC)
    — the writer half the scanner tests against."""
    br_idx = BITRATES_V1L3.index(bitrate_kbps)
    sr_idx = SAMPLE_RATES_V1.index(rate)
    return bytes([
        0xFF,
        0xE0 | (0b11 << 3) | (0b01 << 1) | 1,   # MPEG-1, Layer III, no CRC
        (br_idx << 4) | (sr_idx << 2) | (padding << 1),
        0b11 << 6,                               # mono
    ])


def scan_mp3(data: bytes) -> dict:
    """Scan an .mp3 byte stream: skip a leading ID3v2 tag, then walk
    consecutive frame headers.  Returns ``{n_frames, sample_rate,
    duration_s, bitrate_min_kbps, bitrate_max_kbps, is_cbr,
    has_id3}``.  Raises when no valid frame is found or a header
    mid-stream is malformed (truncated final frames are tolerated —
    ubiquitous in crawled audio)."""
    from .id3 import parse_id3v2

    pos = 0
    has_id3 = False
    v2 = parse_id3v2(data)
    if v2 is not None:
        has_id3 = True
        pos = v2[1]
    n = 0
    rate = None
    br_min = br_max = None
    while pos + 4 <= len(data):
        hdr = _parse_header(data[pos:pos + 4])
        if hdr is None:
            raise ValueError(f"mp3: bad frame header at byte {pos}")
        bitrate, r, fb = hdr
        if rate is None:
            rate = r
        elif r != rate:
            raise ValueError("mp3: sample rate changed mid-stream")
        br_min = bitrate if br_min is None else min(br_min, bitrate)
        br_max = bitrate if br_max is None else max(br_max, bitrate)
        n += 1
        pos += fb
        if pos > len(data):
            break  # truncated final frame: count it, stop
    if n == 0:
        raise ValueError("mp3: no frames found")
    return {
        "n_frames": n,
        "sample_rate": rate,
        "duration_s": n * SAMPLES_PER_FRAME / rate,
        "bitrate_min_kbps": br_min,
        "bitrate_max_kbps": br_max,
        "is_cbr": br_min == br_max,
        "has_id3": has_id3,
    }

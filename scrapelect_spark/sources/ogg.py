"""Ogg container (RFC 3533) + the xiph FLAC-to-Ogg mapping.

Pure-Python page-level mux/demux from the public specs:

* **Pages**: "OggS" capture pattern, version 0, header-type flags
  (0x01 continued-packet, 0x02 BOS, 0x04 EOS), 64-bit granule
  position, 32-bit serial + page sequence, CRC-32 (poly 0x04C11DB7,
  init 0, NOT reflected, no final xor — computed with the CRC field
  zeroed), then a lacing table: packets are split into 255-byte
  segments, a lacing value of 255 means "continues", < 255 terminates
  the packet (a packet that is an exact multiple of 255 ends with a
  0 lacing value).  Packets may span pages via the continuation flag.
* **FLAC mapping** (xiph.org Ogg-FLAC spec): the BOS page holds one
  packet ``0x7F "FLAC" major minor n_header_packets(16BE) "fLaC"
  STREAMINFO``; each following audio packet is exactly one FLAC
  frame, granule = number of samples completed.

The demuxer validates capture pattern, version, CRC, and page
sequence continuity, and reassembles packets across pages — a
truncated or corrupted stream raises (callers error-capture).
"""

from __future__ import annotations

import struct

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 \
            else (_r << 1) & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _page(
    payload_segments: list[int],
    body: bytes,
    header_type: int,
    granule: int,
    serial: int,
    seq: int,
) -> bytes:
    head = (
        b"OggS"
        + bytes([0, header_type])
        + struct.pack("<q", granule)
        + struct.pack("<II", serial, seq)
        + b"\x00\x00\x00\x00"  # CRC placeholder
        + bytes([len(payload_segments)])
        + bytes(payload_segments)
    )
    crc = ogg_crc(head + body)
    return head[:22] + struct.pack("<I", crc) + head[26:] + body


def write_ogg(
    packets: list[tuple[bytes, int]],
    serial: int = 0x5CA1AB1E,
    max_segments: int = 255,
) -> bytes:
    """Mux ``(packet, granule)`` tuples into a single logical Ogg
    bitstream.  The granule of a page is the granule of the LAST
    packet that completes on it (-1 when none does).  First page is
    BOS, last is EOS; oversized packets span pages with the
    continuation flag."""
    if not packets:
        raise ValueError("ogg: nothing to mux")
    pages: list[bytes] = []
    seq = 0
    seg_table: list[int] = []
    body = bytearray()
    page_granule = -1
    page_continued = False  # does the ACCUMULATING page start mid-packet?

    def flush(hdr_extra: int = 0):
        nonlocal seq, seg_table, body, page_granule
        ht = (
            (0x01 if page_continued else 0)
            | (0x02 if seq == 0 else 0)
            | hdr_extra
        )
        pages.append(
            _page(seg_table, bytes(body), ht, page_granule, serial, seq)
        )
        seq += 1
        seg_table, body, page_granule = [], bytearray(), -1

    for pi, (pkt, granule) in enumerate(packets):
        # lacing: 255-segments + a final < 255 (0 when len % 255 == 0)
        lacing = [255] * (len(pkt) // 255) + [len(pkt) % 255]
        pos = 0
        for li, lv in enumerate(lacing):
            if len(seg_table) == max_segments:
                flush()
                # the next page continues THIS packet only when part
                # of it already went out; a break exactly on a packet
                # boundary starts the new page clean
                page_continued = li > 0
            seg_table.append(lv)
            body += pkt[pos:pos + lv]
            pos += lv
            if li == len(lacing) - 1:
                page_granule = granule
        if pi == len(packets) - 1:
            flush(hdr_extra=0x04)  # EOS
    return b"".join(pages)


def read_ogg(data: bytes) -> list[tuple[bytes, int]]:
    """Demux one logical bitstream → ``[(packet, page_granule)]``
    (granule of the page the packet COMPLETED on).  Raises on bad
    capture pattern / version / CRC / sequence gaps / truncation."""
    packets: list[tuple[bytes, int]] = []
    partial = bytearray()
    pos, expect_seq, serial = 0, 0, None
    saw_eos = False
    while pos < len(data):
        if data[pos:pos + 4] != b"OggS":
            raise ValueError("ogg: bad capture pattern")
        if len(data) < pos + 27:
            raise ValueError("ogg: truncated page header")
        version, htype = data[pos + 4], data[pos + 5]
        if version != 0:
            raise ValueError(f"ogg: unsupported version {version}")
        granule = struct.unpack("<q", data[pos + 6:pos + 14])[0]
        ser, seq = struct.unpack("<II", data[pos + 14:pos + 22])
        crc_stored = struct.unpack("<I", data[pos + 22:pos + 26])[0]
        nseg = data[pos + 26]
        seg_end = pos + 27 + nseg
        if len(data) < seg_end:
            raise ValueError("ogg: truncated lacing table")
        lacing = data[pos + 27:seg_end]
        body_len = sum(lacing)
        page_end = seg_end + body_len
        if len(data) < page_end:
            raise ValueError("ogg: truncated page body")
        page = bytearray(data[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc_stored:
            raise ValueError("ogg: page CRC mismatch")
        if serial is None:
            serial = ser
        elif ser != serial:
            raise ValueError("ogg: multiplexed streams not supported")
        if seq != expect_seq:
            raise ValueError(f"ogg: page sequence gap at {seq}")
        expect_seq += 1
        if htype & 0x01:
            if not partial:
                raise ValueError("ogg: continuation page without a packet")
        elif partial:
            raise ValueError("ogg: packet truncated at page boundary")
        body = data[seg_end:page_end]
        off = 0
        for lv in lacing:
            partial += body[off:off + lv]
            off += lv
            if lv < 255:
                packets.append((bytes(partial), granule))
                partial = bytearray()
        saw_eos = bool(htype & 0x04)
        pos = page_end
    if partial:
        raise ValueError("ogg: stream ends mid-packet")
    if not saw_eos:
        raise ValueError("ogg: missing EOS page")
    return packets


# --------------------------------------------------- FLAC-in-Ogg mapping

_FLAC_MAP_MAGIC = b"\x7fFLAC"


def mux_flac_ogg(
    header: bytes,
    frames: list[bytes],
    samples_per_frame: list[int],
    serial: int = 0x5CA1AB1E,
) -> bytes:
    """(fLaC header, frames) from :func:`flac.encode_flac_parts` → an
    Ogg-FLAC stream per the xiph mapping: BOS packet = 0x7F "FLAC"
    1.0 + n_header_packets(0) + the fLaC magic + STREAMINFO; one
    frame per audio packet, granule = samples completed."""
    if header[:4] != b"fLaC":
        raise ValueError("ogg-flac: not a FLAC header")
    if len(frames) != len(samples_per_frame):
        raise ValueError("ogg-flac: frame/sample-count mismatch")
    first = _FLAC_MAP_MAGIC + bytes([1, 0]) + struct.pack(">H", 0) + header
    packets = [(first, 0)]
    done = 0
    for frame, ns in zip(frames, samples_per_frame):
        done += ns
        packets.append((frame, done))
    return write_ogg(packets, serial=serial)


def demux_flac_ogg(data: bytes) -> bytes:
    """Ogg-FLAC stream → the equivalent native .flac byte stream
    (header + concatenated frames), ready for ``decode_flac``."""
    packets = read_ogg(data)
    if not packets:
        raise ValueError("ogg-flac: empty stream")
    first = packets[0][0]
    if first[:5] != _FLAC_MAP_MAGIC:
        raise ValueError("ogg-flac: BOS packet is not a FLAC mapping")
    major, n_hdr = first[5], struct.unpack(">H", first[7:9])[0]
    if major != 1:
        raise ValueError(f"ogg-flac: unsupported mapping version {major}")
    native = first[9:]
    if native[:4] != b"fLaC":
        raise ValueError("ogg-flac: BOS packet lacks the fLaC magic")
    # skip n_hdr metadata packets (none emitted by our mux; accept and
    # append any so foreign streams with VORBIS_COMMENT etc. still map)
    body = [native]
    for pkt, _g in packets[1 + n_hdr:]:
        body.append(pkt)
    for pkt, _g in packets[1:1 + n_hdr]:
        body.insert(1, pkt)
    return b"".join(body)

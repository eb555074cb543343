"""MPEG-1 program-stream (ISO/IEC 11172-1 "system") mux/demux — the
container that interleaves the repo's MPEG-1 video (sources/mpeg1.py)
and MPEG-1 audio Layer I/II (sources/mp2.py) elementary streams.

Exact from the public standard (ISO 11172-1 §2.4):
- pack layer: pack_start_code 0x000001BA followed by the 8-byte
  MPEG-1 pack header — '0010', the 33-bit system_clock_reference in
  3|15|15-bit fields with marker bits, and the 22-bit mux_rate
  (units of 50 bytes/s) between markers.
- system header 0x000001BB: header_length, rate_bound, audio_bound,
  fixed/CSPS/lock flags, video_bound, and one (stream_id, '11',
  STD_buffer_bound_scale, STD_buffer_size_bound) triple per stream.
- packet layer (MPEG-1 PES syntax, NOT the MPEG-2 PES header):
  0x000001 + stream_id + packet_length, then optional 0xFF stuffing,
  optional '01' + STD_buffer_scale + STD_buffer_size, then one of
  '0010'+PTS (5 bytes), '0011'+PTS+DTS (10 bytes), or the single
  no-timestamp byte 0x0F; the payload is the rest of the packet.
  private_stream_2 (0xBF) carries NO header fields — its payload
  starts right after packet_length.
- iso_11172_end_code 0x000001B9 terminates the stream.

Stream ids: video 0xE0-0xEF, audio 0xC0-0xDF, private_stream_1 0xBD,
padding 0xBE, private_stream_2 0xBF.

The muxer here is a deterministic sector-style packetizer (one pack
header per packet, VCD-like), round-robin across streams, PTS on the
first packet of each stream, SCR advancing at mux_rate.  The demuxer
is a single linear start-code walk with a hard output cap on
untrusted input (same contract as sources/archive.py's bomb guard).

Reference parity note: the reference engine (suaviloquence/
scrapelect) has no media layer; this container completes the MPEG-1
family (11172-1 system + 11172-2 video + 11172-3 audio) for the
corpus multimodal operators.  Scale shape: one row per stream through
Arrow-batched ``mapInPandas``; the demux is a linear pass, no state.
"""

from __future__ import annotations

PACK_START = 0x000001BA
SYSTEM_START = 0x000001BB
END_CODE = 0x000001B9

#: demux output cap (sum over all elementary streams) for untrusted
#: input — a packet_length-forged stream cannot expand past this.
_MAX_BYTES = 1 << 28

_CLOCK = 90_000  # system clock, ticks/s


def _scr_bytes(scr: int) -> bytes:
    """'0010' + SCR[32..30] m | SCR[29..15] m | SCR[14..0] m — the
    five marker-interleaved bytes of the MPEG-1 pack header clock."""
    scr &= (1 << 33) - 1
    b0 = 0b0010_0001 | (((scr >> 30) & 0x7) << 1)
    mid = ((scr >> 15) & 0x7FFF)
    low = scr & 0x7FFF
    return bytes((
        b0,
        (mid >> 7) & 0xFF, ((mid & 0x7F) << 1) | 1,
        (low >> 7) & 0xFF, ((low & 0x7F) << 1) | 1,
    ))


def _ts_bytes(prefix: int, ts: int) -> bytes:
    """5-byte PTS/DTS field: prefix ('0010' PTS-only, '0011' PTS of a
    PTS+DTS pair, '0001' DTS) + 33-bit ts in 3|15|15 with markers."""
    ts &= (1 << 33) - 1
    return bytes((
        (prefix << 4) | (((ts >> 30) & 0x7) << 1) | 1,
        (ts >> 22) & 0xFF, (((ts >> 15) & 0x7F) << 1) | 1,
        (ts >> 7) & 0xFF, ((ts & 0x7F) << 1) | 1,
    ))


def _parse_ts(data: bytes, pos: int) -> int:
    return (
        (((data[pos] >> 1) & 0x7) << 30)
        | (data[pos + 1] << 22) | ((data[pos + 2] >> 1) << 15)
        | (data[pos + 3] << 7) | (data[pos + 4] >> 1)
    )


def mux_ps(
    streams: dict[int, bytes],
    *,
    payload_size: int = 2048,
    mux_rate_bps: int = 1_200_000,
) -> bytes:
    """Interleave elementary streams into an MPEG-1 program stream.

    ``streams`` maps stream_id (0xE0.. video, 0xC0.. audio, 0xBD/0xBF
    private) to its elementary-stream bytes.  Packets are emitted
    round-robin in ascending stream_id order, ``payload_size`` bytes
    of payload each, one pack header per packet; the first packet of
    every stream carries PTS 0 ('0010' form), later packets the
    no-timestamp byte.  Deterministic output."""
    if not streams:
        raise ValueError("mpegps: no streams")
    for sid in streams:
        if not (0xBC <= sid <= 0xFF):
            raise ValueError(f"mpegps: invalid stream_id 0x{sid:02x}")
    if payload_size < 1 or payload_size > 0xFFF0:
        raise ValueError("mpegps: payload_size out of range")
    mux_rate = max(1, (mux_rate_bps + 399) // 400)  # 50-byte/s units

    out = bytearray()

    def pack_header(scr: int) -> None:
        out.extend(PACK_START.to_bytes(4, "big"))
        out.extend(_scr_bytes(scr))
        out.append(0x80 | ((mux_rate >> 15) & 0x7F))
        out.append((mux_rate >> 7) & 0xFF)
        out.append(((mux_rate & 0x7F) << 1) | 1)

    # leading pack + system header advertising every stream
    pack_header(0)
    sids = sorted(streams)
    body = bytearray()
    body.append(0x80 | ((mux_rate >> 15) & 0x7F))
    body.append((mux_rate >> 7) & 0xFF)
    body.append(((mux_rate & 0x7F) << 1) | 1)
    n_audio = sum(1 for s in sids if 0xC0 <= s <= 0xDF)
    n_video = sum(1 for s in sids if 0xE0 <= s <= 0xEF)
    body.append((n_audio << 2) | 0b01)  # audio_bound, fixed=0, CSPS=1
    body.append(0b0010_0000 | n_video)  # locks=0, marker, video_bound
    body.append(0xFF)  # reserved
    for sid in sids:
        # buffer bound: scale 1 (1024-byte units) size_bound 13 bits
        body.append(sid)
        body.append(0b1110_0000 | ((48 >> 8) & 0x1F))
        body.append(48 & 0xFF)
    out.extend(SYSTEM_START.to_bytes(4, "big"))
    out.extend(len(body).to_bytes(2, "big"))
    out.extend(body)

    cursors = {sid: 0 for sid in sids}
    sent_pts = {sid: False for sid in sids}
    scr = 0
    while any(cursors[sid] < len(streams[sid]) for sid in sids):
        for sid in sids:
            pos = cursors[sid]
            es = streams[sid]
            if pos >= len(es):
                continue
            chunk = es[pos:pos + payload_size]
            cursors[sid] = pos + len(chunk)
            scr += (len(chunk) * 8 * _CLOCK) // max(mux_rate * 400, 1)
            pack_header(scr)
            if sid == 0xBF:
                header = b""  # private_stream_2: no header fields
            elif not sent_pts[sid]:
                sent_pts[sid] = True
                header = _ts_bytes(0b0010, 0)
            else:
                header = b"\x0f"
            out.extend(b"\x00\x00\x01")
            out.append(sid)
            out.extend((len(header) + len(chunk)).to_bytes(2, "big"))
            out.extend(header)
            out.extend(chunk)
    out.extend(END_CODE.to_bytes(4, "big"))
    return bytes(out)


def demux_ps(
    data: bytes, *, max_bytes: int = _MAX_BYTES,
) -> tuple[dict[int, bytes], dict]:
    """Program stream → ({stream_id: elementary bytes}, meta).

    meta carries ``n_packs``, ``n_packets``, ``mux_rate_bps``, and
    ``pts`` ({stream_id: first PTS in 90 kHz ticks}).  Tolerates a
    missing end code (truncated tails stop at the last whole packet);
    raises on malformed pack/packet headers and on total payload
    exceeding ``max_bytes``."""
    es: dict[int, bytearray] = {}
    pts: dict[int, int] = {}
    n_packs = 0
    n_packets = 0
    mux_rate_bps = None
    total = 0
    pos = 0
    n = len(data)
    while True:
        nxt = data.find(b"\x00\x00\x01", pos)
        if nxt < 0 or nxt + 4 > n:
            break
        pos = nxt
        code = data[pos + 3]
        pos += 4
        if code == 0xBA:
            if pos + 8 > n:
                raise ValueError("mpegps: truncated pack header")
            if data[pos] >> 4 != 0b0010:
                raise ValueError("mpegps: not an MPEG-1 pack header")
            rate = (
                ((data[pos + 5] & 0x7F) << 15)
                | (data[pos + 6] << 7) | (data[pos + 7] >> 1)
            )
            if mux_rate_bps is None:
                mux_rate_bps = rate * 400
            n_packs += 1
            pos += 8
        elif code == 0xBB:
            if pos + 2 > n:
                raise ValueError("mpegps: truncated system header")
            pos += 2 + int.from_bytes(data[pos:pos + 2], "big")
        elif code == 0xB9:
            break
        elif 0xBC <= code <= 0xFF:
            if pos + 2 > n:
                raise ValueError("mpegps: truncated packet length")
            plen = int.from_bytes(data[pos:pos + 2], "big")
            pos += 2
            end = pos + plen
            if end > n:
                raise ValueError("mpegps: truncated packet payload")
            p = pos
            if code != 0xBF:  # private_stream_2 has no header fields
                while p < end and data[p] == 0xFF:
                    p += 1  # stuffing
                if p < end and data[p] >> 6 == 0b01:
                    p += 2  # STD buffer scale/size
                if p >= end:
                    raise ValueError("mpegps: packet header overruns")
                tag = data[p] >> 4
                if tag == 0b0010:
                    if p + 5 > end:
                        raise ValueError("mpegps: truncated PTS")
                    pts.setdefault(code, _parse_ts(data, p))
                    p += 5
                elif tag == 0b0011:
                    if p + 10 > end:
                        raise ValueError("mpegps: truncated PTS+DTS")
                    pts.setdefault(code, _parse_ts(data, p))
                    p += 10
                else:
                    if data[p] != 0x0F:
                        raise ValueError(
                            "mpegps: bad packet header flags"
                        )
                    p += 1
            payload = data[p:end]
            total += len(payload)
            if total > max_bytes:
                raise ValueError("mpegps: output exceeds max_bytes")
            es.setdefault(code, bytearray()).extend(payload)
            n_packets += 1
            pos = end
        else:
            # an elementary start code leaked to the top level
            raise ValueError(
                f"mpegps: unexpected start code 0x{code:02x} at pack level"
            )
    if not es and n_packs == 0:
        raise ValueError("mpegps: no packs or packets")
    meta = {
        "n_packs": n_packs,
        "n_packets": n_packets,
        "mux_rate_bps": mux_rate_bps,
        "pts": pts,
    }
    return {sid: bytes(b) for sid, b in es.items()}, meta


def is_ps(data: bytes) -> bool:
    """Cheap sniff: pack_start_code + MPEG-1 '0010' marker nibble."""
    return (
        len(data) >= 5
        and data[:4] == b"\x00\x00\x01\xba"
        and data[4] >> 4 == 0b0010
    )

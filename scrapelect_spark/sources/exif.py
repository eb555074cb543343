"""EXIF (TIFF/IFD) metadata reader + writer for JPEG APP1 segments.

A crawl-scale image corpus carries camera metadata that training
pipelines filter and stratify on (orientation for rotation-fixup,
capture time for dedup/decontamination windows, camera model for
source diversity).  This module parses the Exif APP1 payload — a TIFF
byte stream: ``II``/``MM`` byte order, magic 42, chained IFDs of
12-byte entries — from untrusted bytes with hard bounds checks, and
builds deterministic APP1 segments for the gate corpus.

Scope (the tags pipelines actually use): IFD0 Make/Model/Orientation/
DateTime, the EXIF sub-IFD (DateTimeOriginal, ISO, ExposureTime,
PixelXDimension/PixelYDimension).  Unknown tags are skipped by size,
never dereferenced.  Both byte orders are first-class (the gate
corpus alternates them).  Layout is from the public TIFF 6.0 / EXIF
specifications (also mirrored in every open EXIF tool).

Untrusted-input contract (same as sources/sitemap.py): offsets are
validated against the payload length before every read, IFD chains
are capped, and a malformed segment raises ``ValueError`` into the
operator's per-row error capture — it never reads out of bounds or
loops.
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

#: IFD0 tags
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
#: GPS IFD tags (EXIF 2.3 §4.6.6), stored in the parsed dict under
#: ``GPS_KEY_BASE | tag`` so they never collide with IFD0/EXIF tags
GPS_KEY_BASE = 0x10000
TAG_GPS_LAT_REF = 0x0001
TAG_GPS_LAT = 0x0002
TAG_GPS_LON_REF = 0x0003
TAG_GPS_LON = 0x0004
#: EXIF sub-IFD tags
TAG_EXPOSURE_TIME = 0x829A
TAG_ISO = 0x8827
TAG_DATETIME_ORIGINAL = 0x9003
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003

_MAX_IFDS = 8
_MAX_ENTRIES = 256

EXIF_HEADER = b"Exif\x00\x00"


def _read_ifd(data: bytes, off: int, bo: str, out: dict, depth: int,
              gps: bool = False) -> int:
    """Parse one IFD at ``off``; returns the next-IFD offset."""
    if depth > 2:
        raise ValueError("exif: IFD nesting too deep")
    if off + 2 > len(data):
        raise ValueError("exif: IFD offset out of bounds")
    (n,) = struct.unpack_from(bo + "H", data, off)
    if n > _MAX_ENTRIES:
        raise ValueError("exif: too many IFD entries")
    if off + 2 + 12 * n + 4 > len(data):
        raise ValueError("exif: IFD overruns payload")
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, off + 2 + 12 * i)
        voff = off + 2 + 12 * i + 8
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown type: skip, per TIFF 6.0 readers
        total = size * cnt
        if total > 4:
            (vpos,) = struct.unpack_from(bo + "I", data, voff)
            if vpos + total > len(data):
                raise ValueError("exif: value offset out of bounds")
        else:
            vpos = voff
        raw = data[vpos:vpos + total]
        if tag == TAG_EXIF_IFD and typ == 4 and not gps:
            (sub,) = struct.unpack_from(bo + "I", raw, 0)
            _read_ifd(data, sub, bo, out, depth + 1)
            continue
        if tag == TAG_GPS_IFD and typ == 4 and not gps:
            (sub,) = struct.unpack_from(bo + "I", raw, 0)
            _read_ifd(data, sub, bo, out, depth + 1, gps=True)
            continue
        key = (GPS_KEY_BASE | tag) if gps else tag
        if typ == 2:  # ASCII, NUL-terminated
            out[key] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == 3:
            out[key] = struct.unpack_from(bo + "H", raw, 0)[0]
        elif typ == 4:
            out[key] = struct.unpack_from(bo + "I", raw, 0)[0]
        elif typ == 5:
            if cnt >= 2:
                # multi-RATIONAL (GPS lat/lon triplets): tuple of pairs
                out[key] = tuple(
                    struct.unpack_from(bo + "II", raw, 8 * j)
                    for j in range(cnt)
                )
            else:
                num, den = struct.unpack_from(bo + "II", raw, 0)
                out[key] = (num, den)
    (nxt,) = struct.unpack_from(bo + "I", data, off + 2 + 12 * n)
    return nxt


def parse_tiff(data: bytes) -> dict[int, object]:
    """TIFF byte stream (as inside APP1, after ``Exif\\0\\0``) → tag
    dict (EXIF sub-IFD tags merged in)."""
    if len(data) < 8:
        raise ValueError("exif: truncated TIFF header")
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("exif: bad byte-order mark")
    (magic, first) = struct.unpack_from(bo + "HI", data, 2)
    if magic != 42:
        raise ValueError("exif: bad TIFF magic")
    out: dict[int, object] = {}
    seen = set()
    off = first
    for _ in range(_MAX_IFDS):
        if off == 0:
            return out
        if off in seen:
            raise ValueError("exif: IFD chain loop")
        seen.add(off)
        off = _read_ifd(data, off, bo, out, 0)
    raise ValueError("exif: IFD chain too long")


def parse_exif_jpeg(jpeg: bytes) -> dict[int, object]:
    """Walk the JPEG marker stream for an ``APP1 Exif`` segment and
    parse it.  Raises if the image has no EXIF payload."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG")
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError("exif: bad marker stream")
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # SOS: entropy data follows, no EXIF past here
            break
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(jpeg):
            raise ValueError("exif: segment overruns file")
        if marker == 0xE1 and jpeg[pos + 4:pos + 10] == EXIF_HEADER:
            return parse_tiff(jpeg[pos + 10:pos + 2 + seglen])
        pos += 2 + seglen
    raise ValueError("exif: no APP1 Exif segment")


# --- writer -----------------------------------------------------------


def _entry(bo: str, tag: int, typ: int, cnt: int, value_or_off: bytes) -> bytes:
    head = struct.pack(bo + "HHI", tag, typ, cnt)
    return head + value_or_off.ljust(4, b"\x00")[:4]


def build_tiff(fields: dict[int, object], byte_order: str = "II") -> bytes:
    """Deterministic TIFF stream with IFD0 + EXIF sub-IFD from a tag
    dict (the inverse of :func:`parse_tiff` for the supported tags)."""
    bo = "<" if byte_order == "II" else ">"
    ifd0_tags = {
        t: v
        for t, v in fields.items()
        if t in (TAG_MAKE, TAG_MODEL, TAG_ORIENTATION, TAG_DATETIME)
    }
    sub_tags = {
        t: v
        for t, v in fields.items()
        if t in (TAG_EXPOSURE_TIME, TAG_ISO, TAG_DATETIME_ORIGINAL,
                 TAG_PIXEL_X, TAG_PIXEL_Y)
    }
    gps_tags = {
        t & 0xFFFF: v for t, v in fields.items() if t >= GPS_KEY_BASE
    }

    def encode(tags: dict, base: int, extra_entries: int):
        """→ (entry blob list, overflow data, total size) with value
        offsets relative to ``base`` (the IFD's start)."""
        n = len(tags) + extra_entries
        data_off = base + 2 + 12 * n + 4
        entries, overflow = [], b""
        for tag in sorted(tags):
            v = tags[tag]
            if isinstance(v, str):
                raw = v.encode("ascii") + b"\x00"
                if len(raw) > 4:
                    entries.append(
                        _entry(bo, tag, 2, len(raw),
                               struct.pack(bo + "I", data_off + len(overflow)))
                    )
                    overflow += raw
                else:
                    entries.append(_entry(bo, tag, 2, len(raw), raw))
            elif isinstance(v, tuple) and v and isinstance(v[0], tuple):
                # multi-RATIONAL (GPS lat/lon deg-min-sec triplets)
                raw = b"".join(struct.pack(bo + "II", *p) for p in v)
                entries.append(
                    _entry(bo, tag, 5, len(v),
                           struct.pack(bo + "I", data_off + len(overflow)))
                )
                overflow += raw
            elif isinstance(v, tuple):  # RATIONAL
                raw = struct.pack(bo + "II", *v)
                entries.append(
                    _entry(bo, tag, 5, 1,
                           struct.pack(bo + "I", data_off + len(overflow)))
                )
                overflow += raw
            elif v < 0x10000 and tag != TAG_EXIF_IFD:
                entries.append(_entry(bo, tag, 3, 1, struct.pack(bo + "H", v)))
            else:
                entries.append(_entry(bo, tag, 4, 1, struct.pack(bo + "I", v)))
        return entries, overflow

    # IFD0 sits at offset 8; compute its size to place the sub-IFDs
    has_sub = 1 if sub_tags else 0
    has_gps = 1 if gps_tags else 0
    ifd0_entries, ifd0_overflow = encode(ifd0_tags, 8, has_sub + has_gps)
    ifd0_size = (
        2 + 12 * (len(ifd0_tags) + has_sub + has_gps) + 4 + len(ifd0_overflow)
    )
    sub_off = 8 + ifd0_size
    sub_blob = b""
    if has_sub:
        sub_entries, sub_overflow = encode(sub_tags, sub_off, 0)
        sub_blob = (
            struct.pack(bo + "H", len(sub_entries))
            + b"".join(sub_entries)
            + struct.pack(bo + "I", 0)
            + sub_overflow
        )
        ifd0_entries.append(
            _entry(bo, TAG_EXIF_IFD, 4, 1, struct.pack(bo + "I", sub_off))
        )
    gps_off = sub_off + len(sub_blob)
    gps_blob = b""
    if has_gps:
        gps_entries, gps_overflow = encode(gps_tags, gps_off, 0)
        gps_blob = (
            struct.pack(bo + "H", len(gps_entries))
            + b"".join(gps_entries)
            + struct.pack(bo + "I", 0)
            + gps_overflow
        )
        ifd0_entries.append(
            _entry(bo, TAG_GPS_IFD, 4, 1, struct.pack(bo + "I", gps_off))
        )
    if has_sub or has_gps:
        ifd0_entries.sort(key=lambda e: struct.unpack_from(bo + "H", e, 0)[0])
    out = bytearray()
    out += byte_order.encode("ascii")
    out += struct.pack(bo + "HI", 42, 8)
    out += struct.pack(bo + "H", len(ifd0_entries))
    out += b"".join(ifd0_entries)
    out += struct.pack(bo + "I", 0)  # no IFD1
    out += ifd0_overflow
    out += sub_blob
    out += gps_blob
    return bytes(out)


def insert_exif_jpeg(jpeg: bytes, tiff: bytes) -> bytes:
    """Insert an ``APP1 Exif`` segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG")
    payload = EXIF_HEADER + tiff
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("exif: APP1 payload too large")
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]


def strip_exif_jpeg(jpeg: bytes) -> bytes:
    """Remove the APP1 Exif segment (if any) from a JPEG."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG")
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError("exif: bad marker stream")
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:
            break
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(jpeg):
            raise ValueError("exif: segment overruns file")
        if marker == 0xE1 and jpeg[pos + 4:pos + 10] == EXIF_HEADER:
            return jpeg[:pos] + jpeg[pos + 2 + seglen:]
        pos += 2 + seglen
    return jpeg


def scrub_gps_jpeg(jpeg: bytes, byte_order: str = "II") -> tuple[bytes, bool]:
    """GPS-location privacy scrub: drop the GPS IFD from the EXIF
    payload, keep every other tag, leave the compressed image data
    untouched.  Returns ``(scrubbed_jpeg, had_gps)``; a JPEG without
    EXIF passes through unchanged."""
    try:
        fields = parse_exif_jpeg(jpeg)
    except ValueError:
        return jpeg, False
    had_gps = any(t >= GPS_KEY_BASE for t in fields)
    if not had_gps:
        return jpeg, False
    kept = {t: v for t, v in fields.items() if t < GPS_KEY_BASE}
    return (
        insert_exif_jpeg(strip_exif_jpeg(jpeg), build_tiff(kept, byte_order)),
        True,
    )


def apply_orientation(arr, orientation: int):
    """Undo a TIFF/EXIF orientation (tag 274) on an HxWxC pixel array —
    the transform that renders the stored data upright, matching the
    de-facto standard table (TIFF 6.0 §Orientation; same mapping as
    PIL's exif_transpose).  Returns a contiguous copy; orientation 1
    (or anything out of range → treated as malformed) must be handled
    by the caller — this raises on values outside 1..8."""
    import numpy as np

    if not 1 <= int(orientation) <= 8:
        raise ValueError(f"bad EXIF orientation {orientation}")
    o = int(orientation)
    if o == 1:
        out = arr
    elif o == 2:          # mirrored horizontally
        out = arr[:, ::-1]
    elif o == 3:          # rotated 180
        out = arr[::-1, ::-1]
    elif o == 4:          # mirrored vertically
        out = arr[::-1]
    elif o == 5:          # transposed (flip along TL-BR diagonal)
        out = arr.transpose(1, 0, 2)
    elif o == 6:          # rotated 90 CW to display
        out = np.rot90(arr, -1)
    elif o == 7:          # transverse (flip along TR-BL diagonal)
        out = arr.transpose(1, 0, 2)[::-1, ::-1]
    else:                 # 8: rotated 90 CCW to display
        out = np.rot90(arr, 1)
    return np.ascontiguousarray(out)

"""WARC 1.0 reader/writer — the industry-standard web-archive
container (ISO 28500; the format Common Crawl publishes).

A crawl engine speaks WARC in two directions: exporting fetched pages
as response records (one gzip member per record, the standard layout
that keeps segments seekable) and ingesting existing archives as a
page source.  Written from the public spec: CRLF header blocks,
``Content-Length`` exact body framing, ``WARC-Record-ID`` URNs, the
``application/http; msgtype=response`` payload convention, and the
two-CRLF record terminator.

Determinism: callers pass ``date`` explicitly (a crawl batch stamps
its own snapshot time); nothing here reads the wall clock, so record
bytes are a pure function of their inputs — the property every other
codec in this repo holds and the driver's oracle hashing relies on.
"""

from __future__ import annotations

import gzip
import hashlib
import io


_CRLF = b"\r\n"

#: cap on a decompressed WARC segment (segments are written one Arrow
#: batch at a time, well under this; only hostile input gets near it)
_MAX_SEGMENT_BYTES = 256 << 20


def _record_id(url: str, date: str, seq: int) -> str:
    h = hashlib.sha1(f"{url}|{date}|{seq}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def build_response_record(
    url: str,
    body: bytes,
    *,
    date: str,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    seq: int = 0,
) -> bytes:
    """One uncompressed WARC response record (headers + HTTP payload +
    the spec's two-CRLF terminator)."""
    http_head = (
        f"HTTP/1.1 {status} {'OK' if status == 200 else 'X'}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    payload = http_head + body
    digest = hashlib.sha1(body).hexdigest()
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Record-ID: {_record_id(url, date, seq)}\r\n"
        f"WARC-Payload-Digest: sha1:{digest}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + _CRLF + _CRLF


def write_warc_segment(
    pages,
    *,
    date: str,
    gzip_members: bool = True,
    info: dict | None = None,
) -> bytes:
    """``pages`` = iterable of (url, html_str_or_bytes[, status]) →
    one WARC segment: a warcinfo record followed by response records.
    With ``gzip_members`` each record is its own gzip member (the
    standard .warc.gz layout — members concatenate and remain
    independently decompressible, which is what makes a 100-TB archive
    splittable by record offset)."""
    fields = {"software": "scrapelect-spark", "format": "WARC File Format 1.0"}
    if info:
        fields.update(info)
    info_body = "".join(f"{k}: {v}\r\n" for k, v in fields.items()).encode()
    info_head = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Record-ID: {_record_id('warcinfo', date, -1)}\r\n"
        "Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(info_body)}\r\n\r\n"
    ).encode()
    records = [info_head + info_body + _CRLF + _CRLF]
    for seq, page in enumerate(pages):
        url, body = page[0], page[1]
        status = page[2] if len(page) > 2 else 200
        if isinstance(body, str):
            body = body.encode()
        records.append(
            build_response_record(url, body, date=date, status=status, seq=seq)
        )
    if not gzip_members:
        return b"".join(records)
    out = io.BytesIO()
    for rec in records:
        # mtime=0 keeps member bytes deterministic
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
            gz.write(rec)
    return out.getvalue()


def _parse_headers(block: bytes) -> dict:
    lines = block.split(_CRLF)
    if not lines or not lines[0].startswith(b"WARC/"):
        raise ValueError("not a WARC record header")
    headers = {"__version__": lines[0].decode()}
    for ln in lines[1:]:
        if not ln:
            continue
        if b":" not in ln:
            raise ValueError(f"malformed WARC header line {ln[:40]!r}")
        k, v = ln.split(b":", 1)
        headers[k.strip().decode().lower()] = v.strip().decode()
    return headers


def read_warc(data: bytes):
    """WARC bytes (plain or multi-member gzip) → list of
    ``(headers_dict, payload_bytes)``.  Header keys lowercased;
    ``Content-Length`` framing is enforced exactly."""
    if data[:2] == b"\x1f\x8b":
        import zlib

        try:
            with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
                # gzip module iterates members transparently; cap the
                # decompressed side so a hostile segment can't bomb
                # executor memory (ADVICE r4: same cap as fetch stage)
                out = gz.read(_MAX_SEGMENT_BYTES + 1)
            if len(out) > _MAX_SEGMENT_BYTES:
                raise ValueError(
                    f"gzip segment inflates past {_MAX_SEGMENT_BYTES} bytes"
                )
            data = out
        except (OSError, EOFError, zlib.error) as e:
            raise ValueError(f"corrupt gzip segment: {e}") from None
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"WARC/":
            raise ValueError(f"expected WARC record at byte {pos}")
        end = data.find(_CRLF + _CRLF, pos)
        if end < 0:
            raise ValueError("truncated WARC header block")
        headers = _parse_headers(data[pos:end])
        try:
            ln = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing/invalid Content-Length") from None
        body_start = end + 4
        if body_start + ln > n:
            raise ValueError("truncated WARC payload")
        out.append((headers, data[body_start : body_start + ln]))
        pos = body_start + ln
        if data[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError("missing WARC record terminator")
        pos += 4
    return out


def split_http_response(payload: bytes):
    """``application/http; msgtype=response`` payload → (status, body)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        raise ValueError("not an HTTP response payload")
    status_line = payload[: payload.find(_CRLF)].decode(errors="replace")
    parts = status_line.split(" ", 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError(f"bad HTTP status line {status_line!r}")
    return int(parts[1]), payload[sep + 4 :]

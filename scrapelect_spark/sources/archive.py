"""ZIP / TAR / TAR.GZ member extraction — the bulk-drop ingestion
containers (datasets shipped as ``images.zip`` / ``corpus.tar.gz``
are how image+caption corpora most often arrive before they ever see
a WARC).

Format detection is by magic bytes, not filename: ZIP local-file
signature ``PK\\x03\\x04`` (or the empty-archive/central-directory
forms), gzip ``\\x1f\\x8b`` (treated as a compressed tar), and the
POSIX ustar magic at offset 257 with the checksummed-header fallback
for pre-POSIX tars.  Parsing is stdlib ``zipfile`` / ``tarfile``
over in-memory buffers — members are only ever READ into bytes,
never extracted to paths, so tar path-traversal tricks are inert by
construction; hostile names (absolute, ``..`` components) are
rejected anyway, as are encrypted ZIP members.

Untrusted-input caps (the ADVICE r4 discipline): member count,
per-member decompressed size, and whole-archive decompressed total
are all bounded BEFORE decompression work happens — ``zipfile``
reads are capped at ``size + 1`` so a lying header (zip bomb) trips
the cap instead of exhausting memory.

Scale shape: one archive row → many member rows through Arrow-batched
``mapInPandas`` (operators/warc_io.py:archive_extract); no shuffle,
no state, partition-parallel across archives — the same contract as
the WARC/sitemap/codec paths.
"""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile
import zlib

_MAX_MEMBERS = 10_000
_MAX_MEMBER_BYTES = 64 << 20
_MAX_TOTAL_BYTES = 256 << 20


def sniff_archive(data: bytes) -> str | None:
    """'zip' | 'tar' | 'tar.gz' | None by magic bytes."""
    if data[:4] in (b"PK\x03\x04", b"PK\x05\x06", b"PK\x07\x08"):
        return "zip"
    if data[:2] == b"\x1f\x8b":
        return "tar.gz"
    if len(data) >= 263 and data[257:263] in (b"ustar\x00", b"ustar "):
        return "tar"  # POSIX ustar / GNU tar magic
    if len(data) >= 512 and _tar_checksum_ok(data[:512]):
        return "tar"
    return None


def _tar_checksum_ok(block: bytes) -> bool:
    """Pre-POSIX tar detection: the 8-byte octal checksum at offset
    148 must equal the header-byte sum with the checksum field taken
    as spaces."""
    field = block[148:156]
    try:
        want = int(field.replace(b"\x00", b" ").strip() or b"0", 8)
    except ValueError:
        return False
    got = sum(block[:148]) + 8 * 0x20 + sum(block[156:])
    return want != 0 and want == got


def _check_name(name: str) -> str | None:
    """None if the member name is safe, else the rejection reason."""
    if name.startswith(("/", "\\")) or (len(name) > 1 and name[1] == ":"):
        return "absolute path"
    if ".." in name.replace("\\", "/").split("/"):
        return "path traversal"
    return None


def read_archive_members(
    data: bytes,
    max_members: int = _MAX_MEMBERS,
    max_member_bytes: int = _MAX_MEMBER_BYTES,
    max_total_bytes: int = _MAX_TOTAL_BYTES,
) -> list[tuple[str, bytes]]:
    """Archive blob → [(member name, member bytes)], in archive order
    (directories skipped).  Raises ValueError on unknown formats,
    hostile names, encrypted members, or any exceeded cap."""
    kind = sniff_archive(data)
    if kind is None:
        raise ValueError("archive: unrecognized container format")
    if kind == "zip":
        return _read_zip(data, max_members, max_member_bytes,
                         max_total_bytes)
    if kind == "tar.gz":
        # bounded decompress of the gzip layer first (gzip bombs must
        # trip the cap, not exhaust memory)
        gz = gzip.GzipFile(fileobj=io.BytesIO(data))
        try:
            raw = gz.read(max_total_bytes + 1)
        except (OSError, EOFError, zlib.error) as e:
            raise ValueError(f"archive: bad gzip layer ({e})") from e
        if len(raw) > max_total_bytes:
            raise ValueError("archive: decompressed tar exceeds cap")
        data = raw
    return _read_tar(data, max_members, max_member_bytes, max_total_bytes)


def _read_zip(data, max_members, max_member_bytes, max_total_bytes):
    out = []
    total = 0
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        infos = zf.infolist()
    except (zipfile.BadZipFile, NotImplementedError, OSError) as e:
        # NotImplementedError: unknown extract_version / compression
        raise ValueError(f"archive: bad zip ({e})") from e
    if len(infos) > max_members:
        raise ValueError("archive: too many members")
    for info in infos:
        if info.is_dir():
            continue
        reason = _check_name(info.filename)
        if reason:
            raise ValueError(
                f"archive: rejected member name ({reason}): "
                f"{info.filename!r}"
            )
        if info.flag_bits & 0x1:
            raise ValueError(
                f"archive: encrypted member: {info.filename!r}"
            )
        try:
            with zf.open(info) as f:
                body = f.read(max_member_bytes + 1)
                # a header lying about its size is a bomb signature:
                # read one byte past the cap rather than trusting it
                if len(body) > max_member_bytes:
                    raise ValueError("archive: member exceeds size cap")
        except (
            zipfile.BadZipFile, NotImplementedError, EOFError, OSError,
            zlib.error,
        ) as e:
            # NotImplementedError: exotic/mutated compression methods;
            # EOFError/OSError/zlib.error: corrupt deflate streams
            raise ValueError(f"archive: bad zip member ({e})") from e
        total += len(body)
        if total > max_total_bytes:
            raise ValueError("archive: archive exceeds total size cap")
        out.append((info.filename, body))
    return out


def _read_tar(data, max_members, max_member_bytes, max_total_bytes):
    out = []
    total = 0
    try:
        tf = tarfile.open(fileobj=io.BytesIO(data), mode="r:")
    except tarfile.TarError as e:
        raise ValueError(f"archive: bad tar ({e})") from e
    with tf:
        for member in tf:
            if len(out) >= max_members:
                raise ValueError("archive: too many members")
            if not member.isfile():
                continue  # dirs, links, devices: never materialized
            reason = _check_name(member.name)
            if reason:
                raise ValueError(
                    f"archive: rejected member name ({reason}): "
                    f"{member.name!r}"
                )
            if member.size > max_member_bytes:
                raise ValueError("archive: member exceeds size cap")
            f = tf.extractfile(member)
            if f is None:
                continue
            body = f.read(max_member_bytes + 1)
            if len(body) > max_member_bytes:
                raise ValueError("archive: member exceeds size cap")
            total += len(body)
            if total > max_total_bytes:
                raise ValueError("archive: archive exceeds total size cap")
            out.append((member.name, body))
    return out


def build_zip(members: list[tuple[str, bytes]], compress: bool = True) -> bytes:
    """Deterministic ZIP writer for tests/gates (fixed timestamp)."""
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        for name, body in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = method
            zf.writestr(info, body)
    return buf.getvalue()


def build_tar(
    members: list[tuple[str, bytes]], gz: bool = False
) -> bytes:
    """Deterministic tar / tar.gz writer for tests/gates."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, body in members:
            info = tarfile.TarInfo(name)
            info.size = len(body)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(body))
    raw = buf.getvalue()
    if gz:
        out = io.BytesIO()
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as g:
            g.write(raw)
        return out.getvalue()
    return raw

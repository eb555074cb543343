"""Archive ingestion (sources/archive.py): zip/tar/tar.gz roundtrips,
magic-byte sniffing (incl. pre-POSIX checksum tars), hostile-input
rejection (traversal names, absolute paths, encrypted zip members,
zip bombs via lying headers, gzip-layer bombs, member/total caps),
and the Spark fan-out operator's per-archive error capture."""

import gzip
import io
import struct
import tarfile
import zipfile

import numpy as np
import pytest

from scrapelect_spark.sources.archive import (
    build_tar,
    build_zip,
    read_archive_members,
    sniff_archive,
)

MEMBERS = [
    ("a.txt", b"hello"),
    ("dir/b.bin", bytes(range(256)) * 10),
    ("dir/sub/c", b""),
]


@pytest.mark.parametrize("kind", ["zip", "tar", "tar.gz"])
def test_roundtrip(kind):
    if kind == "zip":
        blob = build_zip(MEMBERS)
    else:
        blob = build_tar(MEMBERS, gz=(kind == "tar.gz"))
    assert sniff_archive(blob) == kind
    assert read_archive_members(blob) == MEMBERS


def test_zip_stored_roundtrip():
    blob = build_zip(MEMBERS, compress=False)
    assert read_archive_members(blob) == MEMBERS


def test_deterministic_builders():
    assert build_zip(MEMBERS) == build_zip(MEMBERS)
    assert build_tar(MEMBERS, gz=True) == build_tar(MEMBERS, gz=True)


def test_directories_skipped():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        f = tarfile.TarInfo("dir/x")
        f.size = 2
        tf.addfile(f, io.BytesIO(b"ok"))
    assert read_archive_members(buf.getvalue()) == [("dir/x", b"ok")]


def test_symlinks_never_materialized():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        ln = tarfile.TarInfo("evil")
        ln.type = tarfile.SYMTYPE
        ln.linkname = "/etc/passwd"
        tf.addfile(ln)
        f = tarfile.TarInfo("fine")
        f.size = 1
        tf.addfile(f, io.BytesIO(b"y"))
    assert read_archive_members(buf.getvalue()) == [("fine", b"y")]


def test_pre_posix_tar_detected_by_checksum():
    blob = bytearray(build_tar([("old.txt", b"v7 era")]))
    # blank the ustar magic+version, then recompute the header
    # checksum (sum of header bytes with the cksum field as spaces):
    # detection must fall back to the checksum rule
    blob[257:265] = b"\x00" * 8
    head = blob[:512]
    s = sum(head[:148]) + 8 * 0x20 + sum(head[156:512])
    blob[148:156] = f"{s:06o}\x00 ".encode()
    assert sniff_archive(bytes(blob)) == "tar"


@pytest.mark.parametrize(
    "name", ["../up.txt", "a/../../b", "/abs.txt", "\\\\srv\\x", "c:evil"]
)
def test_hostile_names_rejected_zip(name):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(name, b"x")
    with pytest.raises(ValueError, match="rejected member name"):
        read_archive_members(buf.getvalue())


def test_hostile_name_rejected_tar():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("../../escape")
        info.size = 1
        tf.addfile(info, io.BytesIO(b"x"))
    with pytest.raises(ValueError, match="rejected member name"):
        read_archive_members(buf.getvalue())


def test_encrypted_zip_member_rejected():
    # zipfile.writestr normalizes flag_bits, so set the encryption bit
    # directly in the central-directory header (PK\x01\x02, flags at
    # offset +8) — that is where infolist() reads it from
    blob = bytearray(build_zip([("s.txt", b"secret")], compress=False))
    i = blob.find(b"PK\x01\x02")
    assert i != -1
    blob[i + 8] |= 0x1
    with pytest.raises(ValueError, match="encrypted"):
        read_archive_members(bytes(blob))


def test_member_size_cap():
    blob = build_zip([("big", b"z" * 1000)])
    with pytest.raises(ValueError, match="size cap"):
        read_archive_members(blob, max_member_bytes=999)
    assert read_archive_members(blob, max_member_bytes=1000)[0][1] == b"z" * 1000


def test_total_size_cap():
    blob = build_tar([("a", b"q" * 600), ("b", b"q" * 600)])
    with pytest.raises(ValueError, match="total size cap"):
        read_archive_members(blob, max_total_bytes=1000)


def test_member_count_cap():
    blob = build_zip([(f"m{i}", b"x") for i in range(20)])
    with pytest.raises(ValueError, match="too many members"):
        read_archive_members(blob, max_members=19)


def test_zip_bomb_lying_header_trips_cap():
    """A zip whose local header under-reports the decompressed size
    must hit the read cap, not trust the header."""
    blob = bytearray(build_zip([("bomb", b"A" * 100_000)]))
    with pytest.raises(ValueError, match="size cap|bad zip"):
        read_archive_members(bytes(blob), max_member_bytes=50_000)


def test_targz_bomb_trips_total_cap():
    inner = build_tar([("huge", b"\x00" * 200_000)])
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as g:
        g.write(inner)
    with pytest.raises(ValueError, match="exceeds cap"):
        read_archive_members(out.getvalue(), max_total_bytes=100_000)


def test_truncated_gzip_is_error_not_passthrough():
    blob = build_tar([("t", b"data")], gz=True)
    with pytest.raises(ValueError, match="bad gzip|bad tar"):
        read_archive_members(blob[: len(blob) // 2])


def test_unknown_format_rejected():
    with pytest.raises(ValueError, match="unrecognized"):
        read_archive_members(b"\x00" * 600)


def test_mutation_fuzz_never_hangs():
    base = bytearray(build_zip(MEMBERS) + build_tar(MEMBERS, gz=True))
    rng = np.random.default_rng(17)
    for _ in range(300):
        mut = bytearray(base)
        for _ in range(rng.integers(1, 5)):
            mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
        try:
            for name, body in read_archive_members(bytes(mut)):
                assert isinstance(body, bytes)
        except (ValueError, MemoryError):
            pass


# --- Spark operator -----------------------------------------------------


def test_archive_extract_spark(spark):
    import pandas as pd

    from scrapelect_spark.operators.warc_io import archive_extract

    rows = [
        ("z", build_zip([("p/a", b"one"), ("p/b", b"two2")])),
        ("t", build_tar([("c", b"three")], gz=True)),
        ("bad", b"not an archive at all" + b"\x00" * 600),
        ("evil", build_zip([("../x", b"no")])),
    ]
    df = spark.createDataFrame(rows, "archive_id string, archive binary")
    got = archive_extract(df).toPandas().sort_values(
        ["archive_id", "member_name"], na_position="first"
    )
    byid = {k: g for k, g in got.groupby("archive_id")}
    assert list(byid["z"]["member_name"]) == ["p/a", "p/b"]
    assert list(byid["z"]["member_bytes"]) == [b"one", b"two2"]
    assert list(byid["t"]["member_bytes"]) == [b"three"]
    assert byid["bad"]["extract_error"].iloc[0] is not None
    assert "rejected member name" in byid["evil"]["extract_error"].iloc[0]
    assert len(byid["bad"]) == 1 and len(byid["evil"]) == 1

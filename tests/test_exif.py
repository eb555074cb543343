"""EXIF (TIFF/IFD) codec tests: roundtrip both byte orders, JPEG
marker-walk, and the untrusted-input bounds checks — plus the phash
near-dup banding invariants (pigeonhole exactness at the bit level).

Hand-built hostile streams follow the repo's foreign-feature pattern
(see tests/test_gif.py / test_flac.py): every error path is driven by
bytes the writer cannot produce.
"""

import struct

import numpy as np
import pytest

from scrapelect_spark.sources import exif as E
from scrapelect_spark.sources.jpeg import encode_jpeg


FIELDS = {
    E.TAG_MAKE: "CamCo 3",
    E.TAG_MODEL: "M-7",
    E.TAG_ORIENTATION: 6,
    E.TAG_DATETIME: "2021:05:06 07:08:09",
    E.TAG_ISO: 1600,
    E.TAG_PIXEL_X: 128,
    E.TAG_PIXEL_Y: 96,
    E.TAG_EXPOSURE_TIME: (1, 250),
    E.TAG_DATETIME_ORIGINAL: "2020:01:02 03:04:05",
}


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_tiff_roundtrip(bo):
    tags = E.parse_tiff(E.build_tiff(FIELDS, bo))
    assert tags[E.TAG_MAKE] == "CamCo 3"
    assert tags[E.TAG_MODEL] == "M-7"
    assert tags[E.TAG_ORIENTATION] == 6
    assert tags[E.TAG_DATETIME] == "2021:05:06 07:08:09"
    assert tags[E.TAG_ISO] == 1600
    assert tags[E.TAG_PIXEL_X] == 128
    assert tags[E.TAG_PIXEL_Y] == 96
    assert tags[E.TAG_EXPOSURE_TIME] == (1, 250)
    assert tags[E.TAG_DATETIME_ORIGINAL] == "2020:01:02 03:04:05"


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_jpeg_insert_and_parse(bo):
    jpeg = encode_jpeg(np.full((16, 16, 3), 99, np.uint8))
    tagged = E.insert_exif_jpeg(jpeg, E.build_tiff(FIELDS, bo))
    tags = E.parse_exif_jpeg(tagged)
    assert tags[E.TAG_MODEL] == "M-7"
    assert tags[E.TAG_ISO] == 1600


def test_jpeg_without_exif_raises():
    jpeg = encode_jpeg(np.full((16, 16, 3), 99, np.uint8))
    with pytest.raises(ValueError, match="no APP1 Exif"):
        E.parse_exif_jpeg(jpeg)


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="not a JPEG"):
        E.parse_exif_jpeg(b"\x89PNG....")
    with pytest.raises(ValueError, match="not a JPEG"):
        E.insert_exif_jpeg(b"GIF89a", b"")


def test_short_string_stays_inline():
    # a 3-byte ASCII value (incl. NUL) fits the 4-byte entry slot —
    # exercises the inline branch the long strings above skip
    tags = E.parse_tiff(E.build_tiff({E.TAG_MAKE: "ab"}, "II"))
    assert tags[E.TAG_MAKE] == "ab"


# --- hostile streams -----------------------------------------------------


def test_truncated_header():
    with pytest.raises(ValueError, match="truncated"):
        E.parse_tiff(b"II\x2a\x00")


def test_bad_byte_order_mark():
    with pytest.raises(ValueError, match="byte-order"):
        E.parse_tiff(b"XX" + struct.pack("<HI", 42, 8))


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        E.parse_tiff(b"II" + struct.pack("<HI", 43, 8))


def test_ifd_offset_out_of_bounds():
    with pytest.raises(ValueError, match="out of bounds"):
        E.parse_tiff(b"II" + struct.pack("<HI", 42, 10_000))


def test_ifd_overruns_payload():
    # header claims 100 entries but the payload ends immediately
    data = b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", 100)
    with pytest.raises(ValueError, match="overruns"):
        E.parse_tiff(data)


def test_value_offset_out_of_bounds():
    # one ASCII entry whose 8-byte value lives at offset 60000
    entry = struct.pack("<HHI", E.TAG_MAKE, 2, 8) + struct.pack("<I", 60_000)
    data = (b"II" + struct.pack("<HI", 42, 8)
            + struct.pack("<H", 1) + entry + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="value offset"):
        E.parse_tiff(data)


def test_ifd_chain_loop():
    # IFD0's next-IFD pointer points back at IFD0
    data = (b"II" + struct.pack("<HI", 42, 8)
            + struct.pack("<H", 0) + struct.pack("<I", 8))
    with pytest.raises(ValueError, match="loop"):
        E.parse_tiff(data)


def test_sub_ifd_nesting_bomb():
    # EXIF-pointer entry that points at its own IFD → depth cap trips
    entry = struct.pack("<HHI", E.TAG_EXIF_IFD, 4, 1) + struct.pack("<I", 8)
    data = (b"II" + struct.pack("<HI", 42, 8)
            + struct.pack("<H", 1) + entry + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="deep"):
        E.parse_tiff(data)


def test_unknown_type_skipped():
    # type 99 doesn't exist; a strict reader skips the entry
    bad = struct.pack("<HHI", 0x9999, 99, 1) + b"\x00" * 4
    good = struct.pack("<HHI", E.TAG_ORIENTATION, 3, 1) + struct.pack("<HH", 5, 0)
    data = (b"II" + struct.pack("<HI", 42, 8)
            + struct.pack("<H", 2) + bad + good + struct.pack("<I", 0))
    tags = E.parse_tiff(data)
    assert tags == {E.TAG_ORIENTATION: 5}


def test_segment_overruns_file():
    # APP1 length field larger than the remaining bytes
    jpeg = b"\xff\xd8\xff\xe1" + struct.pack(">H", 5000) + b"Exif\x00\x00"
    with pytest.raises(ValueError, match="overruns"):
        E.parse_exif_jpeg(jpeg)


def test_oversized_app1_rejected_at_build():
    jpeg = encode_jpeg(np.full((8, 8, 3), 50, np.uint8))
    with pytest.raises(ValueError, match="too large"):
        E.insert_exif_jpeg(jpeg, b"\x00" * 70_000)


# --- phash near-dup banding ----------------------------------------------


def test_phash_neardup_validation():
    from scrapelect_spark.operators.imagemeta import phash_neardup

    with pytest.raises(ValueError, match="pigeonhole"):
        phash_neardup(None, max_hamming=8, n_bands=8)
    with pytest.raises(ValueError, match="divide"):
        phash_neardup(None, max_hamming=3, n_bands=7)


def test_phash_neardup_pigeonhole_worst_case(spark):
    """Adversarial Hamming-7 pair: the 7 flipped bits land in 7
    DISTINCT bands, leaving exactly one clean band — the banding must
    still surface the pair (pigeonhole exactness, not luck).  An
    8-bit pair with every band dirty must NOT appear."""
    from scrapelect_spark.operators.imagemeta import phash_neardup

    base = 0x123456789ABCDEF0
    h7 = base
    for band in range(7):  # flip bit 0 of bands 0..6
        h7 ^= 1 << (8 * band)
    h8 = base
    for band in range(8):  # flip bits 1+2 of EVERY band: Hamming 16
        h8 ^= 0b110 << (8 * band)  # from base, 23 from h7 — every band dirty

    def signed(v):
        return v - (1 << 64) if v >= 1 << 63 else v

    rows = [(0, signed(base)), (1, signed(h7)), (2, signed(h8)),
            (3, signed(0x0F0F0F0F0F0F0F0F))]
    df = spark.createDataFrame(rows, "doc_id long, phash long")
    got = {(r.doc_a, r.doc_b)
           for r in phash_neardup(df, max_hamming=7).collect()}
    assert got == {(0, 1)}


# ------------------------------------------------------- orientation


def test_apply_orientation_mappings():
    import numpy as np

    from scrapelect_spark.sources.exif import apply_orientation

    a = np.arange(2 * 3 * 1, dtype=np.int64).reshape(2, 3, 1)
    # stored array: [[0,1,2],[3,4,5]] — hand-computed upright results
    exp = {
        1: [[0, 1, 2], [3, 4, 5]],
        2: [[2, 1, 0], [5, 4, 3]],            # mirror horizontal
        3: [[5, 4, 3], [2, 1, 0]],            # rotate 180
        4: [[3, 4, 5], [0, 1, 2]],            # mirror vertical
        5: [[0, 3], [1, 4], [2, 5]],          # transpose
        6: [[3, 0], [4, 1], [5, 2]],          # 90 CW
        7: [[5, 2], [4, 1], [3, 0]],          # transverse
        8: [[2, 5], [1, 4], [0, 3]],          # 90 CCW
    }
    for o, want in exp.items():
        got = apply_orientation(a, o)[:, :, 0].tolist()
        assert got == want, (o, got)

    # mirrors and 180 are involutions; 6∘8 is identity
    for o in (2, 3, 4, 5, 7):
        assert (
            apply_orientation(apply_orientation(a, o), o) == a
        ).all(), o
    assert (apply_orientation(apply_orientation(a, 6), 8) == a).all()

    import pytest as _pytest

    for bad in (0, 9, -1):
        with _pytest.raises(ValueError):
            apply_orientation(a, bad)


def test_gps_ifd_roundtrip_both_byte_orders():
    from scrapelect_spark.sources import exif as E

    fields = {
        E.TAG_MAKE: "CamCo",
        E.GPS_KEY_BASE | E.TAG_GPS_LAT_REF: "N",
        E.GPS_KEY_BASE | E.TAG_GPS_LAT: ((40, 1), (26, 1), (4612, 100)),
        E.GPS_KEY_BASE | E.TAG_GPS_LON_REF: "W",
        E.GPS_KEY_BASE | E.TAG_GPS_LON: ((79, 1), (58, 1), (5600, 100)),
    }
    for bo in ("II", "MM"):
        back = E.parse_tiff(E.build_tiff(fields, bo))
        assert back[E.GPS_KEY_BASE | E.TAG_GPS_LAT] == (
            (40, 1), (26, 1), (4612, 100)
        )
        assert back[E.GPS_KEY_BASE | E.TAG_GPS_LON_REF] == "W"
        assert back[E.TAG_MAKE] == "CamCo"


def test_scrub_gps_preserves_tags_and_pixels():
    import numpy as np

    from scrapelect_spark.sources import exif as E
    from scrapelect_spark.sources.jpeg import decode_jpeg, encode_jpeg

    rgb = np.full((16, 16, 3), 99, np.uint8)
    j = E.insert_exif_jpeg(
        encode_jpeg(rgb),
        E.build_tiff({
            E.TAG_MAKE: "X",
            E.TAG_ISO: 400,
            E.GPS_KEY_BASE | E.TAG_GPS_LAT_REF: "S",
            E.GPS_KEY_BASE | E.TAG_GPS_LAT: ((1, 1), (2, 1), (3, 1)),
        }),
    )
    scrubbed, had = E.scrub_gps_jpeg(j)
    assert had
    back = E.parse_exif_jpeg(scrubbed)
    assert not any(t >= E.GPS_KEY_BASE for t in back)
    assert back[E.TAG_MAKE] == "X" and back[E.TAG_ISO] == 400
    assert (decode_jpeg(scrubbed) == decode_jpeg(j)).all()
    again, had2 = E.scrub_gps_jpeg(scrubbed)
    assert not had2 and again == scrubbed


def test_scrub_gps_passthrough_without_exif():
    import numpy as np

    from scrapelect_spark.sources import exif as E
    from scrapelect_spark.sources.jpeg import encode_jpeg

    j = encode_jpeg(np.full((8, 8, 3), 10, np.uint8))
    out, had = E.scrub_gps_jpeg(j)
    assert not had and out == j

"""WARC reader/writer tests (sources/warc.py) + Spark export/ingest."""

import gzip

import numpy as np
import pytest

from scrapelect_spark.sources.warc import (
    build_response_record,
    read_warc,
    split_http_response,
    write_warc_segment,
)

DATE = "2024-03-04T05:06:07Z"


def test_record_structure_and_framing():
    rec = build_response_record(
        "http://a.test/x", b"<html>hi</html>", date=DATE
    )
    assert rec.startswith(b"WARC/1.0\r\n")
    assert rec.endswith(b"\r\n\r\n")
    (headers, payload), = read_warc(rec)
    assert headers["warc-type"] == "response"
    assert headers["warc-target-uri"] == "http://a.test/x"
    assert headers["warc-date"] == DATE
    assert headers["warc-record-id"].startswith("<urn:uuid:")
    status, body = split_http_response(payload)
    assert status == 200 and body == b"<html>hi</html>"


def test_segment_roundtrip_plain_and_gzip():
    pages = [(f"http://h.test/p{i}", f"<html><h1>{i}</h1></html>") for i in range(7)]
    for gz in (False, True):
        seg = write_warc_segment(pages, date=DATE, gzip_members=gz)
        recs = read_warc(seg)
        assert recs[0][0]["warc-type"] == "warcinfo"
        got = []
        for h, p in recs[1:]:
            status, body = split_http_response(p)
            got.append((h["warc-target-uri"], body.decode()))
        assert got == pages


def test_gzip_members_are_independent():
    """Each record is its own gzip member: cutting the stream at a
    member boundary still yields decompressible prefixes (the property
    that makes .warc.gz splittable)."""
    pages = [("http://h.test/a", "aaa"), ("http://h.test/b", "bbb")]
    seg = write_warc_segment(pages, date=DATE)
    # locate the second member by scanning for the gzip magic
    second = seg.index(b"\x1f\x8b", 2)
    first_member = gzip.decompress(seg[:second])
    assert first_member.startswith(b"WARC/1.0")
    # and byte-determinism (mtime=0): same input → same bytes
    assert seg == write_warc_segment(pages, date=DATE)


def test_body_bytes_exact_including_crlf_content():
    """A body that itself contains CRLFCRLF must survive — framing is
    by Content-Length, never by scanning."""
    tricky = b"x\r\n\r\nWARC/1.0\r\n\r\nend"
    rec = build_response_record("http://t.test/", tricky, date=DATE)
    (h, p), = read_warc(rec)
    _, body = split_http_response(p)
    assert body == tricky


def test_non_200_status():
    rec = build_response_record("http://t.test/m", b"gone", date=DATE, status=404)
    (_, p), = read_warc(rec)
    status, body = split_http_response(p)
    assert status == 404 and body == b"gone"


@pytest.mark.parametrize("mutilate", [
    lambda b: b[10:],                     # no WARC/ magic
    lambda b: b[:-6],                     # missing terminator
    lambda b: b.replace(b"Content-Length", b"Content-Lemon", 1),
])
def test_corrupt_records_raise_valueerror(mutilate):
    rec = build_response_record("http://t.test/", b"abc", date=DATE)
    with pytest.raises(ValueError):
        read_warc(mutilate(rec))


def test_mutation_fuzz():
    seg = write_warc_segment(
        [("http://h.test/x", "hello world " * 20)], date=DATE
    )
    rng = np.random.default_rng(5)
    for _ in range(200):
        b = bytearray(seg)
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 256))
        try:
            read_warc(bytes(b))
        except (ValueError, EOFError, OSError):  # gzip raises OSError
            pass


# ---------------------------------------------------------------- Spark


def test_export_ingest_roundtrip_spark(spark):
    from scrapelect_spark.operators.warc_io import warc_export, warc_ingest

    rows = [(f"http://h.test/p{i}", f"<html><h1>{i}</h1>body {i}</html>")
            for i in range(50)]
    pages = spark.createDataFrame(rows, "url string, html string").repartition(4)
    segs = warc_export(pages, date=DATE)
    seg_rows = segs.collect()
    assert sum(r.n_records for r in seg_rows) == 50
    assert len(seg_rows) >= 1
    back = warc_ingest(segs)
    got = {(r.url, r.html) for r in back.collect()}
    assert got == set(rows)
    assert back.filter("ingest_error IS NOT NULL").count() == 0


def test_ingest_error_capture_spark(spark):
    from scrapelect_spark.operators.warc_io import warc_ingest

    bad = spark.createDataFrame([(b"not a warc",)], "segment binary")
    rows = warc_ingest(bad).collect()
    assert len(rows) == 1 and rows[0].ingest_error is not None


# -------------------------------------------------------------- sitemaps


def test_sitemap_urlset_fields():
    from scrapelect_spark.sources.sitemap import build_sitemap, parse_sitemap

    entries = [
        {"loc": "http://a.test/1", "priority": "0.8", "lastmod": "2024-01-02",
         "changefreq": "daily"},
        {"loc": "http://a.test/2"},
    ]
    kind, got = parse_sitemap(build_sitemap(entries))
    assert kind == "urlset"
    assert got[0]["loc"] == "http://a.test/1" and got[0]["priority"] == 0.8
    assert got[0]["lastmod"] == "2024-01-02" and got[0]["changefreq"] == "daily"
    assert got[1]["priority"] is None


def test_sitemap_gzip_roundtrip():
    from scrapelect_spark.sources.sitemap import build_sitemap, parse_sitemap

    blob = build_sitemap([{"loc": "http://z.test/"}], gzip_payload=True)
    assert blob[:2] == b"\x1f\x8b"
    kind, got = parse_sitemap(blob)
    assert kind == "urlset" and got[0]["loc"] == "http://z.test/"


def test_sitemap_index():
    from scrapelect_spark.sources.sitemap import parse_sitemap

    xml = (
        '<?xml version="1.0"?>'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>http://h.test/s1.xml</loc></sitemap>"
        "<sitemap><loc>http://h.test/s2.xml.gz</loc></sitemap>"
        "</sitemapindex>"
    ).encode()
    kind, locs = parse_sitemap(xml)
    assert kind == "sitemapindex"
    assert locs == ["http://h.test/s1.xml", "http://h.test/s2.xml.gz"]


def test_sitemap_dtd_rejected():
    from scrapelect_spark.sources.sitemap import parse_sitemap

    evil = b'<?xml version="1.0"?><!DOCTYPE lolz [<!ENTITY a "b">]><urlset/>'
    with pytest.raises(ValueError, match="DTD"):
        parse_sitemap(evil)


@pytest.mark.parametrize("junk", [b"<notxml", b"<html></html>", b"\x1f\x8b\x00bad"])
def test_sitemap_malformed_raises(junk):
    from scrapelect_spark.sources.sitemap import parse_sitemap

    with pytest.raises(ValueError):
        parse_sitemap(junk)


def test_sitemap_seed_frontier_spark(spark):
    import pandas as pd
    from scrapelect_spark.operators.warc_io import sitemap_seed_frontier
    from scrapelect_spark.sources.sitemap import build_sitemap

    good = build_sitemap([
        {"loc": "http://a.test/1", "priority": "0.8"},
        {"loc": "http://a.test/2"},
    ])
    index = (
        '<?xml version="1.0"?>'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>http://a.test/child.xml</loc></sitemap></sitemapindex>"
    ).encode()
    df = spark.createDataFrame(
        pd.DataFrame({
            "sitemap_id": ["g", "i", "bad"],
            "sitemap": [good, index, b"<garbage"],
        })
    )
    rows = sitemap_seed_frontier(df).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.sitemap_id, []).append(r)
    assert {(r.url, r.priority) for r in by_id["g"]} == {
        ("http://a.test/1", 20), ("http://a.test/2", 50)
    }
    assert by_id["i"][0].child_sitemap == "http://a.test/child.xml"
    assert by_id["bad"][0].parse_error is not None


def test_robots_sitemap_directive():
    """Sitemap: lines are host-wide (outside UA groups) and surface on
    the parsed rules regardless of which UA group matched."""
    from scrapelect_spark.streaming.robots import parse_robots

    txt = (
        "Sitemap: http://h.test/sitemap.xml\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "User-agent: scrapelect\n"
        "Disallow: /tmp/\n"
        "Sitemap: http://h.test/sitemap2.xml.gz\n"
    )
    rules = parse_robots(txt)
    assert rules.sitemaps == [
        "http://h.test/sitemap.xml", "http://h.test/sitemap2.xml.gz"
    ]
    assert not rules.allowed("/tmp/x")  # the specific group still won
    generic = parse_robots(txt, user_agent="otherbot")
    assert generic.sitemaps == rules.sitemaps
    assert not generic.allowed("/private/x")


# ------------------------------------------------------------ RSS/Atom


def test_feed_rss_atom_roundtrip():
    from scrapelect_spark.sources.feed import (
        build_atom,
        build_rss,
        parse_feed,
    )

    items = [
        {"link": "http://x.test/a", "title": "A story",
         "published": "2024-01-02", "id": "g1"},
        {"link": "http://x.test/b", "title": "B",
         "published": None, "id": None},
    ]
    kind, got = parse_feed(build_rss(items))
    assert kind == "rss"
    assert got[0]["link"] == "http://x.test/a"
    assert got[0]["title"] == "A story" and got[0]["id"] == "g1"
    assert got[1]["published"] is None

    kind, got = parse_feed(build_atom(items))
    assert kind == "atom"
    assert [e["link"] for e in got] == ["http://x.test/a", "http://x.test/b"]

    # gzip payload
    kind, got = parse_feed(build_rss(items, gzip_payload=True))
    assert kind == "rss" and len(got) == 2


def test_feed_atom_link_rel_selection():
    from scrapelect_spark.sources.feed import parse_feed

    atom = (
        b'<?xml version="1.0"?>'
        b'<feed xmlns="http://www.w3.org/2005/Atom"><entry>'
        b'<link rel="self" href="http://x.test/self"/>'
        b'<link rel="alternate" href="http://x.test/alt"/>'
        b"<title>t</title><updated>2024-02-03</updated>"
        b"</entry></feed>"
    )
    kind, got = parse_feed(atom)
    assert kind == "atom" and got[0]["link"] == "http://x.test/alt"
    assert got[0]["published"] == "2024-02-03"


def test_feed_rejections():
    import pytest as _p

    from scrapelect_spark.sources.feed import parse_feed

    with _p.raises(ValueError, match="DTD"):
        parse_feed(b'<?xml version="1.0"?><!DOCTYPE rss [<!ENTITY a "b">]>'
                   b"<rss><channel></channel></rss>")
    with _p.raises(ValueError, match="malformed"):
        parse_feed(b"<rss><channel>")
    with _p.raises(ValueError, match="not an RSS"):
        parse_feed(b"<html></html>")
    with _p.raises(ValueError, match="channel"):
        parse_feed(b'<rss version="2.0"></rss>')

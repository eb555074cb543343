"""End-to-end freshness recrawl over a loopback HTTP server:
seed a validator store from a first crawl, mutate the server, then
run a RecrawlPass and assert the full contract —

- unchanged pages with validators are revalidated with a 304 (the
  conditional header went on the wire, no body came back);
- unchanged pages WITHOUT validator support are refetched but
  classified unchanged by content hash (no re-extraction);
- changed pages are re-extracted, their validators + hash advance,
  and change_count increments for them ONLY;
- deleted pages classify dead and keep their stored hash;
- store rows outside the budget pass through untouched.
"""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from scrapelect_spark.sources.fetch import HttpFetcher
from scrapelect_spark.streaming.recrawl import STORE_COLS, RecrawlPass

ETAG_V1 = '"stable-v1"'
ETAG_V2 = '"changed-v2"'

PROG = 'title: h1 { t: $element | text(); } | take(key: "t");'


@pytest.fixture()
def server():
    state = {"changed_version": 1}
    log = []
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, body: bytes, etag: str | None):
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            if etag:
                self.send_header("ETag", etag)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            with lock:
                log.append((self.path, self.headers.get("If-None-Match")))
            inm = self.headers.get("If-None-Match")
            if self.path == "/stable.html":
                if inm == ETAG_V1:
                    self.send_response(304)
                    self.end_headers()
                    return
                self._send(b"<html><h1>stable</h1></html>", ETAG_V1)
            elif self.path == "/noval.html":
                # no validator support: always a full 200, same body
                self._send(b"<html><h1>noval</h1></html>", None)
            elif self.path == "/changed.html":
                v = state["changed_version"]
                etag = ETAG_V1 if v == 1 else ETAG_V2
                if inm == etag:
                    self.send_response(304)
                    self.end_headers()
                    return
                self._send(
                    b"<html><h1>changed v%d</h1></html>" % v, etag
                )
            elif self.path == "/gone.html" and state["changed_version"] == 1:
                self._send(b"<html><h1>gone soon</h1></html>", None)
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield srv, state, log, lock
    finally:
        srv.shutdown()


def test_recrawl_pass_end_to_end(spark, server):
    srv, state, log, lock = server
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    fetcher = HttpFetcher(timeout_s=5.0, crawl_delay_s=0.0, revalidate=True)

    # -- round 1: seed the store from an unconditional fetch --------
    seeds = spark.createDataFrame(
        [(f"{base}/{p}",) for p in
         ("stable.html", "noval.html", "changed.html", "gone.html")],
        "url string",
    )
    first = fetcher.fetch(seeds).collect()
    assert all(r.status == 200 for r in first)
    import hashlib

    # change_count=1: each page has one observed change on record, so
    # every live row outscores the parked row's 0 (the priority score
    # is age x change_rate — a never-changed page scores 0)
    store = spark.createDataFrame(
        [
            (r.url, r.etag, r.last_modified,
             hashlib.md5(r.html.encode("utf-8")).hexdigest(), 1, 1, 1000)
            for r in first
        ],
        "url string, etag string, last_modified string, content_hash string,"
        " change_count long, crawl_count long, last_fetch_ts long",
    )
    # an out-of-budget row that must pass through byte-identically
    parked = spark.createDataFrame(
        [(f"{base}/parked.html", None, None, "deadbeef", 0, 1, 999_999_999)],
        "url string, etag string, last_modified string, content_hash string,"
        " change_count long, crawl_count long, last_fetch_ts long",
    )
    store = store.unionByName(parked)

    # -- mutate the server, run the pass -----------------------------
    state["changed_version"] = 2
    with lock:
        log.clear()
    rp = RecrawlPass(spark, fetcher, program=PROG, budget=4,
                     fetch_partitions=4, salt_buckets=2)
    new_store, outcomes, records = rp.run(store, now_s=5000)
    new_rows = {r.url.rsplit("/", 1)[1]: r for r in new_store.collect()}
    out_rows = {r.url.rsplit("/", 1)[1]: r for r in outcomes.collect()}
    rec_rows = records.collect()

    # parked row was never selected (change_count=0 ⇒ score 0, below
    # every live row) and is untouched
    with lock:
        paths = [p for p, _ in log]
    assert "/parked.html" not in paths
    pk = new_rows["parked.html"]
    assert (pk.content_hash, pk.change_count, pk.crawl_count,
            pk.last_fetch_ts) == ("deadbeef", 0, 1, 999_999_999)

    # stable: revalidated via 304 — conditional header on the wire
    assert out_rows["stable.html"].outcome == "unchanged"
    assert out_rows["stable.html"].status == 304
    with lock:
        assert ("/stable.html", ETAG_V1) in log
    st = new_rows["stable.html"]
    assert st.etag == ETAG_V1 and st.change_count == 1 and st.crawl_count == 2
    assert st.last_fetch_ts == 5000

    # noval: full 200 but hash-identical ⇒ unchanged, no extraction
    assert out_rows["noval.html"].outcome == "unchanged"
    assert out_rows["noval.html"].status == 200
    nv = new_rows["noval.html"]
    assert nv.change_count == 1 and nv.crawl_count == 2

    # changed: stale validator ⇒ 200 with new body ⇒ changed,
    # validators + hash advance, change_count bumps
    assert out_rows["changed.html"].outcome == "changed"
    ch = new_rows["changed.html"]
    assert ch.etag == ETAG_V2 and ch.change_count == 2 and ch.crawl_count == 2
    assert ch.content_hash != store.filter(
        store.url.endswith("changed.html")
    ).collect()[0].content_hash

    # gone: 404 ⇒ dead; stored hash kept, attempt still counted
    assert out_rows["gone.html"].outcome == "dead"
    gn = new_rows["gone.html"]
    assert gn.change_count == 1 and gn.crawl_count == 2
    assert gn.content_hash == store.filter(
        store.url.endswith("gone.html")
    ).collect()[0].content_hash

    # extraction ran over the changed slice ONLY
    assert len(rec_rows) == 1
    assert rec_rows[0].url.endswith("changed.html")
    assert rec_rows[0].kind == "record"
    assert "changed v2" in rec_rows[0].value

    # store schema is closed under the pass
    assert new_store.columns == list(STORE_COLS)


def test_recrawl_second_pass_converges(spark, server):
    """After a pass absorbs the change, the NEXT pass revalidates
    everything alive with 304/hash matches — zero changed rows, zero
    re-extractions: the steady state a freshness loop must reach."""
    srv, state, log, lock = server
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    fetcher = HttpFetcher(timeout_s=5.0, crawl_delay_s=0.0, revalidate=True)
    seeds = spark.createDataFrame(
        [(f"{base}/stable.html",), (f"{base}/changed.html",)], "url string"
    )
    import hashlib

    store = spark.createDataFrame(
        [
            (r.url, r.etag, r.last_modified,
             hashlib.md5(r.html.encode("utf-8")).hexdigest(), 1, 1, 1000)
            for r in fetcher.fetch(seeds).collect()
        ],
        "url string, etag string, last_modified string, content_hash string,"
        " change_count long, crawl_count long, last_fetch_ts long",
    )
    state["changed_version"] = 2
    rp = RecrawlPass(spark, fetcher, program=PROG, budget=10,
                     fetch_partitions=2, salt_buckets=2)
    store2, out1, rec1 = rp.run(store, now_s=5000)
    assert sorted(r.outcome for r in out1.collect()) == ["changed", "unchanged"]
    assert rec1.count() == 1

    store2 = spark.createDataFrame(store2.collect(), store2.schema)
    store3, out2, rec2 = rp.run(store2, now_s=9000)
    assert [r.outcome for r in out2.collect()] == ["unchanged", "unchanged"]
    assert all(r.status == 304 for r in out2.collect())  # zero bodies moved
    assert rec2.count() == 0
    assert all(r.crawl_count == 3 and r.change_count in (1, 2)
               for r in store3.collect())


def test_recrawl_priority_threshold_path_is_exact(spark):
    """The large-budget threshold cut (approx_percentile cutoff +
    boundary TakeOrdered) must select EXACTLY the same set as the
    plain (score desc, id) orderBy+limit — including id tie-breaks
    at the cutoff score.  The history is built with heavy score
    collisions (score = f(id % 97)) so the cutoff lands inside a
    large tie group."""
    from pyspark.sql import functions as F

    from scrapelect_spark.operators import relational as rel

    n, budget = 120_000, 30_000
    hist = spark.range(n).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        (100 + (F.col("id") % 97) * 37).cast("long").alias("age_s"),
        (1 + F.col("id") % 5).cast("long").alias("change_count"),
        (1 + F.col("id") % 9).cast("long").alias("crawl_count"),
    )
    assert budget > rel._TOPK_DRIVER_MAX  # exercises the threshold path
    got = rel.recrawl_priority(hist, budget, id_col="url")
    want = (
        hist.withColumn(
            "score",
            F.expr("CAST(age_s * change_count * 1000 AS BIGINT) DIV crawl_count"),
        )
        .orderBy(F.desc("score"), "url")
        .limit(budget)
    )
    got_set = {r.url for r in got.select("url").collect()}
    want_set = {r.url for r in want.select("url").collect()}
    assert len(got_set) == budget
    assert got_set == want_set


def test_recrawl_priority_threshold_path_budget_covers_all(spark):
    from pyspark.sql import functions as F

    from scrapelect_spark.operators.relational import recrawl_priority

    hist = spark.range(500).select(
        F.col("id").alias("url").cast("string"),
        F.lit(100).cast("long").alias("age_s"),
        F.lit(1).cast("long").alias("change_count"),
        F.lit(1).cast("long").alias("crawl_count"),
    )
    assert recrawl_priority(hist, 50_000, id_col="url").count() == 500

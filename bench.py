"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus crawl
and extraction throughput on a synthetic corpus.

Prints ONE JSON line:
  {"metric": ..., "value": <total headline seconds>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "crawl_pages_per_sec": ..., "extract_pages_per_sec": ...}

Scaling evidence (N vs 4N cores) lives in scripts/scaling_bench.py →
BENCH/BASELINE.md; this script is the per-round timing probe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

def force(df) -> int:
    """Fully materialize a plan without driver-side data transfer."""
    df.write.format("noop").mode("overwrite").save()
    return 0


REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def bench_queries(spark) -> tuple[dict[str, float], dict[str, float]]:
    """Every gate query is benched — a regression in any CORRECTNESS
    row is visible round-over-round (VERDICT r1 'what's wrong' #5).

    Noise control (VERDICT r2 item #8): per-query best-of-REPS after a
    warm run; returns (best, spread) where spread = max-min across the
    timed reps, so round-over-round deltas are attributable (host
    steal-time swings wall clock ±40% here)."""
    from scrapelect_spark.operators.catalog import QUERIES

    best: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        # warm with the SAME materialization as the timed reps: a
        # count() alone leaves persisted indexes / codegen partially
        # cold and the first timed rep reads 2x steady state
        # (BENCH/BASELINE.md round-3 watch item)
        force(fn(spark, SF_DIR))
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            force(fn(spark, SF_DIR))
            reps.append(time.perf_counter() - t0)
        best[name] = round(min(reps), 3)
        spread[name] = round(max(reps) - min(reps), 3)
    return best, spread


def bench_extract(spark, n_pages: int = 4000) -> float:
    """scrp extraction throughput (pages/sec) over synthetic pages."""
    from scrapelect_spark.operators.extract import extract

    rows = []
    for i in range(n_pages):
        items = "".join(
            f'<li class="it"><a href="/l{j}">item {j}</a><span>v{j}</span></li>'
            for j in range(20)
        )
        rows.append(
            (
                f"http://bench.test/p{i}",
                f"<html><body><h1>Page {i}</h1><ul>{items}</ul></body></html>",
            )
        )
    pages = spark.createDataFrame(rows, ["url", "html"]).repartition(int(CPUS)).cache()
    pages.count()
    # warm python workers + imports so the timed run is steady-state
    force(extract(pages.limit(64), "w: h1 { t: $element | text(); };"))
    program = (
        "title: h1 { t: $element | text(); } | take(key: \"t\");\n"
        "items: li.it {\n"
        "    link: a { href: $element | attrs() | take(key: \"href\"); "
        "t: $element | text(); };\n"
        "}*;\n"
    )
    t0 = time.perf_counter()
    force(extract(pages, program))
    dt = time.perf_counter() - t0
    pages.unpersist()
    return round(n_pages / dt, 1)


def _make_corpus(n_hosts: int, per_host: int) -> dict[str, str]:
    corpus = {}
    for h in range(n_hosts):
        for p in range(per_host):
            links = "".join(
                f'<a href="http://h{(h + k) % n_hosts}.test/p/{(p * 5 + k) % per_host}">x</a>'
                for k in range(6)
            )
            corpus[f"http://h{h}.test/p/{p}"] = (
                f"<html><body><h1>{h}/{p}</h1>{links}</body></html>"
            )
    return corpus


def _run_crawl(spark, tmpdir, *, n_hosts, per_host, batch_size, per_host_limit,
               seed_stride, max_batches) -> float:
    from scrapelect_spark.streaming.crawl import Crawler, CrawlConfig

    corpus = _make_corpus(n_hosts, per_host)
    corpus_df = spark.createDataFrame(list(corpus.items()), ["url", "html"])
    cfg = CrawlConfig(
        batch_size=batch_size,
        per_host_limit=per_host_limit,
        max_depth=12,
        buckets=16,
        bloom_bits_per_bucket=1 << 18,
        fetch_partitions=int(CPUS),
    )
    # seed one wave's worth of URLs so every measured batch is full
    # (steady-state throughput, not ramp-up scheduling overhead)
    seeds = [
        (f"http://h{h}.test/p/{p}", 1)
        for h in range(n_hosts)
        for p in range(0, per_host, seed_stride)
    ]
    crawler = Crawler(
        spark,
        tmpdir,
        corpus_df,
        seeds,
        program='title: h1 { t: $element | text(); } | take(key: "t");',
        config=cfg,
    )
    t0 = time.perf_counter()
    crawler.run(max_batches=max_batches)
    dt = time.perf_counter() - t0
    fetched = crawler.root.current_snapshot()["metrics"]["next_page_seq"]
    return round(fetched / dt, 1)


class _RevalidateStubFetcher:
    """Corpus-join stand-in for HttpFetcher(revalidate=True): resolves
    each claimed URL to a prebuilt (html, status, validators) row —
    benches the ENGINE side of a recrawl pass (top-k selection,
    classification, store update, changed-slice re-extraction) with
    the network taken out."""

    def __init__(self, responses):
        self.responses = responses

    def fetch(self, claimed):
        # plain url-key join, NOT broadcast: the responses table is
        # store-sized, and serializing it through the driver per pass
        # is a fixed serial cost that poisons the scaling measurement
        # (the real fetcher does per-row network I/O here instead)
        return claimed.drop("etag", "last_modified").join(
            self.responses, on="url", how="left"
        )


def bench_recrawl(spark, n_urls: int = 100_000, budget: int = 20_000) -> float:
    """Freshness-pass throughput (attempted URLs/sec) over a
    100k-row validator store: 85% revalidate (304), 10% changed
    (re-extracted), 5% dead — the steady-state mix of a production
    freshness loop."""
    from scrapelect_spark.streaming.recrawl import RecrawlPass

    store = (
        spark.range(n_urls)
        .select(
            F.concat(
                F.lit("http://h"), (F.col("id") % 64).cast("string"),
                F.lit(".test/d/"), F.col("id").cast("string"),
            ).alias("url"),
            F.concat(F.lit('"e'), F.col("id").cast("string"), F.lit('"')).alias("etag"),
            F.lit(None).cast("string").alias("last_modified"),
            F.md5(F.col("id").cast("string")).alias("content_hash"),
            (1 + F.col("id") % 5).cast("long").alias("change_count"),
            (1 + F.col("id") % 9).cast("long").alias("crawl_count"),
            (F.col("id") % 3600).cast("long").alias("last_fetch_ts"),
        )
        # hash-partitioned BY URL on the shuffle-partition count — the
        # sandbox stand-in for the production store being a url-bucketed
        # table: the pass's url-key joins (fetch resolve, untouched
        # anti-join) then reuse this layout instead of reshuffling the
        # full store every pass
        .repartition(max(int(CPUS), 8), "url")
        .cache()
    )
    m = F.abs(F.hash("url")) % 100
    responses = (
        store.select("url", "etag")
        .withColumn(
            "status",
            F.when(m < 85, 304).when(m < 95, 200).otherwise(404),
        )
        .select(
            "url",
            F.when(
                F.col("status") == 200,
                F.concat(F.lit("<html><h1>changed "), F.col("url"), F.lit("</h1></html>")),
            ).alias("html"),
            "status",
            F.when(F.col("status") != 404, F.col("etag")).alias("etag"),
            F.lit(None).cast("string").alias("last_modified"),
        )
        .cache()
    )
    store.count(), responses.count()
    rp = RecrawlPass(
        spark,
        _RevalidateStubFetcher(responses),
        program='t: h1 { x: $element | text(); } | take(key: "x");',
        budget=budget,
        fetch_partitions=int(CPUS),
    )

    def one_pass() -> float:
        t0 = time.perf_counter()
        new_store, outcomes, records = rp.run(
            store, now_s=10_000, store_rows=n_urls
        )
        force(records)
        force(new_store)
        return time.perf_counter() - t0

    one_pass()  # warm
    dt = min(one_pass() for _ in range(2))
    store.unpersist(), responses.unpersist()
    return round(budget / dt, 1)


def bench_crawl(spark, tmpdir: str) -> float:
    """Micro-batch crawl throughput (pages/sec) incl. checkpointing —
    small (600-page) batches, dominated by per-batch fixed overhead."""
    return _run_crawl(
        spark, tmpdir, n_hosts=8, per_host=250, batch_size=600,
        per_host_limit=100, seed_stride=4, max_batches=4,
    )


def bench_crawl_bigbatch(spark, tmpdir: str) -> float:
    """Production-shaped batches (12k pages/batch): the ~4-5s/batch
    scheduler+commit fixed cost amortizes, so pages/sec approaches the
    pure extraction path (BENCH/BASELINE.md §2.2 amortization claim)."""
    return _run_crawl(
        spark, tmpdir, n_hosts=16, per_host=2000, batch_size=12_000,
        per_host_limit=1000, seed_stride=2, max_batches=3,
    )


def compact_stdout_line(out: dict, budget: int = 1900) -> str:
    """Serialize the bench record to one stdout line of at most
    ``budget`` chars (the driver tails 2000 chars of stdout; clipping
    the head loses the whole record — VERDICT r3 #3 / r4 #1). Compact
    separators first; if still over budget, drop the FASTEST queries
    from the stdout dict (the full dict is always in
    BENCH/bench_latest_full.json) and say how many were dropped."""
    out = dict(out, queries=dict(out["queries"]))
    n_total = len(out["queries"])
    line = json.dumps(out, separators=(",", ":"))
    by_time = sorted(out["queries"], key=lambda k: out["queries"][k])
    while len(line) > budget and by_time:
        out["queries"].pop(by_time.pop(0))
        out["queries_omitted"] = (
            "fastest %d of %d in BENCH/bench_latest_full.json"
            % (n_total - len(out["queries"]), n_total)
        )
        line = json.dumps(out, separators=(",", ":"))
    assert len(line) <= budget, len(line)
    return line


def main() -> None:
    import tempfile

    from scrapelect_spark.session import get_spark

    spark = get_spark(app_name="scrapelect-bench", cpus=CPUS)
    queries, spread = bench_queries(spark)
    extract_pps = bench_extract(spark)
    recrawl_ups = bench_recrawl(spark)
    with tempfile.TemporaryDirectory() as td:
        crawl_pps = bench_crawl(spark, td)
    with tempfile.TemporaryDirectory() as td:
        crawl_big_pps = bench_crawl_bigbatch(spark, td)
    out = {
        "metric": "suite wall sec (lower=better)",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in queries.items()},
        "bench_reps": REPS,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": int(CPUS),
        "crawl_pages_per_sec": crawl_pps,
        "crawl_bigbatch_pages_per_sec": crawl_big_pps,
        "extract_pages_per_sec": extract_pps,
        "recrawl_urls_per_sec": recrawl_ups,
    }
    # Full record (3-decimal times + per-query spread) goes to a file;
    # stdout carries ONE compact line. The driver captures only the last
    # 2000 chars of stdout: round 3's spread-laden line and round 4's
    # 2032-char "compact" line both clipped the head and recorded
    # "parsed": null. Hard budget: compact separators, 2-decimal times,
    # and if the line would still exceed _STDOUT_BUDGET, drop the
    # fastest queries from the stdout dict (they remain in the file).
    _STDOUT_BUDGET = 1900
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    try:
        os.makedirs(bench_dir, exist_ok=True)
        with open(os.path.join(bench_dir, "bench_latest_full.json"), "w") as f:
            json.dump(
                {**out, "queries": queries, "queries_spread": spread}, f, indent=1
            )
    except OSError:
        pass
    print(compact_stdout_line(out, _STDOUT_BUDGET), flush=True)


if __name__ == "__main__":
    main()

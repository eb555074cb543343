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

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "top_events_per_user",
    "events_hourly_counts",
    "frontier_new_urls",
    "perhost_politeness_topk",
    "dedup_exact",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "dedup_jaccard_adjacent",
    "text_token_stats",
    "text_fingerprint",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
]


def force(df) -> int:
    """Fully materialize a plan without driver-side data transfer."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def bench_queries(spark) -> dict[str, float]:
    from scrapelect_spark.operators.catalog import QUERIES

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        fn(spark, SF_DIR).count()  # warm: plan + scan caches
        t0 = time.perf_counter()
        force(fn(spark, SF_DIR))
        times[name] = round(time.perf_counter() - t0, 3)
    return times


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


def bench_crawl(spark, tmpdir: str) -> float:
    """Micro-batch crawl throughput (pages/sec) incl. checkpointing."""
    from scrapelect_spark.streaming.crawl import Crawler, CrawlConfig

    n_hosts, per_host = 8, 250
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
    corpus_df = spark.createDataFrame(list(corpus.items()), ["url", "html"])
    cfg = CrawlConfig(
        batch_size=600,
        per_host_limit=100,
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
        for p in range(0, per_host, 4)
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
    crawler.run(max_batches=4)
    dt = time.perf_counter() - t0
    fetched = crawler.root.current_snapshot()["metrics"]["next_page_seq"]
    return round(fetched / dt, 1)


def main() -> None:
    import tempfile

    from scrapelect_spark.session import get_spark

    spark = get_spark(app_name="scrapelect-bench", cpus=CPUS)
    queries = bench_queries(spark)
    extract_pps = bench_extract(spark)
    with tempfile.TemporaryDirectory() as td:
        crawl_pps = bench_crawl(spark, td)
    out = {
        "metric": "headline query suite wall seconds (lower=better); "
        "crawl/extract throughput in extra keys (higher=better)",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": int(CPUS),
        "crawl_pages_per_sec": crawl_pps,
        "extract_pages_per_sec": extract_pps,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

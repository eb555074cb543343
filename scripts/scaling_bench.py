"""Two-cluster-size scaling evidence (north_rule: throughput scaling
efficiency ≥0.8 from N to 4N executors).

Sandbox proxy per the driver instruction: run the SAME job on the SAME
input at local[N] and local[4N] (each in a fresh JVM via subprocess so
core counts are honest), report throughput at both plus efficiency
  eff = (T_N / T_4N) / 4        (time ratio over core ratio)

Jobs measured:
- crawl: micro-batch loop over a synthetic multi-host corpus
  (pages/sec end-to-end incl. checkpoint commits)
- extract: scrp extraction over cached pages (pages/sec)
- q1: TPC-H Q1 at $SPARK_GRAFT_SF_DIR (rows/sec of lineitem scanned)

Writes BENCH/scaling.json and prints it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, %(repo)r)
cpus = %(cpus)d
os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
from scrapelect_spark.session import get_spark
spark = get_spark(app_name=f"scaling-{cpus}", cpus=cpus)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

out = {}

# --- extract ---
from scrapelect_spark.operators.extract import extract
rows = []
for i in range(6000):
    items = "".join(
        f'<li class="it"><a href="/l{j}">item {j}</a><span>v{j}</span></li>'
        for j in range(20)
    )
    rows.append((f"http://bench.test/p{i}",
                 f"<html><body><h1>Page {i}</h1><ul>{items}</ul></body></html>"))
pages = spark.createDataFrame(rows, ["url", "html"]).repartition(cpus * 2).cache()
pages.count()
program = ('title: h1 { t: $element | text(); } | take(key: "t");\n'
           'items: li.it {\n  link: a { href: $element | attrs() | take(key: "href"); '
           't: $element | text(); };\n}*;\n')
extract(pages.limit(64), program).write.format("noop").mode("overwrite").save()
t0 = time.perf_counter()
extract(pages, program).write.format("noop").mode("overwrite").save()
out["extract_pages_per_sec"] = 6000 / (time.perf_counter() - t0)

# --- q1 ---
from scrapelect_spark.operators.relational import q1_pricing_summary
q1_pricing_summary(spark, sf_dir).count()
n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
t0 = time.perf_counter()
for _ in range(5):
    q1_pricing_summary(spark, sf_dir).write.format("noop").mode("overwrite").save()
out["q1_rows_per_sec"] = 5 * n_li / (time.perf_counter() - t0)

# --- crawl ---
from scrapelect_spark.streaming.crawl import Crawler, CrawlConfig
n_hosts, per_host = 8, 400
corpus = {}
for h in range(n_hosts):
    for p in range(per_host):
        links = "".join(
            f'<a href="http://h{(h + k) %% n_hosts}.test/p/{(p * 5 + k) %% per_host}">x</a>'
            for k in range(6))
        corpus[f"http://h{h}.test/p/{p}"] = (
            f"<html><body><h1>{h}/{p}</h1>{links}</body></html>")
corpus_df = spark.createDataFrame(list(corpus.items()), ["url", "html"])
cfg = CrawlConfig(batch_size=1200, per_host_limit=200, max_depth=12, buckets=16,
                  bloom_bits_per_bucket=1 << 18, fetch_partitions=cpus)
with tempfile.TemporaryDirectory() as td:
    crawler = Crawler(spark, td, corpus_df,
                      [(f"http://h{h}.test/p/0", 1) for h in range(n_hosts)],
                      program='t: h1 { x: $element | text(); } | take(key: "x");',
                      config=cfg)
    t0 = time.perf_counter()
    crawler.run(max_batches=3)
    dt = time.perf_counter() - t0
    fetched = crawler.root.current_snapshot()["metrics"]["next_page_seq"]
out["crawl_pages_per_sec"] = fetched / dt
out["crawl_pages_fetched"] = fetched

print("RESULT " + json.dumps(out))
"""


def run_at(cpus: int) -> dict:
    code = _WORKER % {"repo": REPO, "cpus": cpus}
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"scaling worker (cpus={cpus}) failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
    lo = run_at(n)
    hi = run_at(4 * n)
    report = {"n_cores": n, "4n_cores": 4 * n, "at_n": lo, "at_4n": hi,
              "efficiency": {}}
    for k in ("extract_pages_per_sec", "q1_rows_per_sec", "crawl_pages_per_sec"):
        report["efficiency"][k] = round(hi[k] / lo[k] / 4.0, 3)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

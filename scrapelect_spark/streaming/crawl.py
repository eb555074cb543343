"""The micro-batch crawl loop: frontier → politeness claim → fetch →
extract → frontier append, checkpointed per batch.

This is the web-scale graft around the scrp engine (north_rule): the
reference fetches one page per URL-recursion eval with no dedup or
scheduling (/root/reference/src/interpreter/mod.rs:124-138); here a
distributed frontier drives fetching while per-page extraction keeps
the reference's sequential semantics inside the UDF.

Determinism contract (verified against the sequential reference
simulator in reference_sim.py): under the same seed list + politeness
budget, the crawl produces byte-for-byte the same

- fetch order  — ``page_seq`` assigned from the total order
  ``(priority, depth, page_seq, link_seq, url)`` (politeness.py);
- URL-seen set — exact dedup (bloom prefilter + anti-join; sketches
  never change the answer, urlseen.py);
- extraction output — same engine, same pages.

Storage: one :class:`SnapshotTable` per logical table (frontier /
seen / pages / records / sketches) plus a root table whose snapshot
pins each sub-table snapshot id — a micro-batch commits sub-tables
first and the root last (atomically), so resume reads a consistent
cut (north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

Scale notes:
- queued = frontier ⟕̸ pages (left-anti): at 10^10 rows this is the
  cost of plain parquet; on Iceberg the same loop uses MoR deletes and
  a bucket(url) layout so the anti-join is partition-local;
- candidate dedup anti-join only sees the bloom "maybe-seen" sliver;
- per-host windows are salt-staged (politeness.py) so host skew never
  concentrates on one task;
- the corpus fetcher realizes "HTTP GET" as a join against the page
  corpus (sandbox has no network); HttpFetcher shows the mapInPandas
  shape with per-partition rate limiting for real deployments.
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.dom import parse_html
from ..functions.interpreter import Interpreter, warm_selectors
from ..functions.value import to_json
from ..plans.parser import parse_program
from ..sources.checkpoint import SnapshotTable
from .canonicalize import canonicalize_url, host_of, resolve_and_canonicalize
from .politeness import repartition_for_fetch, select_batch
from .robots import RobotsPolicy
from .urlseen import (
    empty_sketch_df,
    maybe_seen_cogrouped,
    merged_sketch_df,
)

ALLOWED_SCHEMES = ("http", "https", "file")


@dataclass
class CrawlConfig:
    batch_size: int = 1000
    per_host_limit: int = 4
    salt_buckets: int = 8
    max_depth: int = 10
    buckets: int = 64  # frontier hash buckets (sketch partitioning)
    bloom_bits_per_bucket: int = 1 << 20
    bloom_hashes: int = 5
    default_priority: int = 100
    #: reference-parity UA (mod.rs:28-39 / Cargo.toml — matches
    #: sources/fetch.py HttpFetcher.REFERENCE_UA)
    user_agent: str = "scrapelect v0.4.0"
    batch_seconds: float = 60.0  # politeness budget window per micro-batch
    fetch_partitions: int = 32
    broadcast_corpus: bool = True
    #: fold the append-only snapshot logs into one base commit every N
    #: batches (0 = never).  At the 10^10-URL design point the frontier
    #: log otherwise accumulates one commit dir per batch forever, and
    #: every resume/read pays for the whole history.  Compaction keeps
    #: old snapshots + data dirs on disk, so a crash mid-compaction (or
    #: a root pin from before it) still resolves exactly.
    compact_every: int = 64


def effective_base(root, base_url: str) -> str:
    """The document's effective base URL: the FIRST ``<base href>``
    (itself resolved against the page URL, per the HTML spec), else
    the page URL — which the crawl loop already sets to the SERVED
    url after a redirect."""
    from urllib.parse import urljoin

    for el in root.descendants():
        if el.tag == "base" and "href" in el.attrs:
            try:
                return urljoin(base_url, el.attrs["href"].strip())
            except ValueError:
                return base_url
    return base_url


def extract_links(root, base_url: str) -> list[Optional[str]]:
    """All ``<a href>`` targets in document order, resolved against the
    page's effective base and canonicalized (None for unusable hrefs,
    INCLUDING ``rel=nofollow`` anchors — the position is kept so
    link_seq lineage stays stable).  The effective base honors the
    document's first ``<base href>`` (itself resolved against the page
    URL, per the HTML spec); with no base tag it is the page URL —
    which the crawl loop already sets to the SERVED url after a
    redirect.  Shared with the sequential reference simulator —
    identical by construction."""
    effective = effective_base(root, base_url)
    out: list[Optional[str]] = []
    for el in root.descendants():
        if el.tag == "a" and "href" in el.attrs:
            rel = el.attrs.get("rel", "").lower().split()
            if "nofollow" in rel:
                out.append(None)
            else:
                out.append(
                    resolve_and_canonicalize(el.attrs["href"], effective)
                )
    return out


def page_robots_directives(root) -> frozenset:
    """Lowercased directive tokens from every ``<meta name="robots">``
    tag (comma- or space-separated); ``none`` expands to
    ``noindex + nofollow`` per the de-facto standard.  Page-level
    ``nofollow`` drops every outlink, ``noindex`` suppresses the
    extracted record while links are still followed."""
    toks: set[str] = set()
    for el in root.descendants():
        if (
            el.tag == "meta"
            and el.attrs.get("name", "").strip().lower() == "robots"
        ):
            for t in el.attrs.get("content", "").replace(",", " ").split():
                toks.add(t.strip().lower())
    if "none" in toks:
        toks |= {"noindex", "nofollow"}
    return frozenset(toks)


PROCESS_SCHEMA = StructType(
    [
        StructField("page_url", StringType(), False),
        StructField("page_seq", LongType(), False),
        StructField("depth", IntegerType(), False),
        StructField("kind", StringType(), False),  # link | record | error | redirect
        StructField("seq", IntegerType(), False),
        StructField("value", StringType(), True),
    ]
)

FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("depth", IntegerType(), False),
        StructField("page_seq", LongType(), False),  # discovering page
        StructField("link_seq", IntegerType(), False),
        StructField("priority", IntegerType(), False),
        StructField("excluded", StringType(), True),  # None | reason
        StructField("batch", LongType(), False),
    ]
)


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        corpus: DataFrame,  # (url, html) — the fetchable web
        seeds: list[tuple[str, int]],  # (url, priority)
        program: str | None = None,
        robots: RobotsPolicy | None = None,
        config: CrawlConfig | None = None,
        fetcher=None,  # CorpusFetcher (default) | HttpFetcher | custom
    ):
        self.spark = spark
        self.cfg = config or CrawlConfig()
        self.seeds = seeds
        self.robots = robots or RobotsPolicy({}, self.cfg.batch_seconds)
        self.program = program
        self.statements = None
        if program is not None:
            self.statements = parse_program(program)
            warm_selectors(self.statements)
        self.corpus = corpus
        if fetcher is None:
            from ..sources.fetch import CorpusFetcher

            fetcher = CorpusFetcher(corpus, broadcast=self.cfg.broadcast_corpus)
        self.fetcher = fetcher
        self.root = SnapshotTable(f"{workdir}/crawl")
        self.tables = {
            name: SnapshotTable(f"{workdir}/{name}")
            for name in ("frontier", "seen", "pages", "records", "sketches")
        }
        # URL-seen blooms as a (bucket, sketch) DataFrame — executor-
        # resident, cogrouped per bucket at use sites; the driver never
        # holds the sketch bytes (at 10^10 URLs that dict is ~12 GiB)
        self.sketch_df: DataFrame | None = None
        # hot crawl state kept as materialized (localCheckpoint'ed)
        # DataFrames between batches: the queued frontier and the exact
        # seen set.  The snapshot tables stay the durable source of
        # truth (state is rebuilt from them on resume); the cached form
        # removes the per-batch full-table scan + anti-join.
        self._queued_df: DataFrame | None = None
        self._seen_df: DataFrame | None = None

    _QUEUED_COLS = ["url", "host", "depth", "page_seq", "link_seq", "priority"]

    def _load_state(self) -> None:
        """Rebuild hot state from the root-pinned snapshots (startup +
        resume path)."""
        frontier = self._pinned("frontier")
        pages = self._pinned("pages")
        queued = frontier.filter(F.col("excluded").isNull()).select(
            *self._QUEUED_COLS
        )
        if pages is not None:
            queued = queued.join(pages.select("url"), on="url", how="left_anti")
        self._queued_df = queued.localCheckpoint()
        seen = self._pinned("seen")
        self._seen_df = seen.select("url", "bucket").localCheckpoint()

    # --- helpers ---------------------------------------------------
    def _with_bucket(self, df: DataFrame, col: str = "url") -> DataFrame:
        return df.withColumn("bucket", F.pmod(F.hash(F.col(col)), F.lit(self.cfg.buckets)))

    def _commit_parts(self, n_rows: int, rows_per_file: int = 50_000) -> int:
        """Write-parallelism for a per-batch commit: scales with batch
        size (one task per ~50k rows) so a millions-of-pages batch
        never funnels through one write task, but small CI batches
        still produce one or two files instead of 32 tiny ones."""
        cap = max(1, self.spark.sparkContext.defaultParallelism)
        return max(1, min(cap, -(-int(n_rows) // rows_per_file)))

    def _host_budgets(self) -> DataFrame | None:
        rows = [
            (h, self.robots.host_budget(h, self.cfg.per_host_limit))
            for h in self.robots.per_host
        ]
        if not rows:
            return None
        return self.spark.createDataFrame(rows, ["host", "budget"])

    def _pinned(self, name: str) -> Optional[DataFrame]:
        """Read a sub-table at the snapshot pinned by the root table."""
        snap = self.root.current_snapshot()
        if snap is None:
            return None
        sid = snap["metrics"]["tables"].get(name)
        if sid is None:
            return None
        return self.tables[name].read(self.spark, snapshot_id=sid)

    # --- seen sketches --------------------------------------------
    def _merge_sketch_df(self, new_urls: DataFrame) -> DataFrame:
        """Next sketch DataFrame = current OR bloom(new urls), built
        per bucket on executors (cogrouped applyInPandas — each task
        touches exactly one bucket's bloom bytes)."""
        base = (
            self.sketch_df
            if self.sketch_df is not None
            else empty_sketch_df(self.spark)
        )
        return merged_sketch_df(
            base,
            new_urls,
            num_bits=self.cfg.bloom_bits_per_bucket,
            num_hashes=self.cfg.bloom_hashes,
        ).localCheckpoint()

    def _restore_sketches(self) -> None:
        df = self._pinned("sketches")
        if df is None:
            self.sketch_df = empty_sketch_df(self.spark)
            return
        # latest sketch per bucket — stays a DataFrame end to end; no
        # driver materialization of the bloom bytes
        from pyspark.sql import Window

        w = Window.partitionBy("bucket").orderBy(F.col("batch").desc())
        self.sketch_df = (
            df.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("bucket", "sketch")
            .localCheckpoint()
        )

    # --- batch stages ---------------------------------------------
    def _seed_commit(self) -> dict:
        rows = []
        seen_order: dict[str, None] = {}
        for i, (url, priority) in enumerate(self.seeds):
            canon = canonicalize_url(url)
            if canon is None or canon in seen_order:
                continue
            seen_order[canon] = None
            host = host_of(canon)
            from urllib.parse import urlsplit

            path = urlsplit(canon).path or "/"
            excluded = None if self.robots.allowed(host, path) else "robots"
            rows.append((canon, host, 0, -1, i, priority, excluded, 0))
        frontier_df = self.spark.createDataFrame(rows, FRONTIER_SCHEMA)
        fr_snap = self.tables["frontier"].commit(frontier_df, metrics={"batch": 0})
        seen_df = self._with_bucket(frontier_df.select("url")).select("url", "bucket")
        seen_snap = self.tables["seen"].commit(seen_df, metrics={"batch": 0})
        # seed blooms built executor-side; no URL ever crosses back
        self.sketch_df = self._merge_sketch_df(seen_df)
        sk_snap = self._commit_sketches(0)
        root = self.root.commit(
            None,
            metrics={
                "batch": 0,
                "next_page_seq": 0,
                "tables": {
                    "frontier": fr_snap["id"],
                    "seen": seen_snap["id"],
                    "sketches": sk_snap["id"],
                    "pages": None,
                    "records": None,
                },
                "pages_fetched": 0,
                "seeds": len(rows),
            },
        )
        return root

    def _commit_sketches(self, batch: int):
        assert self.sketch_df is not None
        df = self.sketch_df.select(
            "bucket", "sketch", F.lit(batch).cast("long").alias("batch")
        )
        return self.tables["sketches"].commit(
            df, mode="overwrite", metrics={"batch": batch}
        )

    def _process_batch_udf(self):
        statements = self.statements
        user_agent = self.cfg.user_agent  # noqa: F841 — HTTP path config

        def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            interp = Interpreter() if statements is not None else None
            for pdf in batches:
                out: dict[str, list] = {
                    k.name: [] for k in PROCESS_SCHEMA.fields
                }

                def emit(url, seq_, depth, kind, i, value):
                    out["page_url"].append(url)
                    out["page_seq"].append(seq_)
                    out["depth"].append(depth)
                    out["kind"].append(kind)
                    out["seq"].append(i)
                    out["value"].append(value)

                for url, html, pseq, depth, finu in zip(
                    pdf["url"], pdf["html"], pdf["page_seq_assigned"],
                    pdf["depth"], pdf["final_url"],
                ):
                    if html is None:
                        emit(url, pseq, depth, "error", 0, "fetch failed: 404")
                        continue
                    # a 3xx chain was followed: relative links resolve
                    # against the URL the body was SERVED from, and the
                    # target is recorded so the frontier can mark it
                    # seen-but-not-queued (its content is already held
                    # under the requested URL)
                    base = finu if isinstance(finu, str) and finu else url
                    if base != url:
                        canon = canonicalize_url(base)
                        if canon is not None and canon != canonicalize_url(url):
                            emit(url, pseq, depth, "redirect", 0, canon)
                    root = parse_html(html)
                    directives = page_robots_directives(root)
                    if "nofollow" not in directives:
                        for i, target in enumerate(extract_links(root, base)):
                            if target is not None:
                                emit(url, pseq, depth, "link", i, target)
                    if interp is not None and "noindex" not in directives:
                        try:
                            rec = interp.interpret_document(statements, root, url)
                            emit(url, pseq, depth, "record", 0, to_json(rec))
                        except Exception as e:  # permissive corpus mode
                            emit(url, pseq, depth, "error", 0, str(e))
                yield pd.DataFrame(out)

        return process

    def _maybe_seen_filter(self, candidates: DataFrame) -> DataFrame:
        """Split candidates against the sketch *table*: cogrouped by
        bucket, so each task deserializes exactly one bucket's bloom —
        never the whole sketch set (at the 10^10-URL design point the
        set is ~12 GiB; a broadcast/closure capture is the OOM).
        Provably-new rows ('n') bypass the exact anti-join."""
        sketch_df = (
            self.sketch_df
            if self.sketch_df is not None
            else empty_sketch_df(self.spark)
        )
        return maybe_seen_cogrouped(candidates, sketch_df)

    def _robots_excluded_col(self, df: DataFrame) -> DataFrame:
        policy_bc = self.spark.sparkContext.broadcast(self.robots)
        schema = StructType(
            df.schema.fields + [StructField("excluded", StringType(), True)]
        )

        def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from urllib.parse import urlsplit

            policy: RobotsPolicy = policy_bc.value
            for pdf in batches:
                exc = [
                    None
                    if policy.allowed(h, urlsplit(u).path or "/")
                    else "robots"
                    for u, h in zip(pdf["url"], pdf["host"])
                ]
                pdf = pdf.copy()
                pdf["excluded"] = pd.Series(exc, dtype=object)
                yield pdf

        return df.mapInPandas(check, schema=schema)

    # --- the loop --------------------------------------------------
    def run(self, max_batches: int = 100) -> dict:
        state = self.root.current_snapshot()
        if state is None:
            state = self._seed_commit()
        if self.sketch_df is None:
            self._restore_sketches()

        if self._queued_df is None:
            self._load_state()

        for _ in range(max_batches):
            state = self._run_one_batch(state)
            if state["metrics"]["pages_fetched"] == 0:
                break
            if (
                self.cfg.compact_every
                and state["metrics"]["batch"] % self.cfg.compact_every == 0
            ):
                self._compact_tables()
        return self.root.current_snapshot()

    def _compact_tables(self) -> None:
        """Fold each append-log into one base commit sized by row count
        (content-identical: reads the live set, rewrites coalesced).
        The next batch's root commit pins the fresh snapshot ids; until
        then the previous root pin stays resolvable because compaction
        never deletes old snapshots or data dirs."""
        for name in ("frontier", "seen", "pages", "records"):
            table = self.tables[name]
            df = table.read(self.spark)
            if df is None:
                continue
            n = df.count()
            table.commit(
                df.coalesce(self._commit_parts(n)),
                mode="overwrite",
                metrics={"compaction": True, "rows": int(n)},
            )

    def expire_history(self, keep_last_batches: int = 1) -> dict:
        """Checkpoint GC (Iceberg expire_snapshots discipline): keep
        the last ``keep_last_batches`` ROOT snapshots — each one a
        complete resumable cut — then expire every sub-table snapshot
        not pinned by a retained root.  Data directories shared with
        retained snapshots survive; everything else is deleted.  At
        the 10^10-URL design point this bounds checkpoint storage to
        O(retained cuts), where the unexpired log grows with every
        micro-batch forever."""
        # if compaction moved a sub-table past the root's pin, publish
        # a replace-commit repinning the CURRENT (content-identical)
        # snapshots first — otherwise the retained root would keep the
        # whole pre-compaction dir set alive
        cur = self.root.current_snapshot()
        if cur is not None:
            pins_now = {
                name: (t.current_snapshot() or {}).get("id")
                for name, t in self.tables.items()
            }
            if pins_now != cur["metrics"].get("tables"):
                self.root.commit(
                    None, metrics={**cur["metrics"], "tables": pins_now}
                )
        out = {"root": self.root.expire_snapshots(keep_last=keep_last_batches)}
        pins: dict[str, set[int]] = {name: set() for name in self.tables}
        for snap in self.root.history():  # post-expiry: retained only
            for name, sid in (snap["metrics"].get("tables") or {}).items():
                if sid is not None and name in pins:
                    pins[name].add(int(sid))
        for name, table in self.tables.items():
            out[name] = table.expire_snapshots(keep_last=0, protect=pins[name])
        return out

    def _run_one_batch(self, root_state: dict) -> dict:
        m = root_state["metrics"]
        batch = m["batch"] + 1
        next_page_seq = m["next_page_seq"]

        claimed = select_batch(
            self._queued_df,
            batch_size=self.cfg.batch_size,
            host_budgets=self._host_budgets(),
            default_per_host=self.cfg.per_host_limit,
            salt_buckets=self.cfg.salt_buckets,
        ).withColumn(
            "page_seq_assigned", F.col("fetch_order") + F.lit(next_page_seq)
        )

        claimed = repartition_for_fetch(
            claimed, self.cfg.fetch_partitions, self.cfg.salt_buckets
        ).cache()

        # per-partition lineage metric; its sum doubles as n_fetched
        # (one job on the cached claimed batch, no separate count)
        part_counts = {
            str(r.pid): r["count"]
            for r in claimed.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        }
        n_fetched = int(sum(part_counts.values()))

        # fetch stage is pluggable: CorpusFetcher (corpus join — the
        # sandbox/replay path) or HttpFetcher (real GETs in mapInPandas)
        fetched = self.fetcher.fetch(claimed)

        has_final = "final_url" in fetched.columns
        fin_col = (
            F.col("final_url") if has_final
            else F.lit(None).cast("string").alias("final_url")
        )
        processed = fetched.select(
            "url", "html", "page_seq_assigned", "depth", fin_col
        ).mapInPandas(self._process_batch_udf(), schema=PROCESS_SCHEMA)
        processed = processed.cache()

        # --- pages log ---
        page_rows = (
            claimed.select(
                "url",
                "host",
                "depth",
                F.col("page_seq_assigned").alias("page_seq"),
                "fetch_order",
            )
            .withColumn("batch", F.lit(batch).cast("long"))
        )
        if n_fetched == 0:
            processed.unpersist()
            claimed.unpersist()
            root = self.root.commit(
                None,
                metrics={**m, "batch": batch, "pages_fetched": 0, "tables": m["tables"]},
            )
            return root

        # --- records ---
        records = processed.filter(F.col("kind").isin("record", "error")).select(
            F.col("page_url").alias("url"),
            "page_seq",
            "depth",
            "kind",
            F.col("value"),
            F.lit(batch).cast("long").alias("batch"),
        )

        # pages + records commit concurrently: independent tables, and
        # the inputs don't race (pages reads only the already-cached
        # claimed batch; records is the first materialization of the
        # processed cache).  Concurrent job submission overlaps the
        # per-job scheduler latency that dominates small-batch cost —
        # the table commits themselves stay atomic and exact.
        # records/links fan out ~10× from pages — size that write to it
        with ThreadPoolExecutor(max_workers=2) as pool:
            pg_f = pool.submit(
                self.tables["pages"].commit,
                page_rows.coalesce(self._commit_parts(n_fetched)),
                metrics={"batch": batch},
            )
            rec_f = pool.submit(
                self.tables["records"].commit,
                records.coalesce(self._commit_parts(n_fetched * 10)),
                metrics={"batch": batch},
            )
            pg_snap, rec_snap = pg_f.result(), rec_f.result()

        # --- new frontier candidates ---
        links = processed.filter(
            (F.col("kind") == "link") & (F.col("depth") < self.cfg.max_depth)
        ).select(
            F.col("value").alias("url"),
            (F.col("depth") + 1).alias("depth"),
            F.col("page_seq"),
            F.col("seq").alias("link_seq"),
        )
        links = links.filter(
            F.split(F.col("url"), ":").getItem(0).isin(*ALLOWED_SCHEMES)
        )
        # in-batch dedup: deterministic first discovery by lineage order
        links = (
            links.groupBy("url")
            .agg(F.min(F.struct("page_seq", "link_seq", "depth")).alias("s"))
            .select(
                "url",
                F.col("s.depth").alias("depth"),
                F.col("s.page_seq").alias("page_seq"),
                F.col("s.link_seq").alias("link_seq"),
            )
        )
        candidates = self._with_bucket(links)
        flagged = self._maybe_seen_filter(candidates)
        definitely_new = flagged.filter(F.col("maybe_seen") == "n").drop("maybe_seen")
        maybe = flagged.filter(F.col("maybe_seen") == "y").drop("maybe_seen")
        if self._seen_df is not None:
            maybe = maybe.join(
                self._seen_df.select("url"), on="url", how="left_anti"
            )
        new_urls = definitely_new.unionByName(maybe)

        # --- redirect targets: seen-but-not-queued ---------------------
        # Content behind a 3xx is already held under the requested URL;
        # the served URL joins the seen set (and the frontier log, with
        # excluded='redirect') so later links to it are not refetched.
        # Only the HttpFetcher path can produce these (CorpusFetcher has
        # no final_url column), and the count probe below is a cached-
        # input job, so corpus replays and redirect-free crawls add no
        # shuffle work here.
        red_urls = None
        if has_final and (
            processed.filter(F.col("kind") == "redirect").limit(1).count() > 0
        ):
            red = (
                processed.filter(F.col("kind") == "redirect")
                .select(
                    F.col("value").alias("url"),
                    "depth",
                    "page_seq",
                    F.lit(-1).cast("int").alias("link_seq"),
                )
                .groupBy("url")
                .agg(F.min(F.struct("page_seq", "link_seq", "depth")).alias("s"))
                .select(
                    "url",
                    F.col("s.depth").alias("depth"),
                    F.col("s.page_seq").alias("page_seq"),
                    F.col("s.link_seq").alias("link_seq"),
                )
            )
            red_flagged = self._maybe_seen_filter(self._with_bucket(red))
            red_new = red_flagged.filter(F.col("maybe_seen") == "n").drop(
                "maybe_seen"
            )
            red_maybe = red_flagged.filter(F.col("maybe_seen") == "y").drop(
                "maybe_seen"
            )
            if self._seen_df is not None:
                red_maybe = red_maybe.join(
                    self._seen_df.select("url"), on="url", how="left_anti"
                )
            red_urls = red_new.unionByName(red_maybe)
            # a same-batch link to the redirect target is already-held
            # content — never queue it
            new_urls = new_urls.join(
                red_urls.select("url"), on="url", how="left_anti"
            )

        new_frontier = (
            new_urls.withColumn("host", F.expr("parse_url(url, 'HOST')"))
            .withColumn("host", F.lower(F.coalesce(F.col("host"), F.lit(""))))
            .withColumn("priority", F.lit(self.cfg.default_priority))
            .withColumn("batch", F.lit(batch).cast("long"))
        )
        new_frontier = self._robots_excluded_col(
            new_frontier.select(
                "url", "host", "depth", "page_seq", "link_seq", "priority", "batch", "bucket"
            )
        )
        if red_urls is not None:
            red_frontier = (
                red_urls.withColumn("host", F.expr("parse_url(url, 'HOST')"))
                .withColumn(
                    "host", F.lower(F.coalesce(F.col("host"), F.lit("")))
                )
                .withColumn("priority", F.lit(self.cfg.default_priority))
                .withColumn("batch", F.lit(batch).cast("long"))
                .select(
                    "url", "host", "depth", "page_seq", "link_seq",
                    "priority", "batch", "bucket",
                )
                .withColumn("excluded", F.lit("redirect"))
            )
            new_frontier = new_frontier.unionByName(red_frontier)

        new_frontier = new_frontier.cache()

        # materialize the cache once (deterministic single fill) so the
        # five consumers below can run concurrently without racing to
        # compute it
        n_new = int(new_frontier.count())

        # per-batch commits coalesce so the append-log read path doesn't
        # accumulate thousands of tiny parquet files; the part count
        # scales with batch size (at scale, file count tracks data
        # volume and compact() folds the log)
        frontier_parts = max(2, self._commit_parts(n_fetched * 10))

        # everything below reads only cached/checkpointed inputs — run
        # the two table commits, the executor-side sketch build, and
        # the two hot-state checkpoints concurrently (scheduler-latency
        # overlap; see the pages/records note above)
        newly_queued = new_frontier.filter(F.col("excluded").isNull()).select(
            *self._QUEUED_COLS
        )
        remaining = self._queued_df.join(
            F.broadcast(claimed.select("url")), on="url", how="left_anti"
        )
        with ThreadPoolExecutor(max_workers=5) as pool:
            fr_f = pool.submit(
                self.tables["frontier"].commit,
                new_frontier.select(
                    "url", "host", "depth", "page_seq", "link_seq", "priority",
                    "excluded", "batch",
                ).coalesce(frontier_parts),
                metrics={"batch": batch},
            )
            seen_f = pool.submit(
                self.tables["seen"].commit,
                new_frontier.select("url", "bucket").coalesce(frontier_parts),
                metrics={"batch": batch},
            )
            # sketch merge runs entirely executor-side (cogrouped
            # applyInPandas per bucket: old bloom ⊕ new urls); the
            # driver only keeps the DataFrame handle, and the per-
            # bucket counts it carries double as n_new
            sketch_f = pool.submit(
                self._merge_sketch_df, new_frontier.select("url", "bucket")
            )
            queued_f = pool.submit(
                lambda: remaining.unionByName(newly_queued).localCheckpoint()
            )
            seen_df_f = pool.submit(
                lambda: self._seen_df.unionByName(
                    new_frontier.select("url", "bucket")
                ).localCheckpoint()
            )
            fr_snap = fr_f.result()
            seen_snap = seen_f.result()
            merged_sketches = sketch_f.result()
            next_queued_df = queued_f.result()
            next_seen_df = seen_df_f.result()
        # n_new == the cache-materialization count above: the sketch
        # merge ingests exactly new_frontier's (url, bucket) rows, so
        # sum(n_added) over the merged DataFrame equals that count —
        # no extra aggregation job per batch
        self.sketch_df = merged_sketches.select("bucket", "sketch")
        sk_snap = self._commit_sketches(batch)

        root = self.root.commit(
            None,
            metrics={
                "batch": batch,
                "next_page_seq": int(next_page_seq + n_fetched),
                "pages_fetched": int(n_fetched),
                "new_urls": int(n_new),
                "tables": {
                    "frontier": fr_snap["id"],
                    "seen": seen_snap["id"],
                    "pages": pg_snap["id"],
                    "records": rec_snap["id"],
                    "sketches": sk_snap["id"],
                },
            },
            lineage={"fetch_partition_rows": part_counts},
        )

        # advance the hot state: queued minus the claimed batch plus the
        # newly-discovered queue-eligible urls; localCheckpoint (already
        # computed concurrently above) truncates lineage so plan depth
        # stays O(1) across hundreds of batches
        self._queued_df = next_queued_df
        self._seen_df = next_seen_df

        processed.unpersist()
        new_frontier.unpersist()
        claimed.unpersist()
        return root

    # --- outputs ---------------------------------------------------
    def visit_log(self) -> list[tuple[str, int, int]]:
        """[(url, page_seq, depth)] in fetch order — the determinism
        artifact compared against the sequential simulator."""
        df = self._pinned("pages")
        if df is None:
            return []
        return [
            (r.url, r.page_seq, r.depth)
            for r in df.orderBy("page_seq").collect()
        ]

    def seen_set(self) -> set[str]:
        df = self._pinned("seen")
        if df is None:
            return set()
        return {r.url for r in df.select("url").collect()}

    def records_json(self) -> dict[str, str]:
        df = self._pinned("records")
        if df is None:
            return {}
        return {
            r.url: r.value
            for r in df.filter(F.col("kind") == "record").collect()
        }

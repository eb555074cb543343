"""Politeness-aware batch selection: the distributed priority queue.

Selects each micro-batch from the queued frontier under (a) a per-host
fetch budget and (b) a global batch size, in the deterministic total
order ``(priority, depth, page_seq, link_seq, url)`` — the lineage
order that makes the parallel crawl reproduce the sequential reference
crawl byte-for-byte (SURVEY.md §7.1 item 4).

Skew design (north_star "salted-key repartition + sortWithinPartitions
to kill host skew"): per-host top-k is computed in two stages so one
hot host (say 40% of a 10^10 frontier) never lands on one task:

1. salt the window key — rank within ``(host, salt)`` where
   ``salt = pmod(hash(url), S)``; each of the S shards keeps at most
   ``k`` rows, so stage 2's input is ≤ S·k rows per host regardless of
   how many billions the host has queued;
2. exact rank within ``host`` over that tiny survivor set.

The global batch cut is a top-``batch_size`` sort over per-host
survivors (bounded by hosts × k rows).  The fetch stage then
repartitions the claimed batch by ``(host, salt)`` and sorts within
partitions by the same total order, so per-partition fetch order is
deterministic and hot hosts stay spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ["priority", "depth", "page_seq", "link_seq", "url"]


def _order(df_cols=None):
    return [F.col(c).asc() for c in ORDER_COLS]


def select_batch(
    queued: DataFrame,
    *,
    batch_size: int,
    host_budgets: DataFrame | None = None,
    default_per_host: int = 4,
    salt_buckets: int = 8,
) -> DataFrame:
    """Claim the next micro-batch.  ``host_budgets`` is an optional
    small (host, budget) DataFrame — broadcast-joined; hosts absent
    from it use ``default_per_host``.

    Returns the claimed rows with a deterministic ``fetch_order``
    column (0-based within the batch).
    """
    df = queued.withColumn(
        "_salt", F.pmod(F.hash(F.col("url")), F.lit(salt_buckets))
    )
    if host_budgets is not None:
        df = df.join(F.broadcast(host_budgets), on="host", how="left")
        df = df.withColumn(
            "_budget", F.coalesce(F.col("budget"), F.lit(default_per_host))
        ).drop("budget")
    else:
        df = df.withColumn("_budget", F.lit(default_per_host))

    # stage 1: bounded pre-rank within (host, salt)
    w1 = Window.partitionBy("host", "_salt").orderBy(*_order())
    df = (
        df.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.col("_budget"))
        .drop("_r1")
    )
    # stage 2: exact per-host rank over ≤ salt_buckets·budget survivors
    w2 = Window.partitionBy("host").orderBy(*_order())
    df = (
        df.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= F.col("_budget"))
        .drop("_r2", "_salt", "_budget")
    )
    # global deterministic cut: orderBy+limit plans as
    # TakeOrderedAndProject (per-partition top-k + merge, distributed)
    # — with millions of hosts the per-host survivor set is still huge,
    # so never run it through one unpartitioned WindowExec task.  The
    # ≤batch_size claimed rows are then ranked WindowExec-free: one
    # sorted partition + monotonically_increasing_id (sequential
    # 0..n-1 within a single partition).
    top = (
        df.orderBy(*_order())
        .limit(batch_size)
        .coalesce(1)
        .sortWithinPartitions(*ORDER_COLS)
    )
    return top.withColumn(
        "fetch_order", F.monotonically_increasing_id().cast("int")
    )


def repartition_for_fetch(
    claimed: DataFrame, num_partitions: int, salt_buckets: int = 8
) -> DataFrame:
    """Salted-key repartition + sortWithinPartitions for the fetch
    stage (north_star): hot hosts spread over ``salt_buckets`` tasks,
    deterministic in-partition order."""
    return claimed.repartition(
        num_partitions,
        F.col("host"),
        F.pmod(F.hash(F.col("url")), F.lit(salt_buckets)),
    ).sortWithinPartitions(*ORDER_COLS)

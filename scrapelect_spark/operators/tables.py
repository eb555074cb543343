"""Parquet table loader for the driver-provided testdata star schema."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    assert name in TABLES, name
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def scan_partitions(df: DataFrame, target_bytes: int = 16 << 20) -> int:
    """Input-proportional partition count for sizing an ITERATIVE
    loop's shuffles/state to the corpus rather than to a constant
    tuned for either local mode or one cluster (guide §2:
    scale-adaptive partitioning).

    Derived from the optimizer's size estimate of ``df`` (file-size
    based for scans; driver-side, costs no job) at ``target_bytes``
    per partition.  The target is deliberately finer than a scan
    split (16 MiB vs 128 MiB): a loop touches its working set twice
    per round across many rounds and typically explodes it (edge
    lists, element tables), so per-round partitions want to be
    smaller than one-shot scan splits.  A 600 KB bench table yields
    1 (the measured-fast case for the graph loops), a 100 TB corpus
    hundreds of thousands.  Falls back to the physical scan split
    count if the estimate is unavailable."""
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        if size > 0:
            return max(1, -(-size // target_bytes))
    except Exception:
        pass
    return max(1, df.rdd.getNumPartitions())


@contextmanager
def loop_shuffle(spark: SparkSession, n: int):
    """Run an iterative loop's jobs under ``spark.sql.shuffle.partitions
    = n`` (derived from :func:`scan_partitions`, so it is input-sized),
    restoring the session value afterwards.

    Why: the per-round joins/aggregations of the iterative operators
    run over vectors cached with an explicit hash partitioning, and
    cached plans keep AQE's output-partitioning changes OFF
    (``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning``), so
    every round otherwise schedules full ``spark.sql.shuffle.partitions``
    -sized stages no matter how small the data — pure task-scheduling
    overhead at bench scale and the WRONG constant at 100 TB, where the
    same loops need far more than the session default.  Sizing the
    loop's shuffles to the input keeps the co-partitioned
    zero-exchange round shape at every scale."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield n
    finally:
        spark.conf.set(key, old)


#: materialization barriers on (the production default).  Plan-shape
#: tests set this False so ``plan_of(gate(...))`` shows the full
#: logical tree instead of a LogicalRDD stub at each barrier — the
#: barrier only truncates what EXPLAIN prints; the barriered subtree
#: executes the identical plan.
BARRIERS = True


def barrier(df: DataFrame) -> DataFrame:
    """Lazy materialization barrier: compute-once for subtrees that are
    consumed several times or feed a global sort (whose range sampling
    executes the child in full a second time).  Chain with
    ``df.transform(barrier)``.  No-op when ``BARRIERS`` is False (plan
    inspection)."""
    if not BARRIERS:
        return df
    return df.localCheckpoint(eager=False)


def materialized_sort(df: DataFrame, *cols) -> DataFrame:
    """Global ORDER BY without re-executing an expensive subtree.

    A total sort shuffles by RangePartitioning, and computing the range
    boundaries SAMPLES the child — which executes the entire child plan
    once in full before the sort's own pass executes it again.  For a
    lineage that contains Python codec stages (mapInPandas synthesis /
    decode) that doubles the dominant cost: measured 3.33 s → 1.76 s on
    the MPEG-1 B-frame gate at sf0.1.  ``localCheckpoint`` (lazy)
    materializes the child once; the sampling pass then reads the
    cached partitions.  The checkpoint is bounded by the operator's
    OUTPUT (already reduced), and at corpus scale materializing a
    result before a total sort is the standard trade — the alternative
    is decoding the corpus twice."""
    return df.localCheckpoint(eager=False).orderBy(*cols)


def spread(df: DataFrame) -> DataFrame:
    """Explicit fan-out for under-parallel inputs.

    A toy-scale parquet scan is a single partition, and everything up
    to the first exchange — ``mapInPandas`` codec work, but equally
    JVM-side explodes, regex extraction and partial aggregation —
    executes on ONE task no matter how many cores the cluster has.
    Repartitioning to the session's default parallelism with an
    EXPLICIT partition count (user-specified numPartitions is exempt
    from AQE coalescing) makes those stages genuinely parallel.

    Round 6 made the fan-out CONDITIONAL: when the input already
    carries at least the cluster's parallelism (every corpus-scale
    scan), spread is the identity — the exchange exists only where it
    buys parallelism, so corpus-scale plans are untouched rather than
    paying a full-table round-robin shuffle."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)

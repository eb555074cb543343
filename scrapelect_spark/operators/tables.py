"""Parquet table loader for the driver-provided testdata star schema."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    assert name in TABLES, name
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame) -> DataFrame:
    """Explicit fan-out for small synthetic gate inputs.

    A toy-scale parquet scan is a single partition, and
    ``mapInPandas`` inherits its input's partitioning — so the
    per-row codec work the multimodal gates do (encode/decode a
    video/audio/image per document) would execute on ONE task no
    matter how many cores the cluster has.  Repartitioning to the
    session's default parallelism with an EXPLICIT partition count
    (user-specified numPartitions is exempt from AQE coalescing)
    makes the Arrow stages genuinely parallel.  At corpus scale the
    input already arrives in many partitions and this exchange moves
    the same tiny id list it moves here — the per-row work stays
    partition-local either way."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)

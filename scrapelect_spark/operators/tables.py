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

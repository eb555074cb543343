"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2 + the
training-data pipeline families), keyed by name; each callable takes
(spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query with matching
column aliases (the driver hashes columns by name).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing
    summary (decimal-exact aggregation discipline)."""
    from scrapelect_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from scrapelect_spark.operators.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from scrapelect_spark.operators.catalog import ORACLE_SQL

    return dict(ORACLE_SQL)

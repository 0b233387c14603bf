"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``osprey_spark.entrypoint`` — see that module for the
query implementations and their DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from osprey_spark import entrypoint as _ep


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _ep.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_ep.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (keys without an entry get
    the driver's weaker rows-only check: approx/LSH/xxhash-based ops)."""
    return dict(_ep.ORACLES)

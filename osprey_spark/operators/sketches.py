"""Distributed sketches as compositions of DataFrame ops.

Count-min sketch (Cormode & Muthukrishnan 2005) built with
DETERMINISTIC md5-derived hash rows, so the sketch — and every
estimate read from it — is exactly reproducible by an external SQL
engine: the DuckDB oracle rebuilds the identical (depth, bucket)
counter table and reads the identical estimates. That turns the usual
"approximate, can only rows-check" sketch into a hash-exact
correctness row, while keeping the real 100 TB property: the
aggregate state is ``width x depth`` counters per partition
(map-side partial), the shuffle carries at most
``width x depth x partitions`` partial rows, and estimates are
O(depth) lookups per queried key — the corpus never re-shuffles per
query.

The reference engine has no sketch operators (its approx layer is
Druid/ClickHouse-side); this is part of the survey's §2.6
training-pipeline/analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, d: int, width: int, seed: str) -> Column:
    """Row-``d`` bucket: first 8 md5 hex chars of ``seed:d:key`` mod
    width — 32 bits of the digest, replayed verbatim in the oracle."""
    h = F.md5(
        F.concat(F.lit(f"{seed}:{d}:"), key.cast("string")).cast("binary")
    )
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(width)).alias(
        f"__b{d}"
    )


def count_min_build(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cms",
) -> DataFrame:
    """Build the counter table: one row per (depth, bucket) with the
    total count of keys hashing there.

    Plan: ONE scan; each input row contributes ``depth`` (d, bucket)
    pairs via an inline array explode, then a single hash aggregate —
    partial aggregation caps per-partition state at width*depth
    counters, so the exchange is sketch-sized, not data-sized.
    """
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(key, d, width, seed).alias("bucket"))
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cms",
) -> DataFrame:
    """Read estimates for ``keys`` from a built sketch: each key joins
    its ``depth`` buckets and takes the min counter (the CMS upper
    bound; over-estimates only, never under). The sketch side is
    width*depth rows — broadcast-sized by construction — so the read
    is a broadcast equi-join however large the key list is."""
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(key, d, width, seed).alias("bucket"))
            for d in range(depth)
        ]
    )
    exploded = keys.select(key_col, F.explode(pairs).alias("p")).select(
        key_col, F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket")
    )
    return (
        exploded.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_n"))
    )


def duck_bucket_sql(
    key_expr: str, d: int, width: int = 1024, seed: str = "cms"
) -> str:
    """DuckDB expression replaying :func:`_bucket` for hash row ``d``
    — identical md5 prefix, identical modulus."""
    return (
        f"CAST(('0x' || substr(md5('{seed}:{d}:' || CAST({key_expr} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {width}"
    )


def count_min_sketch_cte(
    table: str,
    key_expr: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cms",
) -> str:
    """DuckDB CTE body defining ``cms(d, bucket, n)`` — the exact
    counter table :func:`count_min_build` produces."""
    arms = " UNION ALL ".join(
        f"SELECT {d} AS d, {duck_bucket_sql(key_expr, d, width, seed)} AS bucket FROM {table}"
        for d in range(depth)
    )
    return f"SELECT d, bucket, count(*) AS n FROM ({arms}) GROUP BY d, bucket"

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


# HyperLogLog constants for m=256 registers (Flajolet et al. 2007):
# alpha_m = 0.7213 / (1 + 1.079 / m); embedded pre-multiplied by m^2
# as ONE Python float literal so both engines divide by S with the
# identical constant (no multiply-order ambiguity).
_HLL_M = 256
_HLL_ALPHA_M2 = (0.7213 / (1.0 + 1.079 / _HLL_M)) * _HLL_M * _HLL_M


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    seed: str = "hll",
) -> DataFrame:
    """From-scratch HyperLogLog distinct-count per group — the
    deterministic, oracle-replayable counterpart of Spark's built-in
    ``approx_count_distinct`` (whose sketch internals an external
    engine cannot replay, leaving it rows-only checkable).

    Register assignment is md5-derived: 8 digest bits pick one of 256
    registers, the next 52 bits give the rank (leading-zero count + 1,
    computed EXACTLY via the binary-string length of the value — no
    floating log2 at the boundary). Registers are a (group, bucket)
    max aggregate with map-side partials — per-partition state is at
    most 256 rows per group, the true HLL property — and the harmonic
    sum folds in bucket order (each term is 2^-r, an exact double), so
    the estimate is bit-reproducible and the DuckDB oracle hash-exact.
    The standard small-range linear-counting correction applies when
    E <= 2.5m and empty registers remain.

    Output: ``group_cols..., n_exact, hll_estimate`` (the exact
    distinct rides along as the self-validating comparison column).
    """
    key = F.col(key_col)
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")).cast("binary"))
    v = F.conv(F.substring(h, 3, 13), 16, 10).cast("long")
    rho = (
        F.when(v == 0, F.lit(53))
        .otherwise(F.lit(53) - F.length(F.conv(F.substring(h, 3, 13), 16, 2)))
        .cast("int")
    )
    regs = (
        df.select(
            *group_cols,
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("_bkt"),
            rho.alias("_rho"),
        )
        .groupBy(*group_cols, "_bkt")
        .agg(F.max("_rho").alias("_r"))
    )
    per = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_np"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("_bkt").alias("b"), F.col("_r").alias("r")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + F.lit(1.0) / F.pow(F.lit(2.0), x["r"]),
        ).alias("_sp"),
    )
    vz = F.lit(_HLL_M) - F.col("_np")
    s = vz.cast("double") * F.lit(1.0) + F.col("_sp")
    eraw = F.lit(_HLL_ALPHA_M2) / s
    est = F.when(
        (eraw <= F.lit(2.5 * _HLL_M)) & (vz > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / vz.cast("double")),
    ).otherwise(eraw)
    ex = df.groupBy(*group_cols).agg(
        F.countDistinct(key).cast("long").alias("n_exact")
    )
    return (
        per.join(ex, group_cols)
        .select(*group_cols, "n_exact", F.round(est, 6).alias("hll_estimate"))
        .orderBy(*group_cols)
    )


def hll_oracle_sql(
    table: str,
    key_expr: str,
    group_col: str,
    seed: str = "hll",
) -> str:
    """DuckDB replay of :func:`hll_distinct`: identical md5 register
    assignment (``bin()`` string length for the exact rank), identical
    bucket-ordered harmonic fold, identical constants."""
    am2 = repr(_HLL_ALPHA_M2)
    return f"""
WITH h AS (
  SELECT {group_col}, md5('{seed}:' || CAST({key_expr} AS VARCHAR)) AS h FROM {table}
),
b AS (
  SELECT {group_col},
    CAST(('0x' || substr(h, 1, 2)) AS INT) AS bkt,
    CAST(('0x' || substr(h, 3, 13)) AS BIGINT) AS v
  FROM h
),
r AS (
  SELECT {group_col}, bkt,
    max(CASE WHEN v = 0 THEN 53 ELSE 53 - length(bin(v)) END) AS r
  FROM b GROUP BY 1, 2
),
agg AS (
  SELECT {group_col}, count(*) AS np,
    list_sum(list_transform(
      list(struct_pack(b := bkt, r := r) ORDER BY bkt),
      s -> 1.0 / power(2.0, s.r))) AS sp
  FROM r GROUP BY 1
),
e AS (
  SELECT {group_col}, np, {am2} / ((256 - np) * 1.0 + sp) AS eraw, 256 - np AS vz
  FROM agg
),
ex AS (SELECT {group_col}, count(DISTINCT {key_expr}) AS n_exact FROM {table} GROUP BY 1)
SELECT e.{group_col}, CAST(ex.n_exact AS BIGINT) AS n_exact,
  round(CASE WHEN eraw <= 640.0 AND vz > 0
             THEN 256.0 * ln(256.0 / vz) ELSE eraw END, 6) AS hll_estimate
FROM e JOIN ex USING ({group_col}) ORDER BY {group_col}
"""

"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB the cheapest query is the one that never reads the file:
parquet/Iceberg file-level min/max statistics prune scans, but a table
sorted on ONE column only prunes predicates on that column. Z-ordering
interleaves the bits of several columns so that consecutive rows are
close in EVERY interleaved dimension at once — each written file then
covers a small rectangle of (user, time) space and a predicate on
either column skips most files. This is the layout operator behind
`OPTIMIZE ... ZORDER BY` in lakehouse engines, built here from scratch
as pure integer Column arithmetic (no UDF, no shuffle beyond the final
range partitioning).

The Morton key is exact integer math (shift/and per bit, compile-time
unrolled — one flat whole-stage-codegen expression), so the key — and
the per-bucket locality statistics read from it — replay bit-for-bit
in the DuckDB oracle.

The reference engine has no layout operators (its analytics store is
ClickHouse/Druid-side); this is §2.6 scale-extension territory.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 21) -> Column:
    """Morton-interleave the low ``bits`` bits of each column (values
    must be non-negative longs, pre-normalized by the caller): bit
    ``j`` of column ``i`` lands at interleaved position
    ``j * n_cols + i``. Compile-time unrolled into a flat sum of
    shift/and terms — integer-exact, codegen-friendly, no UDF.

    ``n_cols * bits`` must stay < 63 so the key fits a long.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if n * bits >= 63:
        raise ValueError(f"{n} cols x {bits} bits overflows a long key")
    terms = []
    for i, c in enumerate(cols):
        x = c.cast("long")
        for j in range(bits):
            bit = F.shiftright(x, j).bitwiseAND(F.lit(1))
            terms.append(bit * F.lit(1 << (j * n + i)))
    key = terms[0]
    for t in terms[1:]:
        key = key + t
    return key.cast("long")


def _scaled_key(df: DataFrame, cols: Sequence[str], bits: int):
    """Attach the Morton key over min/max-scaled columns: each layout
    column is rank-scaled to the SAME fixed width
    (``(v - min) * (2^bits - 1) DIV span``, integer-exact in both
    engines — no float rounding at 10^12-scale products) so the
    interleave weights every dimension equally however asymmetric the
    raw ranges. The min/max pass is one 1-row aggregate broadcast onto
    the scan (the same bounded-scalar pattern as skew_profile)."""
    longs = {c: F.col(c).cast("long") for c in cols}
    ranges = df.agg(
        *[F.min(x).alias(f"__min_{c}") for c, x in longs.items()],
        *[F.max(x).alias(f"__max_{c}") for c, x in longs.items()],
    )
    m = (1 << bits) - 1
    normed = df.crossJoin(F.broadcast(ranges))
    for c in cols:
        normed = normed.withColumn(
            f"__off_{c}", F.coalesce(longs[c] - F.col(f"__min_{c}"), F.lit(0))
        ).withColumn(
            f"__span_{c}", F.col(f"__max_{c}") - F.col(f"__min_{c}")
        )
    scaled = [
        F.expr(f"(__off_{c} * {m}) DIV greatest(__span_{c}, 1)") for c in cols
    ]
    drop = [f"__{p}_{c}" for c in cols for p in ("min", "max", "off", "span")]
    return normed.withColumn("__zkey", zorder_key(scaled, bits=bits)).drop(
        *drop
    )


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Cluster ``df`` for writing: rank-scale each layout column,
    compute the Morton key, then range-partition + sort on it. Each
    output partition (= each written file) covers a tight
    hyper-rectangle of the layout columns, which is exactly what
    file-level min/max pruning needs.

    Returns the clustered frame with the ``__zkey`` column attached
    (drop it before writing if undesired).
    """
    out = _scaled_key(df, cols, bits)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(n, "__zkey").sortWithinPartitions("__zkey")


def zorder_stats(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    bucket_shift: int = 26,
) -> DataFrame:
    """Locality audit of the Z-order layout — the deterministic,
    oracle-replayable proof that the clustering works: bucket rows by
    the HIGH bits of the Morton key (``bucket = zkey >> bucket_shift``,
    i.e. the prefix a range-partitioner would split on; the defaults
    keep the top 3 bits of each of 2 dims = up to 64 buckets) and
    report each bucket's bounding rectangle. Tight per-bucket min/max
    spans on BOTH columns = file-level stats would prune on both.

    Output: ``zbucket, n_rows, lo_<c>, hi_<c>...`` ordered by bucket.
    NULL layout values are excluded (they carry no position).
    """
    filtered = df
    for c in cols:
        filtered = filtered.filter(F.col(c).isNotNull())
    keyed = _scaled_key(filtered, cols, bits)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"lo_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"hi_{c}"))
    return (
        keyed.withColumn("zbucket", F.shiftright(F.col("__zkey"), bucket_shift))
        .groupBy("zbucket")
        .agg(*aggs)
        .orderBy("zbucket")
    )


def py_zorder_key(vals: Sequence[int], bits: int = 21) -> int:
    """Python replay of :func:`zorder_key` (tests)."""
    n = len(vals)
    key = 0
    for i, v in enumerate(vals):
        for j in range(bits):
            key |= ((int(v) >> j) & 1) << (j * n + i)
    return key


def zorder_key_sql(exprs: Sequence[str], bits: int = 21) -> str:
    """DuckDB expression replaying :func:`zorder_key` — identical
    shift/and/position arithmetic, term for term."""
    n = len(exprs)
    terms = []
    for i, e in enumerate(exprs):
        for j in range(bits):
            terms.append(f"((({e}) >> {j}) & 1) * {1 << (j * n + i)}")
    return "(" + " + ".join(terms) + ")"


def zorder_stats_sql(
    table: str,
    col_exprs: dict,
    bits: int = 16,
    bucket_shift: int = 26,
    cte_prefix: str = "",
) -> str:
    """DuckDB replay of :func:`zorder_stats` — identical rank scaling
    (``(v - min) * (2^bits - 1) // greatest(span, 1)``, integer
    floor-division) and identical interleave terms. ``col_exprs`` maps
    output column name -> SQL expression producing the long value."""
    names = list(col_exprs)
    m = (1 << bits) - 1
    head = f"{cte_prefix}," if cte_prefix else "WITH"
    vals = ", ".join(
        f"CAST({e} AS BIGINT) AS {c}" for c, e in col_exprs.items()
    )
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in names)
    ranges = ", ".join(
        f"min({c}) AS min_{c}, max({c}) AS max_{c}" for c in names
    )
    zexpr = zorder_key_sql(
        [
            f"(((v.{c} - m.min_{c}) * {m}) // greatest(m.max_{c} - m.min_{c}, 1))"
            for c in names
        ],
        bits=bits,
    )
    stats = ", ".join(
        f"min({c}) AS lo_{c}, max({c}) AS hi_{c}" for c in names
    )
    return f"""
{head} v AS (SELECT {vals} FROM {table}),
v2 AS (SELECT * FROM v WHERE {notnull}),
m AS (SELECT {ranges} FROM v2),
k AS (
  SELECT v.*, ({zexpr} >> {bucket_shift}) AS zbucket
  FROM v2 v CROSS JOIN m m
)
SELECT zbucket, CAST(count(*) AS BIGINT) AS n_rows, {stats}
FROM k GROUP BY zbucket ORDER BY zbucket
"""


def compaction_plan(
    files: DataFrame,
    partition_col: str = "part",
    order_cols: Sequence[str] = ("file_id",),
    bytes_col: str = "bytes",
    target_bytes: int = 1 << 20,
) -> DataFrame:
    """Small-file compaction planner (the OPTIMIZE /
    ``rewrite_data_files`` bin-packer): given a file inventory
    (partition, file, bytes), assign files to target-sized output bins
    and report per-partition compaction stats. Small files are THE
    silent 100-TB scan killer — a table with 10^6 half-MB files pays
    per-file open/footer costs that dwarf the data read; the fix is a
    deterministic plan every executor can compute independently.

    Bin assignment is NEXT-FIT over the partition's deterministic file
    order: ``bin = cum_bytes_before DIV target_bytes`` — one window
    per partition (bounded by files-per-partition), pure BIGINT math,
    identical in SQL. Next-fit is within 2x of optimal bin count and,
    unlike first-fit-decreasing, needs no per-bin driver state —
    that's the trade a distributed planner wants.

    Output per partition: ``(part, n_files, total_bytes, n_bins,
    small_files, fill_pct)`` where small_files counts inputs under
    half the target and fill_pct = total/(bins*target) rounded 6.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(partition_col).orderBy(*order_cols)
    staged = files.select(
        F.col(partition_col).alias("part"),
        F.col(bytes_col).cast("long").alias("_b"),
        *[F.col(c) for c in order_cols],
    ).withColumn(
        "_cum_before",
        F.coalesce(
            F.sum("_b").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long"),
    )
    binned = staged.select(
        "part",
        "_b",
        F.expr(f"_cum_before DIV {int(target_bytes)}").alias("_bin"),
    )
    return (
        binned.groupBy("part")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("_b").cast("long").alias("total_bytes"),
            (F.max("_bin") + 1).cast("long").alias("n_bins"),
            F.sum((F.col("_b") < int(target_bytes) // 2).cast("long"))
            .cast("long")
            .alias("small_files"),
        )
        .select(
            "part",
            "n_files",
            "total_bytes",
            "n_bins",
            "small_files",
            F.round(
                F.col("total_bytes").cast("double")
                / (F.col("n_bins").cast("double") * float(target_bytes)),
                6,
            ).alias("fill_pct"),
        )
        .orderBy("part")
    )


def compaction_plan_sql(
    files_sql: str,
    partition_col: str = "part",
    order_cols: Sequence[str] = ("file_id",),
    bytes_col: str = "bytes",
    target_bytes: int = 1 << 20,
) -> str:
    """DuckDB replay of :func:`compaction_plan`."""
    order = ", ".join(order_cols)
    t = int(target_bytes)
    return f"""cpf AS (
  SELECT {partition_col} AS part, CAST({bytes_col} AS BIGINT) AS b, {order}
  FROM ({files_sql})
),
cpc AS (
  SELECT part, b,
    CAST(coalesce(sum(b) OVER (PARTITION BY part ORDER BY {order}
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cum_before
  FROM cpf
),
cpb AS (SELECT part, b, cum_before // {t} AS bin FROM cpc)
SELECT part, CAST(count(*) AS BIGINT) AS n_files,
  CAST(sum(b) AS BIGINT) AS total_bytes,
  CAST(max(bin) + 1 AS BIGINT) AS n_bins,
  CAST(sum(CAST(b < {t // 2} AS BIGINT)) AS BIGINT) AS small_files,
  round(CAST(sum(b) AS DOUBLE) / (CAST(max(bin) + 1 AS DOUBLE) * {float(t)!r}), 6)
    AS fill_pct
FROM cpb GROUP BY part ORDER BY part"""

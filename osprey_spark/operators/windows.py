"""Window operators — batch forms.

Parity targets: the reference's Redis sliding-window counters
(``IncrementWindow``/``GetWindowCount``,
ref: example_plugins/src/udfs/cache.py:161-227,333-347) become
event-time window aggregations; sessions are the north-rule addition
(the reference has none). Streaming forms (watermarked) live in
``osprey_spark.streaming``; these batch forms share semantics and are
oracle-checkable.

Window starts are epoch-aligned (multiples of the slide), matching
Spark's ``F.window``. Outputs use epoch seconds (bigint) so results
compare exactly across engines.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timeutil import epoch_seconds


def tumbling_counts(
    df: DataFrame, ts_col: str, keys: Sequence[str], size_seconds: int
) -> DataFrame:
    """Events per key per tumbling window. One shuffle on
    (window, keys); partial aggregation map-side."""
    w = F.window(F.col(ts_col).cast("timestamp"), f"{size_seconds} seconds")
    out = (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            *keys,
            F.col("n"),
        )
    )
    return out.orderBy("window_start", *keys)


def sliding_counts(
    df: DataFrame, ts_col: str, keys: Sequence[str], size_seconds: int, slide_seconds: int
) -> DataFrame:
    """Sliding-window counts (``GetWindowCount`` parity). Spark
    expands each row into size/slide windows before the shuffle —
    the row-amplification factor is the knob to watch at scale."""
    w = F.window(F.col(ts_col).cast("timestamp"), f"{size_seconds} seconds", f"{slide_seconds} seconds")
    out = (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            *keys,
            F.col("n"),
        )
    )
    return out.orderBy("window_start", *keys)


def sessionize(
    df: DataFrame,
    ts_col: str,
    key: str,
    gap_seconds: int,
    count_col: str = "n_turns",
) -> DataFrame:
    """Batch sessionization: lag + gap-flag + running-sum session ids,
    then per-session aggregates. Two shuffles on `key` reuse the same
    hash partitioning (Exchange reuse), so it scales as one
    repartition + local sorts.

    The streaming equivalent is ``F.session_window`` with a watermark
    (osprey_spark.streaming.windows).
    """
    byk = Window.partitionBy(key).orderBy(ts_col)
    sec = epoch_seconds(F.col(ts_col))
    new_sess = (
        F.when(F.lag(sec).over(byk).isNull(), 1)
        .when(sec - F.lag(sec).over(byk) > gap_seconds, 1)
        .otherwise(0)
    )
    with_sess = df.withColumn("_sess", F.sum(new_sess).over(byk))
    out = (
        with_sess.groupBy(key, "_sess")
        .agg(
            F.floor(F.min(sec)).cast("long").alias("session_start"),
            F.floor(F.max(sec)).cast("long").alias("session_end"),
            F.count(F.lit(1)).alias(count_col),
        )
        .drop("_sess")
    )
    return out.orderBy(key, "session_start")


def rate_rule_counts(
    df: DataFrame,
    ts_col: str,
    key: str,
    window_seconds: int,
    threshold: int,
) -> DataFrame:
    """Rate-style rule: keys whose tumbling-window count exceeds a
    threshold (turns-per-conv-per-minute, BASELINE north_star)."""
    counts = tumbling_counts(df, ts_col, [key], window_seconds)
    return counts.filter(F.col("n") >= threshold).orderBy("window_start", key)


def running_turn_stats(df: DataFrame, key: str, order_cols: Sequence[str]) -> DataFrame:
    """Per-key running counters (prior-verdict/tool-sequence style
    escalation state, batch form). Window spec reused across all
    aggregates → single sort per partition."""
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("turns_so_far", F.count(F.lit(1)).over(w))

"""Bounded watermark lag under sustained backpressure.

The whole backlog is queued while admission is throttled to a small
files-per-trigger, so input pressure exceeds drain capacity for >=20
consecutive micro-batches — the first failure mode a 100-TB cluster
hits. The assertion: with the fused stateful pipeline + watermarked
ingest dedup, the watermark LAG does not grow with the backlog — it
settles to (dedup delay + per-batch event-time span), because each
availableNow batch advances the watermark to the previous batch's
event-time frontier. Unbounded state or a stuck watermark would show
as monotonically growing lag and fail here.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from osprey_spark.compiler import compile_ruleset
from osprey_spark.streaming.metrics import JsonMetricsListener, read_metrics
from osprey_spark.streaming.pipeline import StreamingRuleEngine
from osprey_spark.turns import TURN_BINDINGS

SML = (
    "ConvId: str = JsonData(path='$.conv_id')\n"
    "TurnRate = IncrementWindow(key=ConvId, window_seconds=600.0)\n"
    "RoleSym: str = JsonData(path='$.role')\n"
    "ToolLoop = SequenceMatches(key=ConvId, symbol=RoleSym, pattern='useruser', last_k=8)\n"
    "Bursty = TurnRate >= 5\n"
)

DELAY_S = 120  # dedup watermark: "2 minutes"


def test_watermark_lag_bounded_under_sustained_backpressure(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    # 24 files, 1 file per trigger -> 24 micro-batches of backlog.
    # Event time advances file by file (1 minute per file), the
    # realistic shape: the queued backlog spans real wall time.
    n_files = 24
    rows_per_file = 200
    for fi in range(n_files):
        rows = [
            (
                f"c{r % 20}",
                fi * rows_per_file + r,
                "user" if r % 2 == 0 else "assistant",
                f"text {r}",
                "t",
            )
            for r in range(rows_per_file)
        ]
        (
            spark.createDataFrame(
                rows, "conv_id string, turn_idx int, role string, text string, tool string"
            )
            .select(
                "*",
                (
                    F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                    + F.make_interval(secs=F.lit(fi * 60) + F.col("turn_idx") % 60)
                ).alias("ts"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(in_dir)
        )

    mpath = str(tmp_path / "metrics.jsonl")
    listener = JsonMetricsListener(mpath)
    spark.streams.addListener(listener)
    try:
        engine = StreamingRuleEngine(
            spark,
            compile_ruleset({"main.sml": SML}, bindings=TURN_BINDINGS),
            input_dir=in_dir,
            output_dir=str(tmp_path / "out"),
            max_files_per_trigger=1,
            n_buckets=4,
            dedup_ids=("conv_id", "turn_idx"),
            dedup_watermark="2 minutes",
        )
        engine.run_to_completion()
        total = n_files * rows_per_file
        for _ in range(60):
            recs = [
                r
                for r in read_metrics(mpath)
                if r.get("event") == "progress" and r.get("num_input_rows")
            ]
            if sum(r["num_input_rows"] for r in recs) >= total:
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    assert sum(r["num_input_rows"] for r in recs) == total
    assert len(recs) >= 20, f"want >=20 backpressured batches, got {len(recs)}"

    lags = [
        r["watermark_lag_ms"]
        for r in recs
        if r.get("watermark_lag_ms") is not None
    ]
    assert len(lags) >= 15
    # Bounded: every steady-state lag <= dedup delay + per-batch
    # event-time span (60s) + rounding margin. With a stuck watermark,
    # lag would approach the full backlog span (24 min) instead.
    bound_ms = (DELAY_S + 60 + 10) * 1000
    steady = lags[2:]
    assert max(steady) <= bound_ms, f"lag grew: {steady} > {bound_ms}"
    # and the lag must NOT trend upward with the backlog: the last
    # batch's lag is no worse than the median
    mid = sorted(steady)[len(steady) // 2]
    assert steady[-1] <= mid + 61_000

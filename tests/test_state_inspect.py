"""Offline checkpoint introspection: metadata catalog, per-partition
state census, and decoding the engine's key-coalesced JSON-dict state
back to per-entity rows — all from the checkpoint alone, no replay."""

from __future__ import annotations

import pyspark.sql.functions as F

from osprey_spark.streaming.dedup import stream_near_dup_bands
from osprey_spark.streaming.inspect import (
    decode_json_dict_state,
    read_state,
    state_metadata,
    state_summary,
)


def _run_near_dup(spark, tmp_path):
    rows = [
        (f"c{i}", i, "user", f"text number {i} with words {i * 3}",
         f"2024-01-01 10:{i:02d}:00")
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts_str string"
    ).select(
        "conv_id", "turn_idx", "role", "text", F.to_timestamp("ts_str").alias("ts")
    )
    src = str(tmp_path / "in")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "conv_id string, turn_idx int, role string, text string, ts timestamp"
    ).parquet(src)
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream_near_dup_bands(stream, n_buckets=8)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return ckpt


def test_metadata_and_summary(spark, tmp_path):
    ckpt = _run_near_dup(spark, tmp_path)
    meta = state_metadata(spark, ckpt).collect()
    assert len(meta) == 1
    assert "applyInPandasWithState" in meta[0]["operatorName"]

    summ = state_summary(spark, ckpt).collect()
    assert len(summ) == 1
    s = summ[0]
    # 12 rows x 4 bands over 8 hash buckets: most buckets touched
    raw = read_state(spark, ckpt, operator_id=0)
    assert s["n_keys"] == raw.count()
    assert 1 <= s["n_keys"] <= 8
    assert s["max_keys_per_partition"] >= 1
    assert s["partitions_used"] <= s["partitions_total"]


def test_decode_matches_band_universe(spark, tmp_path):
    ckpt = _run_near_dup(spark, tmp_path)
    decoded = decode_json_dict_state(read_state(spark, ckpt, operator_id=0))
    entries = decoded.collect()
    # one state entry per DISTINCT band ever seen; 12 unique texts x 4
    # bands, near-zero collision chance at 16^16 band space
    assert len(entries) == 48
    # every entry's value is the min order key (ts-second|conv|turn;
    # scalar strings decode unquoted) — non-empty and well-formed
    assert all(e.entry_json.count("|") == 2 and len(e.entry_json) > 10 for e in entries)
    assert all(e.entry_bytes > 0 for e in entries)
    # the bucket key struct round-trips as JSON with the group column
    assert all(e.bucket_key.startswith('{"_bkt":') for e in entries)


def test_state_time_travel_batch_pin(spark, tmp_path):
    """batchId pins a PAST micro-batch's state: after a second batch
    adds new bands, batch 0's state still reads as it was."""
    rows1 = [("a1", 0, "user", "alpha beta gamma delta words", "2024-01-01 10:00:00")]
    rows2 = [("a2", 0, "user", "totally different follow up text", "2024-01-01 10:05:00")]
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, ts_str string",
        ).select(
            "conv_id", "turn_idx", "role", "text", F.to_timestamp("ts_str").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, ts timestamp"
        ).parquet(src)
        q = (
            stream_near_dup_bands(stream, n_buckets=4)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write(rows1)
    run()
    n0 = decode_json_dict_state(read_state(spark, ckpt, operator_id=0)).count()
    write(rows2)
    run()
    latest = decode_json_dict_state(read_state(spark, ckpt, operator_id=0)).count()
    pinned = decode_json_dict_state(
        read_state(spark, ckpt, operator_id=0, batch_id=0)
    ).count()
    assert n0 == 4 and latest == 8
    assert pinned == n0

"""Streaming first-seen near-dup flags == batch near_dup_flags.

The state fold carries min-okey per band, so flags for in-order
arrival match the batch window exactly — including duplicates whose
first copy arrived in an EARLIER micro-batch (state crossing) and
near-dups (shared bands, not byte-equal texts)."""

from __future__ import annotations

import pyspark.sql.functions as F

from osprey_spark.operators.dedup import near_dup_flags
from osprey_spark.streaming.dedup import (
    collapse_near_dup_flags,
    stream_near_dup_bands,
)


def _rows():
    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "please reset my password for the billing account now",
        "tool call failed with a timeout error please retry later",
        "completely unrelated text about gardening and tomato plants",
    ]
    rows = []
    for i in range(80):
        if i % 4 == 0:
            text = base[(i // 4) % len(base)]  # exact repeats
        elif i % 4 == 1:
            # near-dup: one word changed, most shingles shared
            text = base[(i // 4) % len(base)].replace("the", "a", 1)
        else:
            text = f"unique filler text number {i} with its own words {i * 7}"
        rows.append(
            (
                f"c{i % 9}",
                i,
                "user" if i % 2 else "assistant",
                text,
                f"2024-01-01 10:{i // 60:02d}:{i % 60:02d}",
            )
        )
    return rows


def _df(spark):
    return spark.createDataFrame(
        _rows(),
        "conv_id string, turn_idx int, role string, text string, ts_str string",
    ).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.to_timestamp("ts_str").alias("ts"),
    )


def test_stream_near_dup_matches_batch(spark, tmp_path):
    df = _df(spark)
    src = str(tmp_path / "turns_nd")
    # split by time so the second batch's duplicates reference state
    # built by the first
    df.filter(F.col("turn_idx") < 30).coalesce(1).write.parquet(src)
    df.filter(F.col("turn_idx") >= 30).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_near_dup_bands(stream, n_buckets=16)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("nd_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.conv_id, r.turn_idx): r.is_near_dup
        for r in collapse_near_dup_flags(
            spark.sql("select * from nd_stream")
        ).collect()
    }
    expect = {
        (r.conv_id, r.turn_idx): r.is_near_dup
        for r in near_dup_flags(df).collect()
    }
    assert set(got) == set(expect)
    assert got == expect
    # sanity: repeats/near-dups flagged, their first copies not, and
    # state crossed the micro-batch boundary (a late copy of an
    # early-batch text is flagged)
    assert expect[("c0", 0)] is False
    assert any(
        v for (c, t), v in expect.items() if t >= 30
    ), "no cross-batch duplicate flagged"
    n_flagged = sum(got.values())
    assert 10 <= n_flagged < len(got)


def test_stream_near_dup_state_survives_restart(spark, tmp_path):
    """North rule: resumable from checkpoint. The per-band min-okey
    map must carry across an engine restart — a duplicate arriving
    after the resume is flagged against state persisted by the
    previous run."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "conv_id string, turn_idx int, role string, text string, ts timestamp"

    def write(rows):
        (
            spark.createDataFrame(
                rows,
                "conv_id string, turn_idx int, role string, text string, ts_str string",
            )
            .select(
                "conv_id",
                "turn_idx",
                "role",
                "text",
                F.to_timestamp("ts_str").alias("ts"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(in_dir)
        )

    def run():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            stream_near_dup_bands(stream, n_buckets=8)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    text = "a perfectly ordinary sentence that will be repeated verbatim"
    write([("c1", 0, "user", text, "2024-01-01 10:00:00")])
    run()
    write([("c2", 0, "user", text, "2024-01-01 10:20:00"),
           ("c3", 0, "user", "something else entirely and unrelated words", "2024-01-01 10:21:00")])
    run()  # fresh query object, same checkpoint + state store
    got = {
        (r.conv_id, r.turn_idx): r.is_near_dup
        for r in collapse_near_dup_flags(spark.read.parquet(out_dir)).collect()
    }
    assert got == {
        ("c1", 0): False,  # first copy, pre-restart
        ("c2", 0): True,  # duplicate flagged against RESTORED state
        ("c3", 0): False,
    }

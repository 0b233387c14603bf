"""Decayed counters: integer weight table, partition invariance,
streaming twin equivalence + bounded-state eviction."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from osprey_spark.operators.decay import (
    BASE,
    MAX_SHIFT,
    decay_score,
    replay_decay_score,
    stream_decay_counters,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, ts_str string"
    ).select("conv_id", F.to_timestamp("ts_str").alias("ts"))


def test_decay_known_answers(spark):
    # halflife 1h; now bucket = 12:xx. k1: one event now (2^20), one
    # event 1 halflife old (2^19), one 2 old (2^18). k2: one event 25
    # halflives old -> weight 0 (beyond MAX_SHIFT).
    df = _df(
        spark,
        [
            ("k1", "2024-01-02 12:30:00"),
            ("k1", "2024-01-02 11:30:00"),
            ("k1", "2024-01-02 10:30:00"),
            ("k2", "2024-01-01 11:00:00"),
        ],
    )
    got = {
        r.conv_id: (r.n_events, r.decay_score)
        for r in decay_score(df, ("conv_id",), "ts", 3600).collect()
    }
    assert got == {
        "k1": (3, BASE + BASE // 2 + BASE // 4),
        "k2": (1, 0),
    }
    assert BASE >> MAX_SHIFT == 0  # the eviction-soundness identity


def test_decay_partition_invariant(spark):
    rows = [
        (f"c{i % 7}", f"2024-01-02 {8 + i % 5}:0{i % 6}:00") for i in range(200)
    ]
    a = decay_score(_df(spark, rows).repartition(1), ("conv_id",), "ts", 3600)
    b = decay_score(_df(spark, rows).repartition(13), ("conv_id",), "ts", 3600)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_stream_decay_matches_batch(spark, tmp_path):
    from osprey_spark.turns import turns_from_events

    t = turns_from_events(spark, "/root/testdata/sf0.001").limit(500)
    src = str(tmp_path / "decay_src")
    # adversarial arrival: NEWEST half first, so late (older) rows must
    # fold into already-initialized per-key counters
    t.orderBy(F.col("ts").desc()).limit(250).select(
        "conv_id", "ts"
    ).coalesce(1).write.mode("append").parquet(src)
    t.orderBy(F.col("ts").asc()).limit(250).select(
        "conv_id", "ts"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("conv_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_decay_counters(stream, ("conv_id",), "ts", 3600, n_buckets=16)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("decay_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql(
        """
        select * from (
          select *, row_number() over (
            partition by conv_id order by upd_seq desc
          ) rn from decay_stream
        ) where rn = 1
        """
    ).collect()
    # read-time score at the batch now bucket
    now_b = (
        t.select(
            F.floor(
                F.max(F.col("ts").cast("timestamp").cast("long")) / F.lit(3600)
            ).alias("b")
        ).collect()[0].b
    )
    got = {
        r.conv_id: (r.n_events, replay_decay_score(r.counts_json, now_b))
        for r in emitted
    }
    expect = {
        r.conv_id: (r.n_events, r.decay_score)
        for r in decay_score(t, ("conv_id",), "ts", 3600).collect()
    }
    assert got == expect
    # bounded state: every carried vector is <= MAX_SHIFT + 2 buckets
    assert all(
        len(json.loads(r.counts_json)) <= MAX_SHIFT + 2 for r in emitted
    )


def test_stream_decay_evicts_stale_buckets(spark, tmp_path):
    src = str(tmp_path / "decay_evict")
    # stale event 60 halflives behind the newest (evicted); a 10-
    # halflife-old one stays (within MAX_SHIFT=21)
    rows = [
        ("k", "2024-01-01 00:00:00"),
        ("k", "2024-01-03 02:00:00"),
        ("k", "2024-01-03 12:00:00"),
    ]
    _df(spark, rows).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("conv_id string, ts timestamp").parquet(src)
    q = (
        stream_decay_counters(stream, ("conv_id",), "ts", 3600, n_buckets=4)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("decay_evict")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    row = spark.sql(
        "select * from decay_evict order by upd_seq desc limit 1"
    ).collect()[0]
    counts = json.loads(row.counts_json)
    # the day-1 bucket is > MAX_SHIFT halflives behind the newest: gone
    assert len(counts) == 2
    assert row.n_events == 3  # lifetime count unaffected by eviction
    mb = max(int(b) for b in counts)
    assert all(int(b) >= mb - MAX_SHIFT for b in counts)

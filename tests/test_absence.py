"""CEP negation / absence detection: batch window op vs the DuckDB
oracle shape, and the streaming event-time-timeout form vs batch."""

from __future__ import annotations

import pyspark.sql.functions as F

from osprey_spark.operators.cep import (
    response_absence,
    stream_response_absence,
)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts_str string"
    ).select("conv_id", "turn_idx", "role", F.to_timestamp("ts_str").alias("ts"))


BASE_ROWS = [
    # conv a: answered within 300s (via an intervening tool turn)
    ("a", 0, "user", "2024-01-01 10:00:00"),
    ("a", 1, "tool", "2024-01-01 10:01:00"),
    ("a", 2, "assistant", "2024-01-01 10:02:00"),
    # conv a again: answered but LATE (400s) -> responded false
    ("a", 3, "user", "2024-01-01 10:10:00"),
    ("a", 4, "assistant", "2024-01-01 10:16:40"),
    # conv b: never answered
    ("b", 0, "user", "2024-01-01 10:00:00"),
    ("b", 1, "tool", "2024-01-01 10:00:30"),
    # conv c: two pending users resolved by one response; first in
    # time, second in time too
    ("c", 0, "user", "2024-01-01 10:00:00"),
    ("c", 1, "user", "2024-01-01 10:03:00"),
    ("c", 2, "assistant", "2024-01-01 10:04:00"),
]


def test_response_absence_batch(spark):
    df = _turns(spark, BASE_ROWS)
    got = {
        (r.conv_id, r.turn_idx): (r.responded, r.response_sec)
        for r in response_absence(df, timeout_seconds=300).collect()
    }
    t = lambda s: int(
        spark.sql(f"select cast(to_timestamp('{s}') as long) v").collect()[0].v
    )
    assert got == {
        ("a", 0): (True, t("2024-01-01 10:02:00")),
        ("a", 3): (False, None),          # answered at 400s > 300s
        ("b", 0): (False, None),          # never answered
        ("c", 0): (True, t("2024-01-01 10:04:00")),
        ("c", 1): (True, t("2024-01-01 10:04:00")),
    }


def test_response_absence_oracle_matches(spark, tmp_path):
    """The operator and its DuckDB oracle agree row-for-row on a
    larger synthetic conversation set."""
    import duckdb

    from osprey_spark.operators.cep import response_absence_oracle_sql

    rows = []
    for c in range(12):
        for i in range(10):
            role = ["user", "assistant", "tool"][(i + c) % 3]
            rows.append((f"c{c}", i, role, f"2024-01-01 10:{(i * 3 + c) % 60:02d}:00"))
    df = _turns(spark, rows)
    p = str(tmp_path / "turns.parquet")
    df.coalesce(1).write.parquet(p)
    got = [
        (r.conv_id, r.turn_idx, r.trigger_sec, r.responded, r.response_sec)
        for r in response_absence(df, timeout_seconds=240).collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW turns AS SELECT * FROM '{p}/*.parquet'")
    want = [
        (c, i, ts, bool(resp), None if rs is None else int(rs))
        for c, i, ts, resp, rs in con.execute(
            response_absence_oracle_sql("turns", 240)
        ).fetchall()
    ]
    assert got == want and len(got) > 10


def test_stream_response_absence_matches_batch(spark, tmp_path):
    """Streaming form: responses resolve pending triggers in-batch
    and across micro-batches; unanswered triggers emit on event-time
    timeout once the watermark passes their deadline. Final rows ==
    batch rows for all decidable triggers."""
    rows = BASE_ROWS + [
        # late frontier event: pushes the watermark far past every
        # deadline so conv b (and a's late turn) expire
        ("z", 0, "tool", "2024-01-01 12:00:00"),
    ]
    df = _turns(spark, rows)
    src = str(tmp_path / "turns")
    # batch 1: early turns; batch 2: the responses; batch 3: the
    # frontier row LAST — were it earlier, the responses would be
    # late-beyond-watermark and correctly count as absent
    nz = F.col("conv_id") != "z"
    df.filter(nz & (F.col("turn_idx") <= 1)).coalesce(1).write.parquet(src)
    df.filter(nz & (F.col("turn_idx") > 1)).coalesce(1).write.mode("append").parquet(src)
    df.filter(~nz).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, role string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_response_absence(stream, timeout_seconds=300, watermark="1 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("absence_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.conv_id, r.turn_idx): (r.responded, r.response_sec)
        for r in spark.sql("select * from absence_out").collect()
    }
    batch = response_absence(
        df.filter(F.col("conv_id") != "z"), timeout_seconds=300
    ).collect()
    want = {(r.conv_id, r.turn_idx): (r.responded, r.response_sec) for r in batch}
    assert got == want and ("b", 0) in got and got[("b", 0)] == (False, None)


def test_stream_response_absence_restart(spark, tmp_path):
    """Pending triggers survive a checkpoint restart: the trigger
    lands before the kill, its response after."""
    src = str(tmp_path / "turns")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run():
        stream = spark.readStream.schema(
            "conv_id string, turn_idx int, role string, ts timestamp"
        ).parquet(src)
        q = (
            stream_response_absence(stream, timeout_seconds=300, watermark="1 minutes")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.conv_id, r.turn_idx): (r.responded, r.response_sec)
            for r in spark.read.parquet(out).collect()
        }

    _turns(spark, [("a", 0, "user", "2024-01-01 10:00:00")]).coalesce(1).write.parquet(src)
    first = run()
    assert first == {}  # still pending, nothing decidable
    _turns(spark, [("a", 1, "assistant", "2024-01-01 10:02:00")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    second = run()
    assert ("a", 0) in second and second[("a", 0)][0] is True

"""EXECUTED Kafka round trip (round-3 verdict, next-round item 8).

Rounds 1–3 could only shape-test the Kafka path (no connector jars in
the container). The ``kafka_file`` Python data source
(streaming/kafka_file.py) implements Kafka's exact wire schema and
offset model over a directory log, so the SAME produce/decode plan
code (`kafka_produce_frame`, `decode_kafka_turns`, `kafka_reader`,
`KafkaSink`) now actually runs ``.save()`` / ``.load()`` /
``.readStream...start()`` end to end, including checkpointed
streaming resume from per-partition offsets.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osprey_spark.streaming.kafka import (
    KafkaSink,
    decode_kafka_turns,
    kafka_produce_frame,
    kafka_reader,
)
from osprey_spark.streaming.kafka_file import (
    KAFKA_WIRE_SCHEMA,
    register_kafka_file,
)

TURNS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def _turns_df(spark, n=20):
    rows = [
        (f"c{i % 5}", i // 5, "user" if i % 2 == 0 else "assistant", f"msg {i}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, TURNS_SCHEMA)


def test_produce_then_batch_consume_roundtrip(spark, tmp_path):
    register_kafka_file(spark)
    broker = str(tmp_path / "broker")

    # produce through the real sink path (.save() executes)
    sink = KafkaSink(
        "unused:9092",
        "turns",
        key_col="conv_id",
        fmt="kafka_file",
        extra_options={"path": broker, "numPartitions": "3"},
    )
    sink.write_batch(_turns_df(spark), 0)

    # consume through .load() with Kafka's wire schema
    raw = (
        spark.read.format("kafka_file")
        .option("path", broker)
        .option("subscribe", "turns")
        .load()
    )
    assert raw.schema == KAFKA_WIRE_SCHEMA
    assert raw.count() == 20
    # same-key records landed in one partition with increasing offsets
    parts = (
        raw.select(F.col("key").cast("string").alias("k"), "partition")
        .distinct()
        .groupBy("k")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in parts)

    # decode the value JSON back to typed turns and compare content
    decoded = decode_kafka_turns(raw, TURNS_SCHEMA)
    got = {
        (r["conv_id"], r["turn_idx"], r["role"], r["text"])
        for r in decoded.collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"], r["role"], r["text"])
        for r in _turns_df(spark).collect()
    }
    assert got == want


def test_stream_consume_with_checkpoint_resume(spark, tmp_path):
    register_kafka_file(spark)
    broker = str(tmp_path / "broker")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    sink = KafkaSink(
        "unused:9092",
        "turns",
        key_col="conv_id",
        fmt="kafka_file",
        extra_options={"path": broker, "numPartitions": "2"},
    )
    sink.write_batch(_turns_df(spark, 10), 0)

    def run_once():
        stream = kafka_reader(
            spark,
            TURNS_SCHEMA,
            {"path": broker, "subscribe": "turns"},
            fmt="kafka_file",
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out)
    assert first.count() == 10

    # append more records, resume from the checkpointed offsets:
    # ONLY the new 6 rows flow (no reread, no loss)
    more = spark.createDataFrame(
        [(f"c{i}", 99, "user", f"late {i}") for i in range(6)], TURNS_SCHEMA
    )
    sink.write_batch(more, 1)
    run_once()
    final = spark.read.parquet(out)
    assert final.count() == 16
    assert final.filter(F.col("turn_idx") == 99).count() == 6


def test_null_key_roundrobin_produce(spark, tmp_path):
    register_kafka_file(spark)
    broker = str(tmp_path / "broker")
    df = _turns_df(spark, 12).drop("conv_id")
    frame = kafka_produce_frame(df, key_col=None)
    assert frame.columns == ["value"]
    (
        frame.write.mode("append").format("kafka_file")
        .option("path", broker)
        .option("topic", "nokey")
        .option("numPartitions", "4")
        .save()
    )
    raw = (
        spark.read.format("kafka_file")
        .option("path", broker)
        .option("subscribe", "nokey")
        .load()
    )
    rows = raw.collect()
    assert len(rows) == 12
    assert all(r["key"] is None for r in rows)
    # bad JSON survives decode as NULL fields (log-and-continue)
    decoded = decode_kafka_turns(raw, TURNS_SCHEMA)
    assert decoded.count() == 12


def test_rule_engine_consumes_kafka_file_source(spark, tmp_path):
    """The FULL north-rule pipeline over the Kafka-shaped source:
    turns produced to the kafka_file broker (KafkaSink .save()), the
    streaming rule engine consuming via source_format='kafka_file'
    (readStream .load() + JSON decode), compiled SML evaluated per
    micro-batch, verdicts landing in the exactly-once sink — equal to
    the batch apply() of the same ruleset over the same turns."""
    from osprey_spark.compiler import compile_ruleset
    from osprey_spark.streaming.pipeline import StreamingRuleEngine
    from osprey_spark.turns import TURN_BINDINGS, with_envelope

    register_kafka_file(spark)
    broker = str(tmp_path / "broker")

    import datetime as dt

    t0 = dt.datetime(2024, 5, 1)
    rows = [
        (
            f"c{i % 4}",
            i // 4,
            "user" if i % 2 == 0 else "assistant",
            "hello world" if i % 3 == 0 else f"msg {i}",
            "t",
            t0 + dt.timedelta(seconds=10 * i),
        )
        for i in range(24)
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    producer = KafkaSink(
        "unused:9092",
        "turns",
        key_col="conv_id",
        fmt="kafka_file",
        extra_options={"path": broker, "numPartitions": "2"},
    )
    producer.write_batch(turns, 0)

    sml = (
        "TurnText: str = JsonData(path='$.text', required=False)\n"
        "HasHello = StringContains(s=StringToLower(s=TurnText), phrase='hello')\n"
        "HelloRule = Rule(when_all=[HasHello], description='greets')\n"
        "WhenRules(rules_any=[HelloRule], then=[DeclareVerdict(verdict='hello')])\n"
    )
    rs = compile_ruleset({"main.sml": sml}, bindings=TURN_BINDINGS)
    engine = StreamingRuleEngine(
        spark,
        rs,
        input_dir="unused",
        output_dir=str(tmp_path / "out"),
        source_format="kafka_file",
        source_options={"path": broker, "subscribe": "turns"},
        n_buckets=4,
    )
    engine.run_to_completion()
    streamed = {
        (r["conv_id"], r["turn_idx"]): list(r["__verdicts"])
        for r in engine.results().collect()
    }
    batch = {
        (r["conv_id"], r["turn_idx"]): list(r["__verdicts"])
        for r in rs.apply(
            with_envelope(turns), passthrough=["conv_id", "turn_idx", "ts"]
        ).collect()
    }
    assert streamed == batch
    assert any("hello" in v for v in streamed.values())


# -------------------------------------------------------------------------
# staged two-phase publish (ADVICE r4 medium): write() stages hidden
# files; only driver commit() renames them visible; abort() removes them
# -------------------------------------------------------------------------


def _wire_rows(n=6):
    from pyspark.sql import Row

    return [
        Row(key=f"k{i}".encode(), value=f"v{i}".encode()) for i in range(n)
    ]


def test_writer_stages_then_commit_publishes(tmp_path):
    import os

    from osprey_spark.streaming.kafka_file import KafkaFileWriter, _segments

    w = KafkaFileWriter({"path": str(tmp_path), "topic": "t", "numpartitions": "2"})
    msg = w.write(iter(_wire_rows()))
    # nothing reader-visible yet; staged files exist
    assert all(not _segments(str(tmp_path), "t", p) for p in (0, 1))
    assert msg.staged and all(
        os.path.basename(s).startswith(".staged-") and os.path.exists(s)
        for s in msg.staged
    )
    w.commit([msg])
    segs = [s for p in (0, 1) for s in _segments(str(tmp_path), "t", p)]
    assert segs, "commit must publish the staged segments"
    assert not any(os.path.exists(s) for s in msg.staged)
    # every published line is whole JSON (no torn writes observable)
    for s in segs:
        for line in open(s):
            json.loads(line)


def test_writer_abort_leaves_log_untouched(tmp_path):
    import os

    from osprey_spark.streaming.kafka_file import KafkaFileWriter, _segments

    w = KafkaFileWriter({"path": str(tmp_path), "topic": "t", "numpartitions": "2"})
    msg = w.write(iter(_wire_rows()))
    w.abort([msg])
    assert not any(os.path.exists(s) for s in msg.staged)
    assert all(not _segments(str(tmp_path), "t", p) for p in (0, 1))


def test_retried_task_duplicate_never_published(tmp_path):
    """A speculative/failed attempt whose commit message never reaches
    the driver must stay invisible: only the winning attempt's staged
    segments are renamed, so offsets never re-map."""
    from osprey_spark.streaming.kafka_file import KafkaFileWriter, _segments

    w = KafkaFileWriter({"path": str(tmp_path), "topic": "t", "numpartitions": "1"})
    loser = w.write(iter(_wire_rows()))  # attempt 0: will "fail" post-write
    winner = w.write(iter(_wire_rows()))  # retry attempt
    w.commit([winner])
    w.abort([loser])
    segs = _segments(str(tmp_path), "t", 0)
    n = sum(1 for s in segs for _ in open(s))
    assert n == 6, f"duplicate records published: {n}"


def test_overwrite_mode_rejected(spark, tmp_path):
    register_kafka_file(spark)
    df = spark.createDataFrame([("a",)], "value string")
    with pytest.raises(Exception, match="append-only"):
        df.write.format("kafka_file").mode("overwrite").option(
            "path", str(tmp_path)
        ).option("topic", "t").save()


def test_missing_value_column_rejected(spark, tmp_path):
    register_kafka_file(spark)
    df = spark.createDataFrame([("a",)], "not_value string")
    with pytest.raises(Exception, match="value"):
        df.write.format("kafka_file").mode("append").option(
            "path", str(tmp_path)
        ).option("topic", "t").save()

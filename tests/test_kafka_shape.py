"""Kafka source/sink shape (ref: input_stream.py:413-444,
kafka_output_sink.py:12-35).

The container has no spark-sql-kafka jars (documented), so these
tests exercise everything short of the broker: constructed reader
options, the JSON value decode plan on static data, the produce
frame, and that the kafka code path is actually reachable from
StreamingRuleEngine (failing only at DATA_SOURCE_NOT_FOUND).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from osprey_spark.streaming import kafka
from osprey_spark.streaming.pipeline import TURNS_SCHEMA, StreamingRuleEngine


def test_source_options_shape():
    opts = kafka.kafka_source_options(
        "broker1:9092,broker2:9092", "turns", max_offsets_per_trigger=100_000
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "turns",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
        "maxOffsetsPerTrigger": "100000",
    }


def test_decode_kafka_turns_static(spark):
    turn = {"conv_id": "c1", "turn_idx": 3, "role": "user", "text": "hi",
            "tool": None, "ts": "2024-01-01T00:00:05"}
    raw = spark.createDataFrame(
        [(json.dumps(turn).encode(), "2024-01-01 00:00:06"), (b"not json", "2024-01-01 00:00:07")],
        "value binary, timestamp string",
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    out = kafka.decode_kafka_turns(raw, TURNS_SCHEMA).collect()
    good = next(r for r in out if r.conv_id == "c1")
    assert (good.turn_idx, good.role, good.text) == (3, "user", "hi")
    assert good._kafka_ingest_ts is not None
    # malformed value -> NULL fields, batch survives
    bad = next(r for r in out if r.conv_id is None)
    assert bad.text is None


def test_produce_frame_roundtrip(spark):
    df = spark.createDataFrame([("c1", 1, True)], "conv_id string, turn_idx int, flagged boolean")
    out = kafka.kafka_produce_frame(df).collect()[0]
    assert out.key == "c1"
    assert json.loads(out.value) == {"conv_id": "c1", "turn_idx": 1, "flagged": True}


def test_engine_kafka_path_reachable(spark, tmp_path):
    """The format switch exists end-to-end; without connector jars the
    failure is exactly the missing data source, not our code."""
    from osprey_spark.compiler import compile_ruleset

    eng = StreamingRuleEngine(
        spark,
        compile_ruleset({"main.sml": "T: str = JsonData(path='$.text')\n"}),
        input_dir="unused",
        output_dir=str(tmp_path / "out"),
        source_format="kafka",
        source_options=kafka.kafka_source_options("localhost:9092", "turns"),
    )
    with pytest.raises(Exception) as ei:
        eng.source()
    assert "kafka" in str(ei.value).lower()


def test_kafka_sink_options():
    sink = kafka.KafkaSink("localhost:9092", "verdicts")
    assert sink.options == {
        "kafka.bootstrap.servers": "localhost:9092",
        "topic": "verdicts",
    }

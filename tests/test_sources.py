"""Schema-enforced turns sources: parquet/JSONL/CSV round-trip
losslessly in batch AND streaming, and the streaming pipeline runs
end-to-end over a JSONL source (the reference's JSON-payload input
shape, ref input_stream.py)."""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F
import pytest

from osprey_spark.compiler import compile_ruleset
from osprey_spark.sources import TURNS_SCHEMA, read_turns, write_turns
from osprey_spark.streaming.pipeline import StreamingRuleEngine
from osprey_spark.turns import TURN_BINDINGS, generate_turns


def _sample(spark):
    return spark.createDataFrame(
        [
            ("c1", 0, "user", "hello, with , commas and \"quotes\"", None,
             datetime(2024, 1, 1, 10, 0, 0)),
            ("c1", 1, "assistant", "line\nbreak", "search",
             datetime(2024, 1, 1, 10, 0, 30)),
            ("c2", 0, "user", "", "exec", datetime(2024, 1, 1, 11, 0, 0)),
        ],
        TURNS_SCHEMA,
    )


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_turns_roundtrip_batch(spark, tmp_path, fmt):
    df = _sample(spark)
    path = str(tmp_path / fmt)
    write_turns(df, path, fmt=fmt)
    back = read_turns(spark, path, fmt=fmt)
    want = {tuple(r) for r in df.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want


@pytest.mark.parametrize("fmt", ["json", "parquet"])
def test_turns_roundtrip_streaming(spark, tmp_path, fmt):
    df = _sample(spark)
    path = str(tmp_path / fmt)
    write_turns(df, path, fmt=fmt)
    stream = read_turns(spark, path, fmt=fmt, streaming=True)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName(f"src_{fmt}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.sql(f"select * from src_{fmt}").collect()}
    assert got == {tuple(r) for r in df.collect()}


def test_read_turns_rejects_unknown_format(spark):
    with pytest.raises(ValueError):
        read_turns(spark, "/nowhere", fmt="avro")


def test_pipeline_over_jsonl_source(spark, tmp_path):
    """The full streaming engine (rules → exactly-once sink) over a
    JSONL directory instead of parquet."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    t = generate_turns(spark, n_convs=5, turns_per_conv=8, hot_convs=0,
                       late_fraction=0.0)
    write_turns(t.coalesce(1), in_dir, fmt="json", mode="append")

    rs = compile_ruleset(
        {"main.sml": "K: str = JsonData(path='$.conv_id')\n"
                     "N = IncrementWindow(key=K, window_seconds=600.0)\n"},
        bindings=TURN_BINDINGS,
    )
    eng = StreamingRuleEngine(
        spark, rs, in_dir, out_dir,
        passthrough=("conv_id", "turn_idx"),
        source_format="json",
    )
    eng.run_to_completion()
    rows = eng.results().collect()
    assert len(rows) == 40
    assert all(r["N"] >= 1 for r in rows)

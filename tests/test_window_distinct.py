"""GetWindowDistinct — fourth stateful family: distinct registered
values per key in the trailing event-time window (raid/brigading
signal). Batch = collect_set over a range window; streaming = the
fused state pass with an occurrence deque + two-pointer fold."""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F

from osprey_spark.compiler import compile_ruleset
from osprey_spark.compiler.compile import InputBindings, compile_sml
from osprey_spark.streaming.pipeline import StreamingRuleEngine
from osprey_spark.turns import TURN_BINDINGS, generate_turns, with_envelope

WD_SML = """
K: str = JsonData(path='$.k')
V: str = JsonData(path='$.v')
IsReg: bool = JsonData(path='$.reg', coerce_type='bool')
ND = GetWindowDistinct(key=K, value=V, window_seconds=60.0, when_all=[IsReg])
"""


def _apply(spark, sml, rows):
    import json

    data = [
        (i + 1, "a", json.dumps({k: v for k, v in r.items() if k != "_ts"}),
         r.get("_ts", datetime(2024, 1, 1)))
        for i, r in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "action_id long, action_name string, data string, ts timestamp"
    )
    rs = compile_sml(sml, bindings=InputBindings())
    return [r.asDict() for r in rs.apply(df).orderBy("__action_id").collect()]


def test_window_distinct_batch(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        {"k": "a", "v": "x", "reg": True, "_ts": t0},
        {"k": "a", "v": "y", "reg": True, "_ts": t0.replace(second=10)},
        {"k": "a", "v": "x", "reg": True, "_ts": t0.replace(second=20)},  # dup value
        {"k": "a", "v": "z", "reg": False, "_ts": t0.replace(second=30)},  # gated off
        {"k": "b", "v": "x", "reg": True, "_ts": t0.replace(second=30)},  # other key
        # outside the 60s window of the first rows
        {"k": "a", "v": "w", "reg": True, "_ts": t0.replace(minute=2)},
    ]
    out = _apply(spark, WD_SML, rows)
    assert [r["ND"] for r in out] == [1, 2, 2, 2, 1, 1]


def test_window_distinct_null_value_never_registers(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "reg": True, "_ts": t0},  # v missing -> NULL
        {"k": "a", "v": "x", "reg": True, "_ts": t0.replace(second=1)},
    ]
    out = _apply(spark, WD_SML, rows)
    assert [r["ND"] for r in out] == [0, 1]


STREAM_SML = """
K: str = JsonData(path='$.conv_id')
Role: str = JsonData(path='$.role')
Tool: str = JsonData(path='$.tool')
NTools = GetWindowDistinct(key=K, value=Tool, window_seconds=600.0)
N = IncrementWindow(key=K, window_seconds=600.0)
"""


def test_window_distinct_streams_fused(spark, tmp_path):
    """Distinct-tool counter + event counter on one key: a single
    fused state pass, streaming == batch across a micro-batch split
    (window content carried in the occurrence deque)."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    t = generate_turns(spark, n_convs=8, turns_per_conv=10, hot_convs=0, late_fraction=0.0)
    t.filter(F.col("turn_idx") < 5).coalesce(1).write.mode("append").parquet(in_dir)
    t.filter(F.col("turn_idx") >= 5).coalesce(1).write.mode("append").parquet(in_dir)

    def rs():
        return compile_ruleset({"main.sml": STREAM_SML}, bindings=TURN_BINDINGS)

    stream = spark.readStream.schema(spark.read.parquet(in_dir).schema).parquet(in_dir)
    plan = (
        rs()
        .apply(with_envelope(stream), passthrough=["conv_id", "turn_idx"])
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert plan.count("FlatMapGroupsInPandasWithState") == 1

    eng = StreamingRuleEngine(
        spark, rs(), in_dir, out_dir,
        passthrough=("conv_id", "turn_idx"), max_files_per_trigger=1,
    )
    eng.run_to_completion()
    got = {
        (r["conv_id"], r["turn_idx"]): (r["NTools"], r["N"])
        for r in eng.results().collect()
    }
    batch = rs().apply(
        with_envelope(spark.read.parquet(in_dir)),
        passthrough=["conv_id", "turn_idx"],
    )
    want = {
        (r["conv_id"], r["turn_idx"]): (r["NTools"], r["N"]) for r in batch.collect()
    }
    assert got == want and len(want) == 80
    assert any(v[0] > 0 for v in want.values())  # tools actually counted

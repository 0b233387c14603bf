"""GetSessionCount — fifth stateful family: events in the CURRENT
gap-bounded session per key (the "how deep into this dialogue burst"
signal from the north star's session-window rules). Batch = lag-gap
break → running session id → RANGE count; streaming = fused state
pass carrying (last event sec, open-session count)."""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F

from osprey_spark.compiler import compile_ruleset
from osprey_spark.compiler.compile import InputBindings, compile_sml
from osprey_spark.streaming.pipeline import StreamingRuleEngine
from osprey_spark.turns import TURN_BINDINGS, generate_turns, with_envelope

SC_SML = """
K: str = JsonData(path='$.k')
N = GetSessionCount(key=K, gap_seconds=60.0)
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


def test_session_count_batch(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        {"k": "a", "_ts": t0},
        {"k": "a", "_ts": t0.replace(second=30)},      # same session
        {"k": "a", "_ts": t0.replace(minute=1, second=30)},  # 60s gap -> same
        {"k": "b", "_ts": t0.replace(minute=1, second=30)},  # other key
        {"k": "a", "_ts": t0.replace(minute=3)},       # 90s gap -> NEW session
        {"k": "a", "_ts": t0.replace(minute=3, second=10)},
    ]
    out = _apply(spark, SC_SML, rows)
    assert [r["N"] for r in out] == [1, 2, 3, 1, 1, 2]


def test_session_count_ties_count_full_group(spark):
    """Equal-sec events share a session and each counts the whole tie
    group (RANGE semantics) — tie-order-independent."""
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "_ts": t0},
        {"k": "a", "_ts": t0.replace(second=10)},
        {"k": "a", "_ts": t0.replace(second=10)},  # tie
    ]
    out = _apply(spark, SC_SML, rows)
    assert [r["N"] for r in out] == [1, 3, 3]


STREAM_SML = """
K: str = JsonData(path='$.conv_id')
Depth = GetSessionCount(key=K, gap_seconds=120.0)
N = IncrementWindow(key=K, window_seconds=600.0)
"""


def test_session_count_streams_fused(spark, tmp_path):
    """Session depth + window counter on one key: ONE fused state
    pass; streaming == batch across a micro-batch split (the open
    session continues through carried state)."""
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
        (r["conv_id"], r["turn_idx"]): (r["Depth"], r["N"])
        for r in eng.results().collect()
    }
    batch = rs().apply(
        with_envelope(spark.read.parquet(in_dir)),
        passthrough=["conv_id", "turn_idx"],
    )
    want = {
        (r["conv_id"], r["turn_idx"]): (r["Depth"], r["N"]) for r in batch.collect()
    }
    assert got == want and len(want) == 80
    assert any(v[0] > 1 for v in want.values())  # sessions actually deepen

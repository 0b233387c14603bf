"""GetLastValue — sixth stateful family: the value registered by the
PREVIOUS same-key event (north star's "prior verdicts … in the state
store"). Batch = lag over a key window; streaming = fused state pass
carrying one string per key."""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F

from osprey_spark.compiler import compile_ruleset
from osprey_spark.compiler.compile import InputBindings, compile_sml
from osprey_spark.streaming.pipeline import StreamingRuleEngine
from osprey_spark.turns import TURN_BINDINGS, generate_turns, with_envelope

LV_SML = """
K: str = JsonData(path='$.k')
V: str = JsonData(path='$.v')
O: int = JsonData(path='$.o')
Prev = GetLastValue(key=K, value=V, order=O)
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


def test_last_value_batch(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "v": "x", "o": 1, "_ts": t0},
        {"k": "a", "v": "y", "o": 2, "_ts": t0.replace(second=10)},
        {"k": "b", "v": "z", "o": 1, "_ts": t0.replace(second=10)},
        {"k": "a", "v": "w", "o": 3, "_ts": t0.replace(second=20)},
    ]
    out = _apply(spark, LV_SML, rows)
    assert [r["Prev"] for r in out] == [None, "x", None, "y"]


def test_last_value_order_tiebreak(spark):
    """Equal-timestamp events order by the ``order`` column — the
    later-ordered tie row sees the earlier one's value."""
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "v": "first", "o": 2, "_ts": t0},   # order says SECOND
        {"k": "a", "v": "zero", "o": 1, "_ts": t0},    # order says FIRST
        {"k": "a", "v": "third", "o": 3, "_ts": t0},
    ]
    out = _apply(spark, LV_SML, rows)
    assert [r["Prev"] for r in out] == ["zero", None, "first"]


def test_last_value_null_value_propagates(spark):
    """A previous event that registered NULL yields NULL — lag
    semantics, documented."""
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "v": "x", "o": 1, "_ts": t0},
        {"k": "a", "v": None, "o": 2, "_ts": t0.replace(second=5)},
        {"k": "a", "v": "y", "o": 3, "_ts": t0.replace(second=9)},
    ]
    out = _apply(spark, LV_SML, rows)
    assert [r["Prev"] for r in out] == [None, "x", None]


STREAM_SML = """
K: str = JsonData(path='$.conv_id')
R: str = JsonData(path='$.role')
TI: int = JsonData(path='$.turn_idx')
PrevRole = GetLastValue(key=K, value=R, order=TI)
N = IncrementWindow(key=K, window_seconds=600.0)
"""


def test_last_value_streams_fused(spark, tmp_path):
    """Prior-value carry + window counter on one key: ONE fused state
    pass; streaming == batch across a micro-batch split (the carried
    string crosses the batch boundary)."""
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
        (r["conv_id"], r["turn_idx"]): (r["PrevRole"], r["N"])
        for r in eng.results().collect()
    }
    batch = rs().apply(
        with_envelope(spark.read.parquet(in_dir)),
        passthrough=["conv_id", "turn_idx"],
    )
    want = {
        (r["conv_id"], r["turn_idx"]): (r["PrevRole"], r["N"])
        for r in batch.collect()
    }
    assert got == want and len(want) == 80
    # prior values actually carry: every non-first turn sees a role
    assert all(
        v[0] is not None for k, v in want.items() if k[1] > 0
    ) and all(v[0] is None for k, v in want.items() if k[1] == 0)

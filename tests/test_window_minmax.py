"""GetWindowMax / GetWindowMin — eleventh stateful family: trailing
event-time window MAX/MIN of registered integer values per key
(largest transfer / fastest cadence signals). Batch = max/min over a
RANGE window; streaming = the fused state pass keeping ALL in-window
(sec, value) entries (no cross-batch envelope prune — late rows may
exclude the dominating entry) with a per-segment monotonic deque."""

from __future__ import annotations

import json
import os
from datetime import datetime

import pyspark.sql.functions as F
import pytest

from osprey_spark.compiler import compile_ruleset
from osprey_spark.compiler.compile import InputBindings, compile_sml
from osprey_spark.sml.errors import SmlValidationError
from osprey_spark.streaming.pipeline import StreamingRuleEngine
from osprey_spark.turns import TURN_BINDINGS, generate_turns, with_envelope

MM_SML = """
K: str = JsonData(path='$.k')
V: int = JsonData(path='$.v', coerce_type='int')
IsReg: bool = JsonData(path='$.reg', coerce_type='bool')
Mx = GetWindowMax(key=K, value=V, window_seconds=60.0, when_all=[IsReg])
Mn = GetWindowMin(key=K, value=V, window_seconds=60.0)
"""


def _apply(spark, sml, rows):
    data = [
        (
            i + 1,
            "a",
            json.dumps({k: v for k, v in r.items() if k != "_ts"}),
            r.get("_ts", datetime(2024, 1, 1)),
        )
        for i, r in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "action_id long, action_name string, data string, ts timestamp"
    )
    rs = compile_sml(sml, bindings=InputBindings())
    return [r.asDict() for r in rs.apply(df).orderBy("__action_id").collect()]


def test_window_minmax_batch(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        {"k": "a", "v": 5, "reg": True, "_ts": t0},
        {"k": "a", "v": 9, "reg": True, "_ts": t0.replace(second=10)},
        {"k": "a", "v": 3, "reg": True, "_ts": t0.replace(second=20)},
        {"k": "a", "v": 20, "reg": False, "_ts": t0.replace(second=30)},  # gated
        {"k": "b", "v": 7, "reg": True, "_ts": t0.replace(second=30)},
        # 9 and 5 expired from the 60s window; 3 (sec=20) still in at 1:10
        {"k": "a", "v": 4, "reg": True, "_ts": t0.replace(minute=1, second=10)},
    ]
    out = _apply(spark, MM_SML, rows)
    assert [r["Mx"] for r in out] == [5, 9, 9, 9, 7, 4]
    # Mn is ungated: the gated-off 20 still registers for it
    assert [r["Mn"] for r in out] == [5, 5, 3, 3, 7, 3]


def test_window_minmax_empty_window_is_null(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "v": 8, "reg": False, "_ts": t0},  # Mx gated off
        {"k": "a", "v": 2, "reg": True, "_ts": t0.replace(second=1)},
    ]
    out = _apply(spark, MM_SML, rows)
    assert [r["Mx"] for r in out] == [None, 2]
    assert [r["Mn"] for r in out] == [8, 2]


def test_window_minmax_tie_group_inclusive(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "v": 1, "reg": True, "_ts": t0},
        {"k": "a", "v": 9, "reg": True, "_ts": t0},  # same second
    ]
    out = _apply(spark, MM_SML, rows)
    assert [r["Mx"] for r in out] == [9, 9]
    assert [r["Mn"] for r in out] == [1, 1]


def test_window_minmax_rejects_bad_window(spark):
    with pytest.raises(SmlValidationError):
        compile_sml(
            """
K: str = JsonData(path='$.k')
V: int = JsonData(path='$.v', coerce_type='int')
M = GetWindowMax(key=K, value=V, window_seconds=0.5)
""",
            bindings=InputBindings(),
        )


STREAM_SML = """
K: str = JsonData(path='$.conv_id')
T: str = JsonData(path='$.text')
L: int = StringLength(s=T)
Mx = GetWindowMax(key=K, value=L, window_seconds=600.0)
Mn = GetWindowMin(key=K, value=L, window_seconds=600.0)
N = IncrementWindow(key=K, window_seconds=600.0)
"""


def test_window_minmax_streams_fused(spark, tmp_path):
    """Max + min + event counter on one key: a single fused state
    pass, streaming == batch across a micro-batch split (in-window
    entries carried in the state store)."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    t = generate_turns(
        spark, n_convs=8, turns_per_conv=10, hot_convs=0, late_fraction=0.0
    )
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
        spark,
        rs(),
        in_dir,
        out_dir,
        passthrough=("conv_id", "turn_idx"),
        max_files_per_trigger=1,
    )
    eng.run_to_completion()
    got = {
        (r["conv_id"], r["turn_idx"]): (r["Mx"], r["Mn"], r["N"])
        for r in eng.results().collect()
    }
    batch = rs().apply(
        with_envelope(spark.read.parquet(in_dir)),
        passthrough=["conv_id", "turn_idx"],
    )
    want = {
        (r["conv_id"], r["turn_idx"]): (r["Mx"], r["Mn"], r["N"])
        for r in batch.collect()
    }
    assert got == want and len(want) == 80
    assert any(v[0] != v[1] for v in want.values())  # max/min actually differ

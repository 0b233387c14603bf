"""GetWindowSum — seventh stateful family: trailing-window SUM of
per-event integer amounts (token budgets, weighted rate rules). Batch
= sum over a key RANGE window; streaming = fused state pass carrying
in-window non-zero (sec, amount) entries."""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F

from osprey_spark.compiler import compile_ruleset
from osprey_spark.compiler.compile import InputBindings, compile_sml
from osprey_spark.streaming.pipeline import StreamingRuleEngine
from osprey_spark.turns import TURN_BINDINGS, generate_turns, with_envelope

WS_SML = """
K: str = JsonData(path='$.k')
A: int = JsonData(path='$.a')
S = GetWindowSum(key=K, value=A, window_seconds=60.0)
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


def test_window_sum_batch(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "a": 5, "_ts": t0},
        {"k": "a", "a": 7, "_ts": t0.replace(second=30)},     # in window
        {"k": "b", "a": 100, "_ts": t0.replace(second=30)},   # other key
        {"k": "a", "a": 1, "_ts": t0.replace(minute=1, second=10)},  # first expired
    ]
    out = _apply(spark, WS_SML, rows)
    assert [r["S"] for r in out] == [5, 12, 100, 8]


def test_window_sum_ties_and_nulls(spark):
    """Equal-sec events see the whole tie group (RANGE semantics);
    NULL amounts register 0."""
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "a": 3, "_ts": t0},
        {"k": "a", "a": 4, "_ts": t0},          # tie: both see 7
        {"k": "a", "a": None, "_ts": t0.replace(second=5)},  # NULL -> 0
    ]
    out = _apply(spark, WS_SML, rows)
    assert [r["S"] for r in out] == [7, 7, 7]


GATED_SML = """
K: str = JsonData(path='$.k')
A: int = JsonData(path='$.a')
Role: str = JsonData(path='$.role')
S = GetWindowSum(key=K, value=A, window_seconds=60.0, gate=Role == 'assistant')
"""


def test_window_sum_gate(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "a": 5, "role": "assistant", "_ts": t0},
        {"k": "a", "a": 9, "role": "user", "_ts": t0.replace(second=10)},
        {"k": "a", "a": 2, "role": "assistant", "_ts": t0.replace(second=20)},
    ]
    out = _apply(spark, GATED_SML, rows)
    assert [r["S"] for r in out] == [5, 5, 7]


def test_window_sum_rejects_float_value(spark):
    import pytest

    from osprey_spark.sml.errors import SmlValidationError

    bad = """
K: str = JsonData(path='$.k')
A: float = JsonData(path='$.a')
S = GetWindowSum(key=K, value=A, window_seconds=60.0)
"""
    with pytest.raises(SmlValidationError, match="integer"):
        compile_sml(bad, bindings=InputBindings())


STREAM_SML = """
K: str = JsonData(path='$.conv_id')
Text: str = JsonData(path='$.text')
NTok: int = ListLength(list=StringSplit(s=Text, sep=' '))
WinTokens = GetWindowSum(key=K, value=NTok, window_seconds=600.0)
Depth = GetSessionCount(key=K, gap_seconds=3600.0)
"""


def test_window_sum_streams_fused(spark, tmp_path):
    """Token-budget window + session depth on one key: ONE fused
    state pass; streaming == batch across a micro-batch split (the
    in-window amounts cross the batch boundary)."""
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
        (r["conv_id"], r["turn_idx"]): (r["WinTokens"], r["Depth"])
        for r in eng.results().collect()
    }
    batch = rs().apply(
        with_envelope(spark.read.parquet(in_dir)),
        passthrough=["conv_id", "turn_idx"],
    )
    want = {
        (r["conv_id"], r["turn_idx"]): (r["WinTokens"], r["Depth"])
        for r in batch.collect()
    }
    assert got == want and len(want) == 80
    assert any(v[0] > 0 for v in want.values())


# --------------------------------------------------------------------------
# sweep-line interval concurrency
# --------------------------------------------------------------------------


def _ic_turns(spark, rows):
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    data = [(k, t0 + dt.timedelta(seconds=s)) for k, s in rows]
    return spark.createDataFrame(data, "conv_id string, ts timestamp")


def test_interval_concurrency_known_answer(spark):
    """Three overlapping conversations within one hour + one in the
    next hour: peak 3 in hour 1, base carries into hour 2."""
    from osprey_spark.operators.windows import interval_concurrency

    rows = [
        ("a", 0), ("a", 100),      # open [0, 101)
        ("b", 50), ("b", 300),     # open [50, 301)
        ("c", 90), ("c", 95),      # open [90, 96) -> all three at t=90..95
        ("d", 3700), ("d", 3800),  # next hour
    ]
    out = {
        r["bucket_start"]: (r["max_concurrent"], r["end_concurrent"])
        for r in interval_concurrency(_ic_turns(spark, rows), bucket_s=3600).collect()
    }
    base = int(
        __import__("datetime").datetime(2025, 1, 1).timestamp()
    )
    h0 = (base // 3600) * 3600
    assert out[h0] == (3, 0)          # peak 3, all closed by hour end
    assert out[h0 + 3600] == (1, 0)


def test_interval_concurrency_cross_bucket_carry(spark):
    """A conversation spanning two hours keeps the second hour's base
    at 1 even before its own events there."""
    from osprey_spark.operators.windows import interval_concurrency

    rows = [
        ("long", 100), ("long", 7000),   # open across hours 0 and 1
        ("x", 3700), ("x", 3710),
    ]
    out = {
        r["bucket_start"]: (r["max_concurrent"], r["end_concurrent"])
        for r in interval_concurrency(_ic_turns(spark, rows), bucket_s=3600).collect()
    }
    base = int(__import__("datetime").datetime(2025, 1, 1).timestamp())
    h0 = (base // 3600) * 3600
    assert out[h0] == (1, 1)             # long still open at hour end
    assert out[h0 + 3600] == (2, 0)      # long + x overlap in hour 1
    import pytest as _pt

    with _pt.raises(ValueError):
        interval_concurrency(_ic_turns(spark, rows), bucket_s=0)


def test_interval_concurrency_closing_only_bucket_peaks_at_carry_in(spark):
    """ADVICE r3: a bucket whose ONLY delta is a closing must report
    the carried-in level as its peak — the conversation was open from
    bucket start until its close, so max_concurrent is the carry-in
    (1), not carry-in + the -1 delta (0)."""
    from osprey_spark.operators.windows import interval_concurrency

    rows = [("span", 100), ("span", 7300)]  # open [100, 7301): closes in hour 2
    out = {
        r["bucket_start"]: (r["max_concurrent"], r["end_concurrent"])
        for r in interval_concurrency(_ic_turns(spark, rows), bucket_s=3600).collect()
    }
    base = int(__import__("datetime").datetime(2025, 1, 1).timestamp())
    h0 = (base // 3600) * 3600
    assert out[h0] == (1, 1)
    # hour 1 has no deltas -> absent by contract
    assert h0 + 3600 not in out
    assert out[h0 + 7200] == (1, 0)  # pre-fix this read (0, 0)

"""RateLimit — ninth stateful family: integer-exact token bucket
(allow/deny with continuous refill, denials consume nothing). Batch =
narrow applyInPandas fold joined back by row id; streaming = fused
state pass carrying [tokens_units, last_sec] per key."""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F
import pytest

from osprey_spark.compiler import compile_ruleset
from osprey_spark.compiler.compile import InputBindings, compile_sml
from osprey_spark.sml.errors import SmlValidationError
from osprey_spark.streaming.pipeline import StreamingRuleEngine
from osprey_spark.turns import TURN_BINDINGS, generate_turns, with_envelope

# 1 token per 60 s, burst 2, cost 1 -> units: rate=1/s, cap=120, cost=60
RL_SML = """
K: str = JsonData(path='$.k')
I: int = JsonData(path='$.i')
Allowed = RateLimit(key=K, limit=1, per_seconds=60, burst=2, order=I)
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


def test_rate_limit_batch(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "i": 0, "_ts": t0},                       # full: 120-60=60
        {"k": "a", "i": 1, "_ts": t0.replace(second=10)},    # 70-60=10: allow
        {"k": "a", "i": 2, "_ts": t0.replace(second=20)},    # 20 < 60: deny
        {"k": "a", "i": 3, "_ts": t0.replace(second=30)},    # 30 < 60: deny
        {"k": "a", "i": 4, "_ts": t0.replace(minute=1)},     # 60: allow -> 0
        {"k": "b", "i": 0, "_ts": t0.replace(minute=1)},     # new key: full
    ]
    out = _apply(spark, RL_SML, rows)
    assert [r["Allowed"] for r in out] == [True, True, False, False, True, True]


def test_rate_limit_order_tiebreak(spark):
    """Equal-second events consume in order= sequence: with burst 2,
    the first two of three simultaneous events pass."""
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "i": 2, "_ts": t0},
        {"k": "a", "i": 0, "_ts": t0},
        {"k": "a", "i": 1, "_ts": t0},
    ]
    out = _apply(spark, RL_SML, rows)
    by_i = {r["I"]: r["Allowed"] for r in out}
    assert by_i == {0: True, 1: True, 2: False}


def test_rate_limit_rejects_fractional_params(spark):
    bad = """
K: str = JsonData(path='$.k')
Allowed = RateLimit(key=K, limit=0.5, per_seconds=60)
"""
    with pytest.raises(SmlValidationError, match="positive integer"):
        compile_sml(bad, bindings=InputBindings())


STREAM_SML = """
K: str = JsonData(path='$.conv_id')
TI: int = JsonData(path='$.turn_idx')
Allowed = RateLimit(key=K, limit=1, per_seconds=120, burst=2, order=TI)
Depth = GetSessionCount(key=K, gap_seconds=3600.0)
"""


def test_rate_limit_streams_fused(spark, tmp_path):
    """Throttle + session depth on one key: ONE fused state pass;
    streaming == batch across a micro-batch split (the bucket level
    crosses the batch boundary)."""
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
        (r["conv_id"], r["turn_idx"]): (r["Allowed"], r["Depth"])
        for r in eng.results().collect()
    }
    batch = rs().apply(
        with_envelope(spark.read.parquet(in_dir)),
        passthrough=["conv_id", "turn_idx"],
    )
    want = {
        (r["conv_id"], r["turn_idx"]): (r["Allowed"], r["Depth"])
        for r in batch.collect()
    }
    assert got == want and len(want) == 80
    allows = [v[0] for v in want.values()]
    assert any(allows) and not all(allows)  # both outcomes exercised

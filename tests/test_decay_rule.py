"""GetDecayScore — thirteenth stateful family: integer-exact
exponentially decayed activity per key. Batch = HOF fold over the
unbounded key RANGE window; streaming = fused state pass carrying
in-horizon per-second amounts (entries older than 20 halflife buckets
behind the key's newest event weigh zero and are evicted)."""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F

from osprey_spark.compiler import compile_ruleset
from osprey_spark.compiler.compile import InputBindings, compile_sml
from osprey_spark.streaming.pipeline import StreamingRuleEngine
from osprey_spark.turns import TURN_BINDINGS, generate_turns, with_envelope

BASE = 1 << 20

DY_SML = """
K: str = JsonData(path='$.k')
Heat = GetDecayScore(key=K, halflife_seconds=60.0)
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


def test_decay_score_batch(spark):
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        {"k": "a", "_ts": t0},                          # BASE
        {"k": "a", "_ts": t0.replace(minute=1)},        # BASE + BASE>>1
        {"k": "b", "_ts": t0.replace(minute=1)},        # other key: BASE
        {"k": "a", "_ts": t0.replace(minute=3)},        # BASE + >>2 + >>3
    ]
    out = _apply(spark, DY_SML, rows)
    assert [r["Heat"] for r in out] == [
        BASE,
        BASE + (BASE >> 1),
        BASE,
        BASE + (BASE >> 2) + (BASE >> 3),
    ]


def test_decay_score_ties_values_and_horizon(spark):
    """Equal-sec events see the whole tie group (RANGE semantics);
    `value` weights registrations; registrations >20 halflives old
    weigh exactly zero."""
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    sml = """
K: str = JsonData(path='$.k')
A: int = JsonData(path='$.a')
Heat = GetDecayScore(key=K, value=A, halflife_seconds=60.0)
"""
    rows = [
        {"k": "a", "a": 2, "_ts": t0},
        {"k": "a", "a": 3, "_ts": t0},                     # tie: both see 5*BASE
        {"k": "a", "a": 1, "_ts": t0.replace(hour=1)},     # 60 buckets later
    ]
    out = _apply(spark, sml, rows)
    assert [r["Heat"] for r in out] == [5 * BASE, 5 * BASE, BASE]


def test_decay_score_gate(spark):
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    sml = """
K: str = JsonData(path='$.k')
Role: str = JsonData(path='$.role')
Heat = GetDecayScore(key=K, halflife_seconds=60.0, gate=Role == 'assistant')
"""
    rows = [
        {"k": "a", "role": "assistant", "_ts": t0},
        {"k": "a", "role": "user", "_ts": t0.replace(minute=1)},
        {"k": "a", "role": "assistant", "_ts": t0.replace(minute=2)},
    ]
    out = _apply(spark, sml, rows)
    # gated-off user turn registers nothing but still reads
    assert [r["Heat"] for r in out] == [
        BASE,
        BASE >> 1,
        BASE + (BASE >> 2),
    ]


def test_decay_score_rejects_float_value(spark):
    import pytest

    from osprey_spark.sml.errors import SmlValidationError

    bad = """
K: str = JsonData(path='$.k')
A: float = JsonData(path='$.a')
Heat = GetDecayScore(key=K, value=A, halflife_seconds=60.0)
"""
    with pytest.raises(SmlValidationError, match="integer"):
        compile_sml(bad, bindings=InputBindings())


STREAM_SML = """
K: str = JsonData(path='$.conv_id')
Heat = GetDecayScore(key=K, halflife_seconds=600.0)
Depth = GetSessionCount(key=K, gap_seconds=3600.0)
"""


def test_decay_score_streams_fused(spark, tmp_path):
    """Decay heat + session depth on one key: ONE fused state pass;
    streaming == batch across a micro-batch split (carried per-second
    amounts cross the batch boundary and late-ordered files exercise
    the re-sort)."""
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
        (r["conv_id"], r["turn_idx"]): (r["Heat"], r["Depth"])
        for r in eng.results().collect()
    }
    batch = rs().apply(
        with_envelope(spark.read.parquet(in_dir)),
        passthrough=["conv_id", "turn_idx"],
    )
    want = {
        (r["conv_id"], r["turn_idx"]): (r["Heat"], r["Depth"])
        for r in batch.collect()
    }
    assert got == want and len(want) == 80
    assert any(v[0] > BASE for v in want.values())

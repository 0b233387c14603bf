"""SeenBefore — twelfth stateful family: lifetime-exact repeated-
content membership per key. Batch = conditional count over a
(key, value) RANGE window; streaming = fused state pass carrying the
two smallest registration seconds per (key, value) (min-merged, so
late rows stay exact and state is 2 longs per distinct value)."""

from __future__ import annotations

import json
import os
from datetime import datetime

import pyspark.sql.functions as F

from osprey_spark.compiler import compile_ruleset
from osprey_spark.compiler.compile import InputBindings, compile_sml
from osprey_spark.streaming.pipeline import StreamingRuleEngine
from osprey_spark.turns import TURN_BINDINGS, generate_turns, with_envelope

SB_SML = """
K: str = JsonData(path='$.k')
V: str = JsonData(path='$.v')
IsReg: bool = JsonData(path='$.reg', coerce_type='bool')
Seen = SeenBefore(key=K, value=V, when_all=[IsReg])
SeenAll = SeenBefore(key=K, value=V)
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


def test_seen_before_batch(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        {"k": "a", "v": "x", "reg": True, "_ts": t0},                      # first x
        {"k": "a", "v": "y", "reg": True, "_ts": t0.replace(second=10)},   # first y
        {"k": "a", "v": "x", "reg": True, "_ts": t0.replace(second=20)},   # repeat!
        {"k": "a", "v": "x", "reg": False, "_ts": t0.replace(second=30)},  # reader
        {"k": "b", "v": "x", "reg": True, "_ts": t0.replace(second=30)},   # other key
        {"k": "a", "v": "z", "reg": False, "_ts": t0.replace(second=40)},  # unregistered reader
    ]
    out = _apply(spark, SB_SML, rows)
    assert [r["Seen"] for r in out] == [False, False, True, True, False, False]
    # ungated variant: the gated-off x at :30 registers too
    assert [r["SeenAll"] for r in out] == [False, False, True, True, False, False]


def test_seen_before_tie_group(spark):
    """Two registrations of the same value in the SAME second both
    read True (tie-order independent); a lone registration does not."""
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "v": "x", "reg": True, "_ts": t0},
        {"k": "a", "v": "x", "reg": True, "_ts": t0},  # same second
        {"k": "a", "v": "y", "reg": True, "_ts": t0},
    ]
    out = _apply(spark, SB_SML, rows)
    assert [r["Seen"] for r in out] == [True, True, False]


def test_seen_before_null_value_reads_false(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "reg": True, "_ts": t0},  # v missing -> NULL
        {"k": "a", "reg": True, "_ts": t0.replace(second=1)},  # NULL again
    ]
    out = _apply(spark, SB_SML, rows)
    assert [r["Seen"] for r in out] == [False, False]


STREAM_SML = """
K: str = JsonData(path='$.conv_id')
T: str = JsonData(path='$.tool')
Seen = SeenBefore(key=K, value=T)
N = IncrementWindow(key=K, window_seconds=600.0)
"""


def test_seen_before_streams_fused(spark, tmp_path):
    """Repeat detector + event counter on one key: a single fused
    state pass, streaming == batch across a micro-batch split (the
    two-smallest pairs carried in the state store). The tool column's
    5-value domain guarantees repeats; its NULLs (non-tool turns)
    exercise the always-False path."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    t = generate_turns(
        spark, n_convs=6, turns_per_conv=14, hot_convs=0, late_fraction=0.0
    )
    t.filter(F.col("turn_idx") < 7).coalesce(1).write.mode("append").parquet(in_dir)
    t.filter(F.col("turn_idx") >= 7).coalesce(1).write.mode("append").parquet(in_dir)

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
        (r["conv_id"], r["turn_idx"]): (r["Seen"], r["N"])
        for r in eng.results().collect()
    }
    batch = rs().apply(
        with_envelope(spark.read.parquet(in_dir)),
        passthrough=["conv_id", "turn_idx"],
    )
    want = {
        (r["conv_id"], r["turn_idx"]): (r["Seen"], r["N"]) for r in batch.collect()
    }
    assert got == want and len(want) == 84
    assert any(v[0] for v in want.values())  # repeats actually detected
    assert not all(v[0] for v in want.values())

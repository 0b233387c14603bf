"""GetKeyAge — eighth stateful family: seconds since the key's first
observed event (new-entity / young-conversation gate). Batch = sec -
min(sec) over a key RANGE window; streaming = fused state pass
carrying ONE long per key with a min fold for late arrivals."""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F

from osprey_spark.compiler import compile_ruleset
from osprey_spark.compiler.compile import InputBindings, compile_sml
from osprey_spark.streaming.pipeline import StreamingRuleEngine
from osprey_spark.turns import TURN_BINDINGS, generate_turns, with_envelope

KA_SML = """
K: str = JsonData(path='$.k')
Age = GetKeyAge(key=K)
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


def test_key_age_batch(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "_ts": t0},
        {"k": "a", "_ts": t0.replace(second=45)},
        {"k": "b", "_ts": t0.replace(second=45)},           # other key: first
        {"k": "a", "_ts": t0.replace(minute=2, second=30)},
    ]
    out = _apply(spark, KA_SML, rows)
    assert [r["Age"] for r in out] == [0, 45, 0, 150]


def test_key_age_ties(spark):
    """Equal-sec events all see the tie group's min (RANGE window) —
    both simultaneous first events report age 0."""
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "_ts": t0},
        {"k": "a", "_ts": t0},
        {"k": "a", "_ts": t0.replace(second=9)},
    ]
    out = _apply(spark, KA_SML, rows)
    assert [r["Age"] for r in out] == [0, 0, 9]


STREAM_SML = """
K: str = JsonData(path='$.conv_id')
Age = GetKeyAge(key=K)
Depth = GetSessionCount(key=K, gap_seconds=3600.0)
"""


def test_key_age_streams_fused(spark, tmp_path):
    """Conversation age + session depth on one key: ONE fused state
    pass; streaming == batch across a micro-batch split (the carried
    first-seen second crosses the batch boundary)."""
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
        (r["conv_id"], r["turn_idx"]): (r["Age"], r["Depth"])
        for r in eng.results().collect()
    }
    batch = rs().apply(
        with_envelope(spark.read.parquet(in_dir)),
        passthrough=["conv_id", "turn_idx"],
    )
    want = {
        (r["conv_id"], r["turn_idx"]): (r["Age"], r["Depth"])
        for r in batch.collect()
    }
    assert got == want and len(want) == 80
    assert any(v[0] > 0 for v in want.values())

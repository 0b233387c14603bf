"""GetTransitionEntropy — fourteenth stateful family: running
transition-entropy of the key's state sequence (the scripted-bot
predictability signal). Batch = two windows via the telescoped
quantized c·ln c deltas; streaming = fused state pass carrying
(last_symbol, n, Σq, pair-count map)."""

from __future__ import annotations

import math
import os
from datetime import datetime, timedelta

import pyspark.sql.functions as F

from osprey_spark.compiler import compile_ruleset
from osprey_spark.compiler.compile import InputBindings, compile_sml
from osprey_spark.streaming.pipeline import StreamingRuleEngine
from osprey_spark.turns import TURN_BINDINGS, generate_turns, with_envelope

TE_SML = """
K: str = JsonData(path='$.k')
S: str = JsonData(path='$.s')
T: int = JsonData(path='$.i')
Ent = GetTransitionEntropy(key=K, state=S, order=T)
"""


def _apply(spark, sml, rows):
    import json

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    data = [
        (
            i + 1,
            "a",
            json.dumps({k: v for k, v in r.items() if k != "_ts"}),
            r.get("_ts", t0 + timedelta(seconds=i)),
        )
        for i, r in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "action_id long, action_name string, data string, ts timestamp"
    )
    rs = compile_sml(sml, bindings=InputBindings())
    return [r.asDict() for r in rs.apply(df).orderBy("__action_id").collect()]


def _replica(seq):
    """Pure-Python mirror of the quantized running entropy."""
    out, last, n, sq, cnts = [], None, 0, 0, {}
    for ch in seq:
        if last is not None:
            pr = last + "\x01" + ch
            c = cnts.get(pr, 0) + 1
            cnts[pr] = c
            r1 = math.floor(c * math.log(c) * 1e9 + 0.5)
            r0 = (
                math.floor((c - 1) * math.log(c - 1) * 1e9 + 0.5)
                if c >= 2
                else 0
            )
            sq += r1 - r0
            n += 1
            h = math.log(n) - sq / (1e9 * n)
            out.append(math.floor(h * 1e6 + 0.5) / 1e6)
        else:
            out.append(0.0)
        last = ch
    return out


def test_entropy_batch_known_sequence(spark):
    seq = ["a", "b", "a", "b", "a", "c", "a", "b"]
    rows = [{"k": "x", "s": ch, "i": i} for i, ch in enumerate(seq)]
    out = _apply(spark, TE_SML, rows)
    exp = _replica(seq)
    assert [r["Ent"] for r in out] == exp
    # sanity on the shape: first event 0, first transition 0 (one
    # pair, deterministic), entropy rises when a new pair appears
    assert exp[0] == 0.0 and exp[1] == 0.0 and exp[2] == round(math.log(2), 6)


def test_entropy_loop_vs_varied(spark):
    loop = ["a", "b"] * 10
    varied = ["a", "b", "c", "a", "c", "b", "b", "a", "c", "c",
              "b", "a", "a", "c", "b", "c", "a", "b", "c", "a"]
    rows = [{"k": "loop", "s": ch, "i": i} for i, ch in enumerate(loop)]
    rows += [{"k": "var", "s": ch, "i": i} for i, ch in enumerate(varied)]
    out = _apply(spark, TE_SML, rows)
    finals = {}
    for r in out:
        finals[r["K"]] = r["Ent"]
    # the two-symbol loop saturates at ln(2); the varied walk goes higher
    assert abs(finals["loop"] - math.log(2)) < 0.05
    assert finals["var"] > finals["loop"] + 0.4


def test_entropy_null_state_and_keys(spark):
    rows = [
        {"k": "x", "s": "a", "i": 0},
        {"k": "x", "s": None, "i": 1},
        {"k": "x", "s": "a", "i": 2},
        {"k": "y", "s": "a", "i": 0},
    ]
    out = _apply(spark, TE_SML, rows)
    exp = _replica(["a", "\x00", "a"])
    assert [r["Ent"] for r in out[:3]] == exp
    assert out[3]["Ent"] == 0.0  # other key restarts


STREAM_SML = """
K: str = JsonData(path='$.conv_id')
R: str = JsonData(path='$.role')
T: int = JsonData(path='$.turn_idx')
Ent = GetTransitionEntropy(key=K, state=R, order=T)
Depth = GetSessionCount(key=K, gap_seconds=3600.0)
"""


def test_entropy_streams_fused(spark, tmp_path):
    """Entropy + session depth on one key: ONE fused state pass;
    streaming == batch across a micro-batch split (the pair-count map
    and last-symbol carry the batch boundary)."""
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
        spark, rs(), in_dir, out_dir,
        passthrough=("conv_id", "turn_idx"), max_files_per_trigger=1,
    )
    eng.run_to_completion()
    got = {
        (r["conv_id"], r["turn_idx"]): (r["Ent"], r["Depth"])
        for r in eng.results().collect()
    }
    batch = rs().apply(
        with_envelope(spark.read.parquet(in_dir)),
        passthrough=["conv_id", "turn_idx"],
    )
    want = {
        (r["conv_id"], r["turn_idx"]): (r["Ent"], r["Depth"])
        for r in batch.collect()
    }
    assert got == want and len(want) == 80
    # the signal is alive: some conversation reaches positive entropy
    assert any(v[0] > 0.3 for v in want.values())

"""GetUniqueCount — tenth stateful family: LIFETIME distinct
registered values per key (distinct IPs per account / distinct tools
per conversation — monotone, never expires). Batch = collect_set over
an UNBOUNDED range window; streaming = the fused state pass carrying
the seen-value set, bounded by ``cap`` under the exact-clamp
contract (clamped streaming count == clamped batch count always)."""

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

UC_SML = """
K: str = JsonData(path='$.k')
V: str = JsonData(path='$.v')
IsReg: bool = JsonData(path='$.reg', coerce_type='bool')
NU = GetUniqueCount(key=K, value=V, when_all=[IsReg])
NC = GetUniqueCount(key=K, value=V, cap=2)
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


def test_unique_count_batch(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        {"k": "a", "v": "x", "reg": True, "_ts": t0},
        {"k": "a", "v": "y", "reg": True, "_ts": t0.replace(second=10)},
        {"k": "a", "v": "x", "reg": True, "_ts": t0.replace(second=20)},  # dup
        {"k": "a", "v": "z", "reg": False, "_ts": t0.replace(second=30)},  # gated
        {"k": "b", "v": "x", "reg": True, "_ts": t0.replace(second=30)},  # other key
        # far later: NOTHING expires (lifetime, unlike GetWindowDistinct)
        {"k": "a", "v": "w", "reg": True, "_ts": t0.replace(hour=5)},
    ]
    out = _apply(spark, UC_SML, rows)
    assert [r["NU"] for r in out] == [1, 2, 2, 2, 1, 3]
    # ungated capped counter sees z too; clamps at 2 from row 2 on
    assert [r["NC"] for r in out] == [1, 2, 2, 2, 1, 2]


def test_unique_count_tie_group_inclusive(spark):
    """Equal-second rows all see the whole tie group (RANGE window
    semantics), so results are independent of Spark's tie order."""
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "v": "x", "reg": True, "_ts": t0},
        {"k": "a", "v": "y", "reg": True, "_ts": t0},  # same second
        {"k": "a", "v": "z", "reg": True, "_ts": t0},  # same second
    ]
    out = _apply(spark, UC_SML, rows)
    assert [r["NU"] for r in out] == [3, 3, 3]


def test_unique_count_null_value_never_registers(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        {"k": "a", "reg": True, "_ts": t0},  # v missing -> NULL
        {"k": "a", "v": "x", "reg": True, "_ts": t0.replace(second=1)},
    ]
    out = _apply(spark, UC_SML, rows)
    assert [r["NU"] for r in out] == [0, 1]


def test_unique_count_rejects_bad_cap(spark):
    with pytest.raises(SmlValidationError):
        compile_sml(
            """
K: str = JsonData(path='$.k')
V: str = JsonData(path='$.v')
N = GetUniqueCount(key=K, value=V, cap=-1)
""",
            bindings=InputBindings(),
        )


STREAM_SML = """
K: str = JsonData(path='$.conv_id')
Tool: str = JsonData(path='$.tool')
NTools = GetUniqueCount(key=K, value=Tool)
NCap = GetUniqueCount(key=K, value=Tool, cap=2)
N = IncrementWindow(key=K, window_seconds=600.0)
"""


def test_unique_count_late_row_is_exact(spark, tmp_path):
    """A LATE ROW (event-time earlier than already-carried
    registrations) must report the BATCH value: the state carries
    each value's FIRST-SEEN second, so the late row excludes values
    registered after its own second. A bare value-set state would
    report 3 here. (Rows already emitted in earlier micro-batches
    cannot be revised by later-arriving registrations — inherent to
    streaming emission — so the assertion targets the final batch's
    rows, whose inputs are complete.)"""
    import json as _json
    from datetime import datetime

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)

    def turn(idx, sec, tool):
        return (
            "c1",
            idx,
            "user",
            "m",
            tool,
            datetime(2024, 1, 1, 0, 0, 0).replace(
                minute=sec // 60, second=sec % 60
            ),
        )

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    # batch 1: registrations at sec 100 (x) and 200 (y)
    spark.createDataFrame(
        [turn(0, 100, "x"), turn(1, 200, "y")], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    # batch 2: a LATE row at sec 150 registering z
    spark.createDataFrame([turn(2, 150, "z")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    def rs():
        return compile_ruleset({"main.sml": STREAM_SML}, bindings=TURN_BINDINGS)

    eng = StreamingRuleEngine(
        spark,
        rs(),
        in_dir,
        out_dir,
        passthrough=("conv_id", "turn_idx"),
        max_files_per_trigger=1,
    )
    eng.run_to_completion()
    got = {r["turn_idx"]: r["NTools"] for r in eng.results().collect()}
    # the late row sees x (sec 100) and itself (z, 150) but NOT y (200)
    assert got[2] == 2
    # batch recompute agrees on the late row
    batch = rs().apply(
        with_envelope(spark.read.parquet(in_dir)),
        passthrough=["conv_id", "turn_idx"],
    )
    want = {r["turn_idx"]: r["NTools"] for r in batch.collect()}
    assert want[2] == got[2]
    # emitted-before-late-arrival rows are never ABOVE batch
    assert got[0] <= want[0] and got[1] <= want[1]


def test_unique_count_streams_fused(spark, tmp_path):
    """Lifetime distinct + capped variant + event counter on one key:
    a single fused state pass, streaming == batch across a
    micro-batch split (seen set carried in the state store)."""
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
        (r["conv_id"], r["turn_idx"]): (r["NTools"], r["NCap"], r["N"])
        for r in eng.results().collect()
    }
    batch = rs().apply(
        with_envelope(spark.read.parquet(in_dir)),
        passthrough=["conv_id", "turn_idx"],
    )
    want = {
        (r["conv_id"], r["turn_idx"]): (r["NTools"], r["NCap"], r["N"])
        for r in batch.collect()
    }
    assert got == want and len(want) == 80
    assert any(v[0] > 2 for v in want.values())  # cap actually binds somewhere
    assert all(v[1] <= 2 for v in want.values())

"""Attribute enum constants (ref: ast/grammar.py:734-756) and event
fetch by id (ref: views/events.py:227-239)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osprey_spark.compiler import compile_ruleset
from osprey_spark.compiler.compile import register_enum
from osprey_spark.plans.analytics import fetch_event


def _df(spark, n=5):
    rows = [(i, "act", '{"x": %d}' % i, "2024-01-01 00:00:00") for i in range(n)]
    return spark.createDataFrame(
        rows, "action_id long, action_name string, data string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_enum_constant_resolves(spark):
    sml = """
Status: str = LabelStatus.ADDED
IsAdded = Status == 'added'
"""
    out = compile_ruleset({"main.sml": sml}).apply(_df(spark, 2)).collect()
    assert all(r["Status"] == "added" and r["IsAdded"] for r in out)


def test_registered_enum_and_unknown_attribute(spark):
    register_enum("Color", {"RED": "red", "BLUE": "blue"})
    sml = "C: str = Color.BLUE\n"
    out = compile_ruleset({"main.sml": sml}).apply(_df(spark, 1)).collect()
    assert out[0]["C"] == "blue"

    from osprey_spark.sml.errors import SmlValidationError

    with pytest.raises(SmlValidationError, match="unknown attribute"):
        compile_ruleset({"main.sml": "X = Color.GREEN\n"})


def test_fetch_event_pushes_filter(spark):
    rs = compile_ruleset({"main.sml": "X: int = JsonData(path='$.x', coerce_type='int')\n"})
    out = rs.apply(_df(spark, 50))
    got = fetch_event(out, 7).collect()
    assert len(got) == 1 and got[0]["X"] == 7
    assert fetch_event(out, 10_000).count() == 0

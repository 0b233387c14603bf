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


def test_export_topn_csv(spark, tmp_path):
    import csv as _csv
    import glob

    from osprey_spark.plans.analytics import export_topn_csv

    df = spark.createDataFrame(
        [("a", "2024-01-02 00:00:00")] * 3 + [("b", "2024-01-02 00:00:00")] * 2
        + [("a", "2024-01-01 12:00:00")],  # previous period
        "d string, ts string",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["col"]).col("ts").cast("timestamp"))

    p1 = str(tmp_path / "plain")
    export_topn_csv(df, "d", p1, limit=10)
    rows = list(_csv.DictReader(open(glob.glob(p1 + "/part-*.csv")[0])))
    assert {(r["d"], r["current_count"]) for r in rows} == {("a", "4"), ("b", "2")}

    p2 = str(tmp_path / "pop")
    export_topn_csv(
        df, "d", p2, limit=10,
        pop_args=dict(ts_col="ts", period_start="2024-01-02 00:00:00", period_end="2024-01-03 00:00:00"),
    )
    rows = {r["d"]: r for r in _csv.DictReader(open(glob.glob(p2 + "/part-*.csv")[0]))}
    assert rows["a"]["current_count"] == "3" and rows["a"]["previous_count"] == "1"
    assert rows["a"]["difference"] == "2" and rows["b"]["percent_diff"] == ""

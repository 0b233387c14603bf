"""Replay parity for the last two reference plugin UDFs closed in
round 4: ``SubstrCount`` (ref example_plugins/src/udfs/string.py:130)
and the ``AtprotoList`` effect with its ``atproto_list`` extracted
feature (ref example_plugins/src/udfs/atproto/list.py:59)."""

from __future__ import annotations

import json
from datetime import datetime

from osprey_spark.compiler import compile_ruleset

MAIN = """
Text: str = JsonData(path='$.text', required=False)
Did: str = JsonData(path='$.did', required=False)
ExCount: int = SubstrCount(s=Text, substr='!!')
SpamRule = Rule(
    when_all=[ExCount > 1],
    description='too many double-bangs',
)
WhenRules(
    rules_any=[SpamRule],
    then=[
        AtprotoList(
            did=Did,
            list_uri='at://did:plc:mod/app.bsky.graph.list/spamlist',
        ),
    ],
)
"""


def _run(spark, actions):
    rs = compile_ruleset({"main.sml": MAIN})
    rows = [
        (i + 1, "post", json.dumps(a), datetime(2024, 1, 1))
        for i, a in enumerate(actions)
    ]
    df = spark.createDataFrame(
        rows, "action_id long, action_name string, data string, ts timestamp"
    )
    out = rs.apply(df).orderBy("__action_id")
    return [r.asDict() for r in out.collect()]


def test_substr_count_python_parity(spark):
    """Engine counts == CPython str.count on every case incl. the
    empty-substr contract (len+1) and overlapping runs (the reference
    executes s.count(substr) verbatim)."""
    cases = ["", "!!", "!!!", "!!!!", "a!!b!!c", "no bangs", "!!x!!"]
    rows = _run(spark, [{"text": t, "did": "did:plc:u"} for t in cases])
    for t, r in zip(cases, rows):
        assert r["ExCount"] == t.count("!!"), (t, r["ExCount"])

    # empty-substr contract, via a dedicated program
    src = {
        "main.sml": (
            "Text: str = JsonData(path='$.text', required=False)\n"
            "N: int = SubstrCount(s=Text, substr='')\n"
        )
    }
    rs = compile_ruleset(src)
    df = spark.createDataFrame(
        [(1, "post", json.dumps({"text": "abc"}), datetime(2024, 1, 1))],
        "action_id long, action_name string, data string, ts timestamp",
    )
    assert rs.apply(df).collect()[0]["N"] == "abc".count("")


def test_atproto_list_effect_fires_and_serializes(spark):
    rows = _run(
        spark,
        [
            {"text": "spam!! spam!! spam!!", "did": "did:plc:spammer"},
            {"text": "benign post", "did": "did:plc:ok"},
            {"text": "one!! only", "did": "did:plc:mild"},
        ],
    )
    assert rows[0]["SpamRule"] is True
    assert rows[0]["atproto_list"] == [
        "did:plc:spammer|at://did:plc:mod/app.bsky.graph.list/spamlist"
    ]
    assert rows[1]["atproto_list"] == []
    assert rows[2]["atproto_list"] == []  # 1 occurrence, rule needs >1


def test_atproto_list_null_did_drops_entry(spark):
    """NULL did → Err→no-effect: entry drops from the array instead
    of serializing 'None|uri' (the raising-UDF analogue)."""
    rows = _run(spark, [{"text": "x!! y!! z!!"}])  # no did key
    assert rows[0]["SpamRule"] is True
    assert rows[0]["atproto_list"] == []


def test_rulesets_without_list_effects_have_no_column(spark):
    src = {"main.sml": "Text: str = JsonData(path='$.text', required=False)\n"}
    rs = compile_ruleset(src)
    df = spark.createDataFrame(
        [(1, "post", json.dumps({"text": "hi"}), datetime(2024, 1, 1))],
        "action_id long, action_name string, data string, ts timestamp",
    )
    assert "atproto_list" not in rs.apply(df).columns

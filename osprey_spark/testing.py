"""Test harness: run an inline SML program against dict actions.

Mirrors the reference's ``execute`` fixture (ref: engine/conftest.py
:283-376): parse+compile the program, evaluate against action dicts,
return the extracted-features dicts with reserved columns stripped.
The difference: we evaluate through the Spark compiler on an N-row
DataFrame — the same code path production uses.
"""

from __future__ import annotations

import json
import math
from datetime import datetime
from typing import Any, Optional

from pyspark.sql import SparkSession

from .compiler.compile import (
    ACTION_ID,
    ERROR_COUNT,
    LABEL_EFFECTS,
    LABEL_MUTATIONS,
    TIMESTAMP,
    VERDICTS,
    InputBindings,
    compile_sml,
)

RESERVED = (ACTION_ID, TIMESTAMP, ERROR_COUNT, VERDICTS, LABEL_MUTATIONS, LABEL_EFFECTS)

DEFAULT_TS = datetime(2024, 1, 1, 0, 0, 0)


def execute_sml(
    spark: SparkSession,
    sml: str,
    actions: Optional[list[dict]] = None,
    action_name: str = "test_action",
    keep_reserved: bool = False,
) -> list[dict[str, Any]]:
    """Compile ``sml`` and evaluate it over ``actions`` (default one
    empty action). Each action dict may carry the envelope keys
    ``action_name`` / ``timestamp`` / ``action_id``; everything else
    is the JSON data payload.
    """
    actions = actions if actions is not None else [{}]
    rows = []
    for i, action in enumerate(actions):
        action = dict(action)
        name = action.pop("action_name", action_name)
        ts = action.pop("timestamp", DEFAULT_TS)
        action_id = action.pop("action_id", i + 1)
        rows.append((action_id, name, json.dumps(action), ts))
    df = spark.createDataFrame(rows, "action_id long, action_name string, data string, ts timestamp")
    ruleset = compile_sml(sml, bindings=InputBindings())
    out = ruleset.apply(df).orderBy(ACTION_ID)
    results = []
    for row in out.collect():
        d = row.asDict(recursive=True)
        if not keep_reserved:
            for k in RESERVED:
                d.pop(k, None)
        else:
            d.pop(LABEL_EFFECTS, None)
            d.pop(ERROR_COUNT, None)
            d.pop(ACTION_ID, None)
            d.pop(TIMESTAMP, None)
        results.append(_normalize(d))
    return results


def execute_one(spark: SparkSession, sml: str, action: Optional[dict] = None, **kw) -> dict[str, Any]:
    return execute_sml(spark, sml, [action or {}], **kw)[0]


def _normalize(d: dict) -> dict:
    out = {}
    for k, v in d.items():
        if isinstance(v, float) and not math.isnan(v) and v == int(v) and abs(v) < 2**52:
            out[k] = v
        else:
            out[k] = v
    return out

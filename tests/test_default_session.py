"""Driver-environment compatibility: the full ``queries()`` registry
must run under Spark's DEFAULT session semantics — caseSensitive=false
and 200 shuffle partitions — not only under the engine's own tuned
session (round 2's single CORRECTNESS failure was an
AMBIGUOUS_REFERENCE that only reproduced on a default session).

``spark.sql.caseSensitive`` and ``spark.sql.shuffle.partitions`` are
runtime SQL confs, so we flip them on the shared session for this
module and restore them afterwards.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def default_session(spark):
    prev_case = spark.conf.get("spark.sql.caseSensitive")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.caseSensitive", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    yield spark
    spark.conf.set("spark.sql.caseSensitive", prev_case)
    spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_runs_on_default_session(default_session, name):
    fn = entrymod.queries()[name]
    df = fn(default_session, SF_DIR)
    # .limit() still analyzes the full plan (where AMBIGUOUS_REFERENCE
    # surfaces) and executes upstream aggregates; collect proves the
    # physical plan also runs under 200-partition shuffles.
    df.limit(20).collect()


def test_apply_rejects_case_colliding_passthrough(spark):
    from osprey_spark.compiler import compile_ruleset
    from osprey_spark.turns import TURN_BINDINGS, turns_from_events, with_envelope

    env = with_envelope(turns_from_events(spark, SF_DIR))
    rs = compile_ruleset(
        {"main.sml": "Role: str = JsonData(path='$.role')\n"},
        bindings=TURN_BINDINGS,
    )
    with pytest.raises(ValueError, match="case-insensitively colliding"):
        rs.apply(env, passthrough=["conv_id", "role"])
    # non-colliding passthrough still works
    out = rs.apply(env, passthrough=["conv_id"])
    assert "Role" in out.columns and "role" not in out.columns

"""Per-action-name sampling (ref: worker/sinks/sink/rules_sink.py:47-70).

Rate semantics follow the reference's ActionSampler: rate is the drop
probability in percent, 100 = sampling disabled (keep all), 0 = drop
all; the deterministic md5-bucket roll replaces the reference's
``randint`` so runs replay identically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from osprey_spark.compiler import compile_ruleset

SML = "X = JsonData(path='$.x', coerce_type='str')\n"


def _env(spark, names):
    rows = [(i, n, '{"x": "v"}', "2024-01-01 00:00:00") for i, n in enumerate(names)]
    df = spark.createDataFrame(
        rows, "action_id long, action_name string, data string, ts string"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_sampling_edges_keep_all_and_drop_all(spark):
    rs = compile_ruleset({"main.sml": SML})
    df = _env(spark, ["a"] * 40 + ["b"] * 40 + ["c"] * 40)
    out = rs.apply(df, sample_config={"a": 100, "b": 0}).select("__action_id", "__sample_rate")
    rows = out.collect()
    ids = {r["__action_id"] for r in rows}
    assert all(i < 40 or i >= 80 for i in ids)  # every 'b' dropped
    assert sum(1 for i in ids if i < 40) == 40  # every 'a' kept
    # rate 100 and unconfigured 'c' serialize NULL (ref custom_extracted_features.py:84-96)
    assert all(r["__sample_rate"] is None for r in rows)


def test_sampling_partial_rate_is_deterministic(spark):
    rs = compile_ruleset({"main.sml": SML})
    df = _env(spark, ["a"] * 200)
    out1 = rs.apply(df, sample_config={"a": 50}).select("__action_id", "__sample_rate")
    kept1 = sorted(r["__action_id"] for r in out1.collect())
    kept2 = sorted(r["__action_id"] for r in rs.apply(df, sample_config={"a": 50}).collect())
    assert kept1 == kept2  # replayable
    assert 0 < len(kept1) < 200  # actually partial
    assert all(r["__sample_rate"] == 50 for r in out1.collect())


def test_sampling_null_key_fail_open(spark):
    """NULL sample keys (md5(NULL) -> NULL bucket) must follow the
    documented policy instead of vanishing into a NULL predicate
    (round-2 ADVICE): partial rates KEEP unattributable rows
    (fail-open); rate=0 still drops everything."""
    rs = compile_ruleset({"main.sml": SML})
    df = _env(spark, ["a"] * 10 + ["b"] * 10)
    null_key = F.when(F.col("action_id") < 0, F.col("action_name"))  # always NULL
    # guard: the rows ARE null-keyed
    assert df.select(null_key.alias("k")).filter(F.col("k").isNotNull()).count() == 0
    out = rs.apply(df, sample_config={"a": 50, "b": 0}, sample_key=null_key)
    rows = out.select("__action_id", "__sample_rate").collect()
    ids = {r["__action_id"] for r in rows}
    assert ids == set(range(10))  # all 'a' kept despite NULL key, all 'b' dropped
    assert all(r["__sample_rate"] == 50 for r in rows)


def test_sampling_rejects_bad_rate(spark):
    import pytest

    rs = compile_ruleset({"main.sml": SML})
    df = _env(spark, ["a"])
    with pytest.raises(ValueError):
        rs.apply(df, sample_config={"a": 101})


def test_error_count_counts_required_misses(spark):
    """__error_count mirrors the reference's failed-node counter for
    the JVM-computable class: required JsonData paths that are absent
    (ref: custom_extracted_features.py:72-81)."""
    sml = """
A: str = JsonData(path='$.a')
B: str = JsonData(path='$.b', required=False)
C: str = JsonData(path='$.c')
"""
    rs = compile_ruleset({"main.sml": sml})
    df = _env_rows(spark, ['{"a": "x", "c": "y"}', '{"a": "x"}', "{}"])
    out = sorted(
        (r["__action_id"], r["__error_count"]) for r in rs.apply(df).collect()
    )
    # row0: all required present; row1: c missing; row2: a and c missing
    assert out == [(0, 0), (1, 1), (2, 2)]


def _env_rows(spark, datas):
    rows = [(i, "act", d, "2024-01-01 00:00:00") for i, d in enumerate(datas)]
    return spark.createDataFrame(
        rows, "action_id long, action_name string, data string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

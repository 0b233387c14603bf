"""Co-located (bucketed) joins: the shuffle-free join layout.

Proves the scale claim, not just the API: two tables bucketed on the
same key with the same bucket count sort-merge-join with ZERO
Exchange operators in the physical plan, and the result is identical
to the plain join of the unbucketed frames.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osprey_spark.operators.joins import write_bucketed


TABLES = ("bj_turns", "bj_verdicts", "bj_agg", "bj_a8", "bj_b4")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # a previous session's managed-table files survive in the warehouse
    # dir while the in-memory catalog does not — clear both sides or
    # saveAsTable fails with LOCATION_ALREADY_EXISTS
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_exchange_free(spark, no_broadcast):
    turns = spark.range(0, 2000).select(
        F.concat(F.lit("conv_"), (F.col("id") % 97).cast("string")).alias("conv_id"),
        F.col("id").alias("turn_id"),
        (F.col("id") * 7 % 100).alias("score"),
    )
    verdicts = spark.range(0, 500).select(
        F.concat(F.lit("conv_"), (F.col("id") % 97).cast("string")).alias("conv_id"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("verdict"),
    )
    write_bucketed(turns, "bj_turns", "conv_id", 8)
    write_bucketed(verdicts, "bj_verdicts", "conv_id", 8)

    joined = spark.table("bj_turns").join(spark.table("bj_verdicts"), "conv_id")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"

    # same rows as the plain join of the source frames
    got = sorted(
        (r.conv_id, r.turn_id, r.verdict)
        for r in joined.select("conv_id", "turn_id", "verdict").collect()
    )
    want = sorted(
        (r.conv_id, r.turn_id, r.verdict)
        for r in turns.join(verdicts, "conv_id").select(
            "conv_id", "turn_id", "verdict"
        ).collect()
    )
    assert got == want and len(got) > 0


def test_bucketed_aggregate_skips_exchange(spark, no_broadcast):
    """groupBy on the bucket key reuses the bucketing too — the
    output-partitioning contract covers aggregates, not just joins."""
    df = spark.range(0, 1000).select(
        F.concat(F.lit("c"), (F.col("id") % 31).cast("string")).alias("conv_id"),
        F.col("id").alias("v"),
    )
    write_bucketed(df, "bj_agg", "conv_id", 8)
    agg = spark.table("bj_agg").groupBy("conv_id").agg(F.sum("v").alias("s"))
    assert "Exchange" not in _plan(agg)
    assert agg.count() == 31


def test_mismatched_bucket_counts_fall_back(spark, no_broadcast):
    """Different bucket counts can't co-locate: Spark shuffles (at
    least) one side — the layout contract the docstring warns about."""
    a = spark.range(0, 200).select(
        (F.col("id") % 13).cast("string").alias("k"), F.col("id").alias("x")
    )
    b = spark.range(0, 200).select(
        (F.col("id") % 13).cast("string").alias("k"), F.col("id").alias("y")
    )
    write_bucketed(a, "bj_a8", "k", 8)
    write_bucketed(b, "bj_b4", "k", 4)
    plan = _plan(spark.table("bj_a8").join(spark.table("bj_b4"), "k"))
    assert "Exchange" in plan

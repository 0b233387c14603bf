"""Changelog compaction: batch latest_snapshot semantics and the
streaming twin's any-arrival-order equivalence + checkpoint restart."""

from __future__ import annotations

import pyspark.sql.functions as F

from osprey_spark.operators.cdc import (
    changelog_from_turns,
    latest_snapshot,
    stream_latest_snapshot,
)


def _changelog(spark):
    # revisions deliberately OUT OF ORDER in the input: version 2
    # rows appear before version 0 rows for some keys
    rows = [
        ("c0", 0, 2, "v2 final"),
        ("c0", 0, 0, "v0 first"),
        ("c0", 0, 1, "v1 edit"),
        ("c0", 1, 0, "only insert"),
        ("c1", 0, 1, "later edit"),
        ("c1", 0, 0, "first write"),
        ("c2", 5, 0, "tie a"),
        ("c2", 5, 0, "tie b"),  # same version: payload breaks the tie
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, version int, text string"
    )


def test_latest_snapshot_batch(spark):
    snap = latest_snapshot(
        _changelog(spark), ("conv_id", "turn_idx"), "version", ("text",)
    )
    got = {(r.conv_id, r.turn_idx): (r.version, r.text) for r in snap.collect()}
    assert got == {
        ("c0", 0): (2, "v2 final"),
        ("c0", 1): (0, "only insert"),
        ("c1", 0): (1, "later edit"),
        ("c2", 5): (0, "tie b"),  # max payload on exact version tie
    }


def test_latest_snapshot_partition_invariant(spark):
    log = _changelog(spark)
    a = latest_snapshot(log.repartition(1), ("conv_id", "turn_idx"), "version", ("text",))
    b = latest_snapshot(log.repartition(7), ("conv_id", "turn_idx"), "version", ("text",))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_latest_snapshot_plan_is_partial_aggregate(spark):
    """Scale invariant: compaction is a max-merge aggregate with
    MAP-SIDE partials, never a row_number window (which would sort
    whole revision partitions)."""
    snap = latest_snapshot(
        _changelog(spark), ("conv_id", "turn_idx"), "version", ("text",)
    )
    plan = snap._jdf.queryExecution().executedPlan().toString()
    assert "partial_max(struct(" in plan
    assert "row_number" not in plan
    assert "Window" not in plan


def _latest_emitted(spark, view):
    """Compact the emitted changelog: the max-upd_seq row per key is
    itself a latest_snapshot on upd_seq (tiebreak cols inert here —
    one row per key per seq)."""
    return latest_snapshot(
        spark.sql(f"select * from {view}"),
        ("conv_id", "turn_idx"),
        "upd_seq",
        ("version", "text"),
    ).select("conv_id", "turn_idx", "version", "text")


def test_stream_latest_snapshot_matches_batch(spark, tmp_path):
    from osprey_spark.turns import turns_from_events

    t = turns_from_events(spark, "/root/testdata/sf0.001").limit(400)
    log = changelog_from_turns(t).select("conv_id", "turn_idx", "version", "text")
    # adversarial arrival order: REVERSE version order across files, so
    # the insert arrives in a later micro-batch than the redaction
    src = str(tmp_path / "cdc_log")
    for v in (2, 1, 0):
        log.filter(F.col("version") == v).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, version int, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_latest_snapshot(stream, n_buckets=16)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cdc_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, _latest_emitted(spark, "cdc_stream").collect()))
    expect = sorted(
        map(
            tuple,
            latest_snapshot(log, ("conv_id", "turn_idx"), "version", ("text",)).collect(),
        )
    )
    assert got == expect
    assert len(got) == t.count()


def test_stream_latest_snapshot_restart(spark, tmp_path):
    """Resume from checkpoint: best-revision state persists — a lower
    version arriving after restart does NOT displace the carried best,
    and a higher one does."""
    src = str(tmp_path / "cdc_src")
    out = str(tmp_path / "cdc_out")
    ckpt = str(tmp_path / "cdc_ckpt")
    schema = "conv_id string, turn_idx int, version int, text string"

    def _run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream_latest_snapshot(stream, n_buckets=4)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(
        [("k", 0, 5, "high"), ("k", 1, 0, "base")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    _run()

    # post-restart: stale revision for (k,0), fresh one for (k,1)
    spark.createDataFrame(
        [("k", 0, 3, "stale"), ("k", 1, 2, "newer")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    _run()  # fresh query object, same checkpoint + state store

    emitted = latest_snapshot(
        spark.read.parquet(out),
        ("conv_id", "turn_idx"),
        "upd_seq",
        ("version", "text"),
    )
    got = {
        (r.conv_id, r.turn_idx): (r.version, r.text)
        for r in emitted.collect()
    }
    assert got == {("k", 0): (5, "high"), ("k", 1): (2, "newer")}

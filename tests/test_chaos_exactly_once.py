"""Chaos crash-injection matrix for the exactly-once sink (round-5,
verdict item 6).

The existing restart tests kill BETWEEN micro-batches; this matrix
kills INSIDE ``foreachBatch`` at the two points the TableFormat
contract (streaming/sink.py:55-81) calls out, for BOTH format
implementations:

- ``pre_commit``  — after the data write, before ``commit(batch_id)``:
  invariant 2 says the batch must be invisible to ``scan()`` even
  though its data files exist on disk, and the replayed batch must
  REPLACE the orphaned partition (invariant 1), including any torn
  partial files left behind.
- ``post_commit`` — after ``commit``, before the checkpoint ack: the
  restart re-runs an already-committed batch id; idempotent overwrite
  + marker replace must converge to exactly-once output.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from osprey_spark.streaming.sink import (
    ExactlyOnceParquetSink,
    ParquetDirFormat,
    SqliteManifestFormat,
)

SCHEMA = "conv_id string, n long"


def _write_input_file(spark, in_dir, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        in_dir
    )


def _run_stream(spark, in_dir, ckpt, fb):
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(fb)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


FORMATS = {
    "parquet_dir": ParquetDirFormat,
    "sqlite_manifest": SqliteManifestFormat,
}


@pytest.mark.parametrize("fmt_name", sorted(FORMATS))
@pytest.mark.parametrize("crash_point", ["pre_commit", "post_commit"])
def test_mid_batch_crash_converges_to_exactly_once(
    spark, tmp_path, fmt_name, crash_point
):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "table")
    flag = str(tmp_path / "crashed_once")

    batches_rows = [
        [("a", 1), ("b", 2)],
        [("c", 3), ("d", 4)],
        [("e", 5)],
    ]
    for rows in batches_rows:
        _write_input_file(spark, in_dir, rows)

    fmt = FORMATS[fmt_name](root)
    sink = ExactlyOnceParquetSink(root, bucket_col=None, table_format=fmt)

    def fb(df, bid):
        if int(bid) == 1 and not os.path.exists(flag):
            if crash_point == "pre_commit":
                sink.write_data(df, bid)  # data files land, commit never runs
                open(flag, "w").close()
                raise RuntimeError("injected crash before commit")
            stats = sink.write_data(df, bid)
            sink.mark_commit(bid, stats)  # commit lands, checkpoint ack never
            open(flag, "w").close()
            raise RuntimeError("injected crash after commit")
        sink.write_batch(df, bid)

    with pytest.raises(Exception, match="injected crash"):
        _run_stream(spark, in_dir, ckpt, fb)
    assert os.path.exists(flag)

    # --- invariant checks at the crash point -----------------------------
    batch1_dir = os.path.join(root, "data", "_batch_id=1")
    if crash_point == "pre_commit":
        # data files exist but the batch is invisible (invariant 2) —
        # the check is non-vacuous: the orphaned partition is on disk
        assert os.path.isdir(batch1_dir)
        assert sink.committed_batches() == [0]
        visible = {tuple(r) for r in sink.read_committed(spark).select("conv_id", "n").collect()}
        assert visible == {("a", 1), ("b", 2)}
        # simulate a torn file from the dead writer: replay must purge it
        with open(os.path.join(batch1_dir, "part-torn.parquet"), "w") as f:
            f.write("not parquet")
    else:
        # commit landed before the crash; the ack didn't
        assert sink.committed_batches() == [0, 1]

    # --- restart from the same checkpoint: batch 1 replays ---------------
    _run_stream(spark, in_dir, ckpt, fb)

    assert sink.committed_batches() == [0, 1, 2]
    final = [tuple(r) for r in sink.read_committed(spark).select("conv_id", "n").collect()]
    expected = {t for rows in batches_rows for t in rows}
    assert len(final) == 5, f"duplicates or losses after replay: {sorted(final)}"
    assert set(final) == expected
    if crash_point == "pre_commit":
        # the torn file was replaced along with the rest of the partition
        assert not os.path.exists(os.path.join(batch1_dir, "part-torn.parquet"))


@pytest.mark.parametrize("fmt_name", sorted(FORMATS))
def test_double_crash_same_batch_still_converges(spark, tmp_path, fmt_name):
    """Crash on the SAME batch twice (pre-commit, then post-commit on
    the first replay) — the pathological retry storm; output must
    still be exactly-once."""
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "table")
    crash_count = str(tmp_path / "crash_count")

    _write_input_file(spark, in_dir, [("a", 1)])
    _write_input_file(spark, in_dir, [("b", 2), ("c", 3)])

    fmt = FORMATS[fmt_name](root)
    sink = ExactlyOnceParquetSink(root, bucket_col=None, table_format=fmt)

    def crashes_so_far():
        return int(open(crash_count).read()) if os.path.exists(crash_count) else 0

    def fb(df, bid):
        n = crashes_so_far()
        if int(bid) == 1 and n == 0:
            sink.write_data(df, bid)
            open(crash_count, "w").write("1")
            raise RuntimeError("injected crash 1 (pre-commit)")
        if int(bid) == 1 and n == 1:
            sink.write_batch(df, bid)
            open(crash_count, "w").write("2")
            raise RuntimeError("injected crash 2 (post-commit)")
        sink.write_batch(df, bid)

    for _ in range(2):
        with pytest.raises(Exception, match="injected crash"):
            _run_stream(spark, in_dir, ckpt, fb)
    _run_stream(spark, in_dir, ckpt, fb)

    assert crashes_so_far() == 2
    final = [tuple(r) for r in sink.read_committed(spark).select("conv_id", "n").collect()]
    assert sorted(final) == [("a", 1), ("b", 2), ("c", 3)]

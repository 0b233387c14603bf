"""Compaction (Iceberg rewrite_data_files analogue) on the
exactly-once sink: content-preserving rewrites, crash-safe markers,
time travel through and below the rewrite, and vacuum's snapshot
floor."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from osprey_spark.streaming.sink import ExactlyOnceParquetSink


def _write_batches(spark, sink, n, rows_per=20):
    for b in range(n):
        df = spark.range(rows_per).select(
            F.concat(F.lit("conv_"), (F.col("id") % 5).cast("string")).alias(
                "conv_id"
            ),
            F.col("id").cast("int").alias("turn_idx"),
            F.lit(f"batch{b}").alias("payload"),
        )
        sink.write_batch(df, b)


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _n_data_files(root):
    n = 0
    for droot, _d, files in os.walk(os.path.join(root, "data")):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def test_compact_preserves_content_and_reduces_files(spark, tmp_path):
    root = str(tmp_path / "t")
    sink = ExactlyOnceParquetSink(root, n_buckets=4)
    _write_batches(spark, sink, 6)
    before = _sorted_rows(sink.read_committed(spark))
    files_before = _n_data_files(root)

    marker = sink.compact(spark)  # default upto = second-newest = 4
    assert marker["replaces"] == [0, 1, 2, 3, 4]
    assert marker["files"] <= 4  # one file per bucket
    assert marker["files"] < files_before

    after = _sorted_rows(sink.read_current(spark))
    assert after == before  # identical rows incl. _batch_id lineage
    # originals retained: plain committed read unchanged too
    assert _sorted_rows(sink.read_committed(spark)) == before


def test_compact_crash_before_marker_is_invisible(spark, tmp_path):
    import shutil

    root = str(tmp_path / "t")
    sink = ExactlyOnceParquetSink(root, n_buckets=4)
    _write_batches(spark, sink, 3)
    before = _sorted_rows(sink.read_current(spark))
    marker = sink.compact(spark, upto_batch_id=1)
    # simulate the crash: data written, marker lost
    os.remove(os.path.join(root, "_rewrites", f"{marker['rewrite_id']}.json"))
    assert _sorted_rows(sink.read_current(spark)) == before
    shutil.rmtree(os.path.join(root, "_rewrites", str(marker["rewrite_id"])))
    assert _sorted_rows(sink.read_current(spark)) == before


def test_time_travel_through_and_below_rewrite(spark, tmp_path):
    root = str(tmp_path / "t")
    sink = ExactlyOnceParquetSink(root, n_buckets=4)
    _write_batches(spark, sink, 6)
    snap2 = _sorted_rows(sink.read_snapshot(spark, 2))
    snap4 = _sorted_rows(sink.read_snapshot(spark, 4))
    sink.compact(spark, upto_batch_id=4)
    # below the rewrite: originals still serve it, unchanged
    assert _sorted_rows(sink.read_snapshot_compacted(spark, 2)) == snap2
    # exactly at the rewrite boundary: served FROM the rewrite
    assert _sorted_rows(sink.read_snapshot_compacted(spark, 4)) == snap4
    # above: rewrite + original tail
    assert _sorted_rows(sink.read_snapshot_compacted(spark, 5)) == _sorted_rows(
        sink.read_committed(spark)
    )


def test_vacuum_floor_semantics(spark, tmp_path):
    root = str(tmp_path / "t")
    sink = ExactlyOnceParquetSink(root, n_buckets=4)
    _write_batches(spark, sink, 6)
    snap4 = _sorted_rows(sink.read_snapshot(spark, 4))
    everything = _sorted_rows(sink.read_committed(spark))
    sink.compact(spark, upto_batch_id=4)
    out = sink.vacuum()
    assert out["removed_batches"] == [0, 1, 2, 3, 4]
    assert out["min_snapshot"] == 4
    # originals gone from disk
    assert not os.path.isdir(os.path.join(root, "data", "_batch_id=0"))
    # current read and boundary snapshot still exact
    assert _sorted_rows(sink.read_current(spark)) == everything
    assert _sorted_rows(sink.read_snapshot_compacted(spark, 4)) == snap4
    # below the floor: expired
    with pytest.raises(FileNotFoundError, match="snapshot expired"):
        sink.read_snapshot_compacted(spark, 2).collect()


def test_second_rewrite_supersedes_first(spark, tmp_path):
    root = str(tmp_path / "t")
    sink = ExactlyOnceParquetSink(root, n_buckets=4)
    _write_batches(spark, sink, 4)
    sink.compact(spark, upto_batch_id=1)
    _write_batches(spark, sink, 6)  # batches 0..5 now (rewrites 0..3)
    everything = _sorted_rows(sink.read_committed(spark))
    m2 = sink.compact(spark, upto_batch_id=4)
    assert m2["rewrite_id"] == 1
    assert _sorted_rows(sink.read_current(spark)) == everything

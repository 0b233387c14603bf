"""Z-order layout: Morton key correctness + locality it buys."""

from __future__ import annotations

from pyspark.sql import functions as F

from osprey_spark.operators.layout import (
    py_zorder_key,
    zorder_key,
    zorder_layout,
    zorder_stats,
)


def test_zorder_key_known_answers(spark):
    """Hand-computed interleaves; JVM expression == Python replay."""
    assert py_zorder_key([5, 3], bits=3) == 27  # 101 x 011 -> 011011
    assert py_zorder_key([0, 0]) == 0
    assert py_zorder_key([1, 0]) == 1
    assert py_zorder_key([0, 1]) == 2
    rows = [(x, y) for x in (0, 1, 5, 100, 65535) for y in (0, 3, 7, 4096)]
    df = spark.createDataFrame(rows, "x long, y long").select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=16).alias("k")
    )
    for r in df.collect():
        assert r.k == py_zorder_key([r.x, r.y], bits=16), (r.x, r.y)


def test_zorder_key_locality_order(spark):
    """Morton order on a grid: adjacent keys are adjacent cells —
    sorting by the key never interleaves far-apart rows within a
    quadrant (prefix property: the top 2 bits split the plane into
    4 quadrants that sort contiguously)."""
    n = 16
    rows = [(x, y) for x in range(n) for y in range(n)]
    ks = sorted((py_zorder_key([x, y], bits=4), x, y) for x, y in rows)
    # the first quarter of the sorted order is exactly the low-low
    # quadrant (x < 8, y < 8)
    first = ks[: len(ks) // 4]
    assert all(x < 8 and y < 8 for _, x, y in first)


def test_zorder_layout_partition_bboxes(spark, tmp_path):
    """Range-partitioning on the scaled Morton key yields partitions
    whose per-partition bounding rectangles are dramatically smaller
    than input-order partitions — the property file-level min/max
    pruning converts into skipped files."""
    n = 64
    rows = [(x, y, 1) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long, pad int")

    def bbox_area_sum(frame):
        per = (
            frame.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                (F.max("x") - F.min("x") + 1).alias("dx"),
                (F.max("y") - F.min("y") + 1).alias("dy"),
            )
            .select(F.sum(F.col("dx") * F.col("dy")).alias("a"))
            .collect()[0]
        )
        return per.a

    parts = 16
    z = zorder_layout(df, ["x", "y"], num_partitions=parts)
    z_area = bbox_area_sum(z)
    # baseline: round-robin layout — every partition sees (nearly) the
    # whole plane, so the bbox sum is ~parts * n*n; a perfect z-layout
    # tiles the plane once (sum ~= n*n)
    base = df.repartition(parts)
    base_area = bbox_area_sum(base)
    assert z_area <= base_area / 4, (z_area, base_area)
    assert z_area <= 2 * n * n, z_area


def test_zorder_stats_buckets_are_tight(spark):
    """Every audit bucket's raw span per dim is <= global_span / 8
    (+1 scaling unit): the top-3-bit prefix pins each scaled dim to a
    2^13-wide slice of its 2^16 range."""
    rows = [((i * 193) % 1000, (i * 71) % 5000) for i in range(4000)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = zorder_stats(df, ["a", "b"]).collect()
    assert len(out) > 8
    ga = max(r.hi_a for r in out) - min(r.lo_a for r in out)
    gb = max(r.hi_b for r in out) - min(r.lo_b for r in out)
    assert sum(r.n_rows for r in out) == len(rows)
    for r in out:
        assert r.hi_a - r.lo_a <= ga // 8 + ga // 65535 + 1, r
        assert r.hi_b - r.lo_b <= gb // 8 + gb // 65535 + 1, r

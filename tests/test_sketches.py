"""Count-min sketch: over-estimate-only bound, exactness when wide,
full-collision degenerate case, sketch-size bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from osprey_spark.operators.sketches import count_min_build, count_min_estimate


def _counts(spark):
    rows = [("a",)] * 100 + [("b",)] * 10 + [("c",)] * 1
    return spark.createDataFrame(rows, "k string")


def test_cms_upper_bound_and_exact_when_wide(spark):
    df = _counts(spark)
    keys = df.select("k").distinct()
    sk = count_min_build(df, "k", width=4096, depth=4)
    est = {r.k: r.cms_n for r in count_min_estimate(sk, keys, "k", width=4096, depth=4).collect()}
    exact = {"a": 100, "b": 10, "c": 1}
    for k, n in exact.items():
        assert est[k] >= n  # CMS never under-estimates
    # 3 keys in 4096 buckets x 4 rows: collisions essentially impossible
    assert est == exact


def test_cms_full_collision(spark):
    df = _counts(spark)
    keys = df.select("k").distinct()
    sk = count_min_build(df, "k", width=1, depth=2)
    est = {r.k: r.cms_n for r in count_min_estimate(sk, keys, "k", width=1, depth=2).collect()}
    assert est == {"a": 111, "b": 111, "c": 111}


def test_cms_sketch_is_sketch_sized(spark):
    df = spark.range(0, 10000).select(F.col("id").cast("string").alias("k"))
    sk = count_min_build(df, "k", width=64, depth=3)
    assert sk.count() <= 64 * 3
    total = sk.groupBy("d").agg(F.sum("n").alias("s")).collect()
    assert all(r.s == 10000 for r in total)  # each row counts every key


def test_cms_unseen_key_zero_when_no_collision(spark):
    df = _counts(spark)
    keys = spark.createDataFrame([("zzz-unseen",)], "k string")
    est = count_min_estimate(
        count_min_build(df, "k", width=4096, depth=4), keys, "k", width=4096, depth=4
    ).collect()
    assert est[0].cms_n == 0


def test_hll_distinct_accuracy_and_small_range(spark):
    """The from-scratch HLL lands within the expected ~1.04/sqrt(256)
    error band on thousands of keys, and the linear-counting branch
    handles tiny cardinalities exactly enough to round to them."""
    from osprey_spark.operators.sketches import hll_distinct

    rows = [("big", i) for i in range(5000)] + [("small", i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, k long")
    out = {r.g: r for r in hll_distinct(df, "k", ["g"]).collect()}
    assert out["big"].n_exact == 5000
    assert abs(out["big"].hll_estimate - 5000) / 5000 < 0.15  # ~2 sigma
    assert out["small"].n_exact == 10
    # linear counting: m * ln(m / empty) is near-exact at 10/256 load
    assert abs(out["small"].hll_estimate - 10) < 1.5

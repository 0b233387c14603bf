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


# --------------------------------------------------------------------------
# log-binned histogram quantile sketch
# --------------------------------------------------------------------------


def test_hist_bin_known_answers(spark):
    """Exact bin ids / lower edges for hand-computed values, Python
    replay == JVM expression."""
    from osprey_spark.operators.sketches import (
        hist_bin,
        hist_bin_lower,
        py_hist_bin,
    )

    vals = [None, 0, -5, 1, 2, 3, 4, 5, 7, 8, 15, 16, 1000, 10**12]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v",
        hist_bin(F.col("v")).alias("b"),
        hist_bin_lower(hist_bin(F.col("v"))).alias("lo"),
    )
    for r in df.collect():
        assert r.b == py_hist_bin(r.v), (r.v, r.b)
        if r.v is None or r.v <= 0:
            assert r.b == -1 and r.lo == 0
        else:
            # lower edge <= v, and v < next bin's lower edge width away:
            # sub-bin width is 2^(e-1)/4 -> relative error <= 25%
            assert r.lo <= r.v, (r.v, r.lo)
            assert r.v - r.lo <= max(1, r.lo // 4), (r.v, r.lo)
    # values 1..3 are exact (sub-bin width < 1)
    exact = {r.v: r.lo for r in df.collect() if r.v in (1, 2, 3)}
    assert exact == {1: 1, 2: 2, 3: 3}


def test_hist_quantiles_vs_exact(spark):
    """Estimates never exceed the true quantile and stay within the
    25% sub-bin relative-error bound below it."""
    from osprey_spark.operators.sketches import hist_quantiles

    rows = [("g", (i * i) % 997 + 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {
        r.q_pct: (r.est, r.n_rows)
        for r in hist_quantiles(df, "v", ["grp"], (50, 90, 99)).collect()
    }
    import math

    vs = sorted(v for _, v in rows)
    for q in (50, 90, 99):
        exact = vs[math.ceil(q * len(vs) / 100) - 1]
        est, n = got[q]
        assert n == len(vs)
        assert est <= exact
        assert exact - est <= max(1, exact // 4 + 1), (q, exact, est)


# --------------------------------------------------------------------------
# KMV / theta sketch
# --------------------------------------------------------------------------


def test_kmv_exact_below_saturation(spark):
    """Fewer distinct keys than k: every estimate and the Jaccard
    degrade to exact values."""
    from osprey_spark.operators.sketches import kmv_set_ops

    rows = [("a", f"k{i}") for i in range(30)] + [
        ("b", f"k{i}") for i in range(20, 50)
    ]
    df = spark.createDataFrame(rows, "t string, key string")
    r = kmv_set_ops(df, "key", "t", "a", "b", k=256).collect()[0]
    assert (r.est_a, r.est_b, r.est_union) == (30.0, 30.0, 50.0)
    assert r.est_intersect == 10.0
    assert (r.exact_a, r.exact_b, r.exact_union, r.exact_intersect) == (
        30,
        30,
        50,
        10,
    )


def test_kmv_estimates_within_bound(spark):
    """Saturated regime: estimates within ~4/sqrt(k) of exact for
    distinct counts, union and intersection."""
    from osprey_spark.operators.sketches import kmv_set_ops

    rows = [("a", f"k{i}") for i in range(3000)] + [
        ("b", f"k{i}") for i in range(2000, 6000)
    ]
    df = spark.createDataFrame(rows, "t string, key string")
    k = 256
    r = kmv_set_ops(df, "key", "t", "a", "b", k=k).collect()[0]
    tol = 4.0 / (k ** 0.5)
    assert abs(r.est_a - r.exact_a) <= tol * r.exact_a
    assert abs(r.est_b - r.exact_b) <= tol * r.exact_b
    assert abs(r.est_union - r.exact_union) <= tol * r.exact_union
    # intersection compounds two estimators; allow 2x the tolerance
    assert abs(r.est_intersect - r.exact_intersect) <= 2 * tol * r.exact_union


def test_kmv_min_k_merge_property(spark):
    """The k smallest of (sketch_a ∪ sketch_b) equal the k smallest of
    the raw union — the min-k merge that makes the sketch mergeable."""
    from osprey_spark.operators.sketches import _kmv_hash, kmv_sketch

    rows = [("a", f"k{i}") for i in range(500)] + [
        ("b", f"k{i}") for i in range(300, 900)
    ]
    df = spark.createDataFrame(rows, "t string, key string")
    k = 64
    sk = {
        r.t: r.kmv for r in kmv_sketch(df, "key", ["t"], k=k).collect()
    }
    merged = sorted(set(sk["a"]) | set(sk["b"]))[:k]
    full = sorted(
        r.h
        for r in df.select(_kmv_hash(F.col("key")).alias("h"))
        .distinct()
        .collect()
    )[:k]
    assert merged == full

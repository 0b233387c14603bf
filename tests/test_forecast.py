"""Holt linear-trend forecasting + EWMA anomaly band — known-answer
fixtures against a pure-Python replica (the driver oracle covers the
testdata-scale replay; these pin the semantics)."""

from __future__ import annotations

import pytest

from osprey_spark.operators.forecast import holt_forecast


def _counts(spark, rows):
    return spark.createDataFrame(rows, "key string, hour long, cnt long")


def _holt_python(xs, alpha=0.5, beta=0.25, gamma=0.25, k=4.0, warmup=8):
    l, b, a = float(xs[0]), 0.0, 0.0
    out = []
    for t, x in enumerate(xs[1:], start=1):
        f = l + b
        r = x - f
        flag = 1 if (abs(r) > k * a and (t - 1) >= warmup) else 0
        out.append((round(f, 6), round(r, 6), flag))
        nl = alpha * x + (1.0 - alpha) * (l + b)
        b = beta * (nl - l) + (1.0 - beta) * b
        a = gamma * abs(r) + (1.0 - gamma) * a
        l = nl
    return out


def test_holt_matches_python_replica(spark):
    xs = [5, 7, 6, 9, 30, 8, 7, 10, 11, 9, 8, 50, 9, 10]
    rows = [("a", 100 + i, x) for i, x in enumerate(xs)]
    got = sorted(
        (r.hour, r.actual, r.forecast, r.resid, r.anomaly)
        for r in holt_forecast(_counts(spark, rows)).collect()
    )
    expect = [
        (100 + i + 1, xs[i + 1], f, r, fl)
        for i, (f, r, fl) in enumerate(_holt_python(xs))
    ]
    assert got == expect


def test_holt_zero_fills_missing_hours(spark):
    """A gap in the sparse counts is an observation of 0, not a skip:
    the gap hours appear in the output with actual=0."""
    rows = [("g", 10, 5), ("g", 11, 5), ("g", 15, 5)]
    got = {r.hour: r.actual for r in holt_forecast(_counts(spark, rows)).collect()}
    assert set(got) == {11, 12, 13, 14, 15}
    assert got[12] == 0 and got[13] == 0 and got[14] == 0


def test_holt_trend_absorbs_growth_but_spike_alarms(spark):
    """A steady linear ramp never alarms (the trend term tracks it);
    the same final value as a spike after a flat history does."""
    ramp = [("r", i, 10 + 5 * i) for i in range(30)]
    out_r = holt_forecast(_counts(spark, ramp)).collect()
    assert all(r.anomaly == 0 for r in out_r)
    flat = [("f", i, 10) for i in range(29)] + [("f", 29, 160)]
    out_f = {r.hour: r.anomaly for r in holt_forecast(_counts(spark, flat)).collect()}
    assert out_f[29] == 1 and all(v == 0 for h, v in out_f.items() if h != 29)


def test_holt_trailing_max_points_cap(spark):
    rows = [("c", i, i) for i in range(20)]
    out = holt_forecast(_counts(spark, rows), max_points=6).collect()
    # 6 trailing hours 14..19 -> emissions for 15..19
    assert sorted(r.hour for r in out) == [15, 16, 17, 18, 19]


def test_holt_validation(spark):
    rows = [("v", 0, 1), ("v", 1, 2)]
    with pytest.raises(ValueError, match="alpha"):
        holt_forecast(_counts(spark, rows), alpha=1.0)
    with pytest.raises(ValueError, match="warmup"):
        holt_forecast(_counts(spark, rows), warmup=0)


# --------------------------------------------------------------------------
# Theil-Sen robust trend
# --------------------------------------------------------------------------


def _ts_turns(spark, rows):
    """rows: (key, hour_offset) — one event per row."""
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    data = [(k, t0 + dt.timedelta(hours=h)) for k, h in rows]
    return spark.createDataFrame(data, "conv_id string, ts timestamp")


def _theil_python(points):
    """points: [(bucket, count)] — median of pairwise slopes with the
    (slope, b1, b2) tie-break and two-middle-row averaging."""
    ps = sorted(points)
    slopes = []
    for i in range(len(ps)):
        for j in range(i + 1, len(ps)):
            b1, c1 = ps[i]
            b2, c2 = ps[j]
            slopes.append(((c2 - c1) / (b2 - b1), b1, b2))
    slopes.sort()
    n = len(slopes)
    lo, hi = (n + 1) // 2, (n + 2) // 2
    return round((slopes[lo - 1][0] + slopes[hi - 1][0]) / 2.0, 6)


def test_theil_sen_linear_series_exact_slope(spark):
    """Counts 1,2,3,4 at hours 0..3: every pairwise slope is 1."""
    from osprey_spark.operators.forecast import theil_sen

    rows = []
    for h, c in enumerate([1, 2, 3, 4]):
        rows += [("a", h)] * c
    out = theil_sen(_ts_turns(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_points"], r["n_pairs"], r["slope"]) == (4, 6, 1.0)


def test_theil_sen_outlier_resistant(spark):
    """A flat series with one 50x spike: OLS would report a big
    positive slope; the pairwise-slope median stays ~0 (exact value
    pinned by the python replica)."""
    from osprey_spark.operators.forecast import theil_sen

    counts = [(0, 2), (1, 2), (2, 100), (3, 2), (4, 2), (5, 2), (6, 2)]
    rows = []
    for h, c in counts:
        rows += [("a", h)] * c
    out = theil_sen(_ts_turns(spark, rows)).collect()[0]
    expect = _theil_python(counts)
    assert out["slope"] == expect
    assert abs(out["slope"]) <= 0.5


def test_theil_sen_even_pair_count_averages_middles(spark):
    from osprey_spark.operators.forecast import theil_sen

    counts = [(0, 1), (1, 3), (2, 4), (10, 5)]
    rows = []
    for h, c in counts:
        rows += [("b", h)] * c
    out = theil_sen(_ts_turns(spark, rows)).collect()[0]
    assert out["n_pairs"] == 6
    assert out["slope"] == _theil_python(counts)


def test_theil_sen_min_points_filter_and_validation(spark):
    from osprey_spark.operators.forecast import theil_sen

    rows = [("a", 0), ("a", 1)]  # 2 observed buckets < 3
    assert theil_sen(_ts_turns(spark, rows)).count() == 0
    with pytest.raises(ValueError):
        theil_sen(_ts_turns(spark, rows), bucket_s=0)
    with pytest.raises(ValueError):
        theil_sen(_ts_turns(spark, rows), min_points=1)
    with pytest.raises(ValueError):
        theil_sen(_ts_turns(spark, rows), cap=2, min_points=3)


# --------------------------------------------------------------------------
# seasonal (time-of-day) profile
# --------------------------------------------------------------------------


def test_seasonal_profile_median_and_outlier(spark):
    """Phase 3 sees counts [2, 2, 2, 20] across four cycles: median
    2, max 20, one outlier (> 3x median). Phase 5 sees [4, 6]:
    median 5.0 (even split), no outlier."""
    import datetime as dt

    from osprey_spark.operators.forecast import seasonal_profile

    t0 = dt.datetime(2025, 1, 5)  # midnight UTC
    rows = []
    for cyc, c in enumerate([2, 2, 2, 20]):
        for i in range(c):
            rows.append((t0 + dt.timedelta(days=cyc, hours=3, seconds=i),))
    for cyc, c in enumerate([4, 6]):
        for i in range(c):
            rows.append((t0 + dt.timedelta(days=cyc, hours=5, seconds=i),))
    df = spark.createDataFrame(rows, "ts timestamp")
    got = {r["phase"]: r for r in seasonal_profile(df).collect()}
    # phase index depends on epoch alignment: hour-of-day of t0+3h
    ph3 = (int(t0.timestamp()) // 3600 + 3) % 24
    ph5 = (int(t0.timestamp()) // 3600 + 5) % 24
    r3 = got[ph3]
    assert (r3["n_cycles"], r3["median_cnt"], r3["max_cnt"], r3["n_outliers"]) == (
        4, 2.0, 20, 1,
    )
    r5 = got[ph5]
    assert (r5["n_cycles"], r5["median_cnt"], r5["max_cnt"], r5["n_outliers"]) == (
        2, 5.0, 6, 0,
    )


def test_seasonal_profile_validation(spark):
    import datetime as dt

    from osprey_spark.operators.forecast import seasonal_profile

    df = spark.createDataFrame([(dt.datetime(2025, 1, 1),)], "ts timestamp")
    with pytest.raises(ValueError):
        seasonal_profile(df, bucket_s=0)
    with pytest.raises(ValueError):
        seasonal_profile(df, period=1)

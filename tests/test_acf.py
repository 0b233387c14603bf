"""Hourly-count autocorrelation."""

from __future__ import annotations

import datetime as dt

import pytest

from osprey_spark.operators.forecast import acf_hourly

T0 = dt.datetime(2025, 3, 1, 0, 0, 0)


def _turns_hours(spark, counts):
    """counts[i] events in hour i (0 events -> hour absent, zero-filled)."""
    rows = []
    for i, c in enumerate(counts):
        for j in range(c):
            rows.append((f"c{j}", T0 + dt.timedelta(hours=i, minutes=j % 50)))
    return spark.createDataFrame(rows, "conv_id string, ts timestamp")


def _py_acf(xs, max_lag):
    n = len(xs)
    m = sum(xs) / n
    den = sum((v - m) ** 2 for v in xs)
    out = {}
    for k in range(1, min(max_lag, n - 2) + 1):
        num = sum((xs[t] - m) * (xs[t + k] - m) for t in range(n - k))
        out[k] = round(num / den, 6)
    return out


def test_acf_periodic_series_peaks_at_period(spark):
    """Period-4 sawtooth repeated: ACF(4) ~ 1, ACF(2) strongly negative."""
    counts = [8, 2, 1, 2] * 6
    got = {r.lag: r.acf for r in acf_hourly(_turns_hours(spark, counts), max_lag=8).collect()}
    exp = _py_acf(counts, 8)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=2e-6), k
    assert got[4] > 0.8 and got[8] > 0.6
    assert got[2] < 0


def test_acf_zero_fill_of_missing_hours(spark):
    """Hours with no events enter as zeros: [5,0,5,0,...] alternation
    gives a strongly negative lag-1 ACF even though the '0' hours
    have no input rows."""
    counts = [5, 0] * 8
    got = {r.lag: r.acf for r in acf_hourly(_turns_hours(spark, counts), max_lag=4).collect()}
    # the trailing empty hour is outside the observed span (max(h) is
    # the last hour WITH events), so the series is counts[:15]
    exp = _py_acf(counts[:15], 4)
    assert got == exp
    assert got[1] < -0.8 and got[2] > 0.8


def test_acf_lag_cap_and_n_obs(spark):
    counts = [3, 1, 4, 1, 5, 9, 2, 6]
    out = acf_hourly(_turns_hours(spark, counts), max_lag=100).collect()
    # n=8 -> lags 1..6
    assert [r.lag for r in out] == list(range(1, 7))
    assert [r.n_obs for r in out] == [8 - k for k in range(1, 7)]
    exp = _py_acf(counts, 100)
    for r in out:
        assert r.acf == pytest.approx(exp[r.lag], abs=2e-6)


def test_acf_degenerate_constant_and_short(spark):
    # constant series: zero variance -> no rows
    assert acf_hourly(_turns_hours(spark, [4, 4, 4, 4]), max_lag=3).count() == 0
    # too short (n=2): no rows
    assert acf_hourly(_turns_hours(spark, [1, 2]), max_lag=3).count() == 0
    with pytest.raises(ValueError, match="max_lag"):
        acf_hourly(_turns_hours(spark, [1, 2, 3]), max_lag=0)


# --- cross-correlation lead-lag -----------------------------------------------


def _turns_two(spark, xs, ys):
    """xs[i] user events and ys[i] tool events in hour i."""
    rows = []
    for i, c in enumerate(xs):
        for j in range(c):
            rows.append(("user", T0 + dt.timedelta(hours=i, minutes=j % 50)))
    for i, c in enumerate(ys):
        for j in range(c):
            rows.append(("tool", T0 + dt.timedelta(hours=i, minutes=(j + 7) % 50)))
    return spark.createDataFrame(rows, "role string, ts timestamp")


def _py_ccf(xs, ys, max_lag):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denx = sum((v - mx) ** 2 for v in xs)
    deny = sum((v - my) ** 2 for v in ys)
    den = (denx * deny) ** 0.5
    out = {}
    for k in range(-min(max_lag, n - 2), min(max_lag, n - 2) + 1):
        if k >= 0:
            pairs = [(xs[t], ys[t + k]) for t in range(n - k)]
        else:
            pairs = [(xs[t - k], ys[t]) for t in range(n + k)]
        num = sum((a - mx) * (b - my) for a, b in pairs)
        out[k] = round(num / den, 6)
    return out


def test_ccf_shifted_series_peaks_at_shift(spark):
    """ys is xs delayed by 3 hours: CCF peaks at lag +3 (left leads)."""
    import pytest as _pt

    from osprey_spark.operators.forecast import ccf_hourly
    from pyspark.sql import functions as F

    base = [9, 1, 1, 7, 2, 1, 8, 1, 2, 6, 1, 1, 9, 2, 1, 7]
    xs = base + [1, 1, 1]
    ys = [1, 1, 1] + base
    df = _turns_two(spark, xs, ys)
    got = {
        r.lag: r.ccf
        for r in ccf_hourly(
            df, F.col("role") == "user", F.col("role") == "tool", max_lag=5
        ).collect()
    }
    exp = _py_ccf(xs, ys, 5)
    for k in exp:
        assert got[k] == _pt.approx(exp[k], abs=2e-6), k
    assert max(got, key=got.get) == 3


def test_ccf_symmetry_of_autocase(spark):
    """x == y: CCF(k) == CCF(-k) and CCF(0) == 1."""
    from osprey_spark.operators.forecast import ccf_hourly
    from pyspark.sql import functions as F

    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    df = _turns_two(spark, xs, xs)
    got = {
        r.lag: r.ccf
        for r in ccf_hourly(
            df, F.col("role") == "user", F.col("role") == "tool", max_lag=4
        ).collect()
    }
    assert got[0] == 1.0
    for k in (1, 2, 3, 4):
        assert got[k] == got[-k]


def test_ccf_degenerate_and_validation(spark):
    import pytest as _pt

    from osprey_spark.operators.forecast import ccf_hourly
    from pyspark.sql import functions as F

    # constant right series -> zero variance -> no rows
    df = _turns_two(spark, [1, 5, 2, 4], [2, 2, 2, 2])
    assert (
        ccf_hourly(df, F.col("role") == "user", F.col("role") == "tool").count()
        == 0
    )
    with _pt.raises(ValueError, match="max_lag"):
        ccf_hourly(df, F.lit(True), F.lit(True), max_lag=0)

"""Kaplan-Meier survival over conversation lifetimes."""

from __future__ import annotations

import datetime as dt

import pytest

from osprey_spark.operators.survival import km_survival

T0 = dt.datetime(2025, 1, 1, 0, 0, 0)


def _turns(spark, rows):
    """rows: (conv_id, offset_seconds)"""
    data = [(c, T0 + dt.timedelta(seconds=s)) for c, s in rows]
    return spark.createDataFrame(data, "conv_id string, ts timestamp")


def _km(spark, rows, **kw):
    out = km_survival(_turns(spark, rows), **kw).collect()
    return {
        r.t_bucket: (r.n_risk, r.d_events, r.c_censored, r.survival)
        for r in out
    }


def test_km_known_answer_classic(spark):
    """Durations 0/1/2/3 buckets; the fresh conv censors, the stale
    three are events: the curve steps 1.0 -> 2/3 -> 1/3 -> 0."""
    rows = [
        ("a", 0), ("a", 60),          # dur 60  -> bucket 1
        ("b", 0), ("b", 120),         # dur 120 -> bucket 2
        ("c", 0), ("c", 180),         # dur 180 -> bucket 3
        ("d", 1000),                  # dur 0   -> bucket 0, global max anchor
    ]
    got = _km(spark, rows, horizon_s=120, bucket_s=60)
    # global max last = 1000; a/b/c lag >= 820 > 120 -> events; d lag 0 -> censored
    assert got[0] == (4, 0, 1, 1.0)
    assert got[1] == (3, 1, 0, round(2 / 3, 6))
    assert got[2] == (2, 1, 0, round((2 / 3) * (1 / 2), 6))
    assert got[3] == (1, 1, 0, 0.0)


def test_km_tied_events_and_same_bucket_censor(spark):
    """Two events + one censored in the same bucket: all three are at
    risk there and the factor is (n-2)/n exactly once."""
    rows = [
        ("a", 0), ("a", 30),    # bucket 0, event
        ("b", 0), ("b", 45),    # bucket 0, event
        ("c", 900), ("c", 930),  # bucket 0, censored (lag 70 < 100)
        ("d", 0), ("d", 70),    # bucket 1, event
        ("e", 1000),            # bucket 0, censored anchor
    ]
    got = _km(spark, rows, horizon_s=100, bucket_s=60)
    # bucket 0: n=5, d=2, c=2 -> S = 3/5; bucket 1: n=1, d=1 -> 0
    assert got[0] == (5, 2, 2, 0.6)
    assert got[1] == (1, 1, 0, 0.0)


def test_km_matches_python_replica(spark):
    """Exact agreement with a pure-Python product-limit replica on a
    deterministic many-conv set."""
    rows = []
    lives = {}
    for i in range(40):
        dur = (i * 37) % 500
        start = (i * 911) % 300
        rows += [(f"c{i}", start), (f"c{i}", start + dur)]
        lives[f"c{i}"] = (dur, start + dur)
    gmax = max(last for _, last in lives.values())
    horizon, bucket = 200, 60
    marked = [
        (dur // bucket, 1 if last <= gmax - horizon else 0)
        for dur, last in lives.values()
    ]
    from collections import Counter

    d = Counter(t for t, e in marked if e)
    c = Counter(t for t, e in marked if not e)
    times = sorted(set(d) | set(c))
    total = len(marked)
    exp, surv, seen = {}, 1.0, 0
    for t in times:
        n = total - seen
        surv = surv * ((n - d[t]) / n)
        exp[t] = (n, d[t], c[t], round(surv, 6))
        seen += d[t] + c[t]
    got = _km(spark, rows, horizon_s=horizon, bucket_s=bucket)
    assert got == exp


def test_km_all_censored_flat_curve(spark):
    rows = [("a", 0), ("a", 60), ("b", 0), ("b", 120)]
    got = _km(spark, rows, horizon_s=10**9, bucket_s=60)
    assert all(v[3] == 1.0 and v[1] == 0 for v in got.values())


def test_km_validation(spark):
    df = _turns(spark, [("a", 0)])
    with pytest.raises(ValueError, match="bucket_s"):
        km_survival(df, bucket_s=0)
    with pytest.raises(ValueError, match="horizon_s"):
        km_survival(df, horizon_s=-1)


# --------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard
# --------------------------------------------------------------------------


def _na(spark, rows, **kw):
    from osprey_spark.operators.survival import nelson_aalen

    out = nelson_aalen(_turns(spark, rows), **kw).collect()
    return {
        r.t_bucket: (r.n_risk, r.d_events, r.c_censored, r.cum_hazard, r.fh_survival)
        for r in out
    }


def test_na_known_answer_classic(spark):
    """Same frame as the KM classic: H steps 0 -> 1/3 -> 1/3+1/2 ->
    1/3+1/2+1, each increment one d/n division in fixed order."""
    import math

    rows = [
        ("a", 0), ("a", 60),
        ("b", 0), ("b", 120),
        ("c", 0), ("c", 180),
        ("d", 1000),
    ]
    got = _na(spark, rows, horizon_s=120, bucket_s=60)
    h1 = 0.0 + 1 / 3
    h2 = h1 + 1 / 2
    h3 = h2 + 1 / 1
    assert got[0] == (4, 0, 1, 0.0, 1.0)
    assert got[1] == (3, 1, 0, round(h1, 6), round(math.exp(-h1), 6))
    assert got[2] == (2, 1, 0, round(h2, 6), round(math.exp(-h2), 6))
    assert got[3] == (1, 1, 0, round(h3, 6), round(math.exp(-h3), 6))


def test_na_dominates_km_log(spark):
    """H(t) >= -ln(S_KM(t)) pointwise (Jensen: -ln(1-x) >= x), and the
    FH survival exp(-H) >= KM survival... actually exp(-H) >= S_KM
    because each exp(-d/n) >= 1 - d/n. Checked on the classic frame
    where S_KM > 0."""
    rows = [
        ("a", 0), ("a", 60),
        ("b", 0), ("b", 120),
        ("c", 0), ("c", 180),
        ("d", 1000),
    ]
    km = _km(spark, rows, horizon_s=120, bucket_s=60)
    na = _na(spark, rows, horizon_s=120, bucket_s=60)
    for t in km:
        assert na[t][4] >= km[t][3]


def test_na_same_bucket_ties(spark):
    rows = [
        ("a", 0), ("a", 30),
        ("b", 0), ("b", 45),
        ("c", 900), ("c", 930),
        ("d", 0), ("d", 70),
        ("e", 1000),
    ]
    got = _na(spark, rows, horizon_s=100, bucket_s=60)
    assert got[0][:4] == (5, 2, 2, round(2 / 5, 6))
    assert got[1][:4] == (1, 1, 0, round(2 / 5 + 1 / 1, 6))


def test_na_validation(spark):
    from osprey_spark.operators.survival import nelson_aalen

    with pytest.raises(ValueError):
        nelson_aalen(_turns(spark, [("a", 0)]), bucket_s=0)
    with pytest.raises(ValueError):
        nelson_aalen(_turns(spark, [("a", 0)]), horizon_s=-1)

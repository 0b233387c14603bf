"""Data-quality gate: each expectation catches exactly its violation
class on a crafted dirty frame, and a clean frame passes everything."""

from __future__ import annotations

import pyspark.sql.functions as F

from osprey_spark.operators.dq import dq_checks


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts_str string"
    ).select(
        "conv_id", "turn_idx", "role", "text",
        F.to_timestamp("ts_str").alias("ts"),
    )


def test_dq_clean_frame_passes(spark):
    rows = [
        ("c1", 0, "user", "hi", "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", "hello", "2024-01-01 00:00:05"),
        ("c2", 0, "system", "boot", "2024-01-01 01:00:00"),
    ]
    out = {r.check_name: r for r in dq_checks(_frame(spark, rows)).collect()}
    assert len(out) == 7
    assert all(r.passed for r in out.values())
    assert all(r.violations == 0 for r in out.values())
    assert out["null_ts"].total == 3
    assert out["sparse_conv"].total == 2  # conv-level check counts convs


def test_dq_each_check_catches_its_violation(spark):
    rows = [
        (None, 0, "user", "x", "2024-01-01 00:00:00"),          # null conv
        ("c1", 0, "user", None, "2024-01-01 00:00:00"),         # null text
        ("c1", 1, "robot", "x", "2024-01-01 00:00:01"),         # bad role
        ("c1", 2, "user", "x", None),                           # null ts
        ("c2", -1, "user", "x", "2024-01-01 00:00:00"),         # negative idx
        ("c3", 0, "user", "x", "2024-01-01 00:00:10"),
        ("c3", 1, "user", "x", "2024-01-01 00:00:05"),          # ts regression
        ("c4", 1, "user", "x", "2024-01-01 00:00:00"),          # sparse (no idx 0)
    ]
    out = {r.check_name: r for r in dq_checks(_frame(spark, rows)).collect()}
    assert out["null_conv_id"].violations == 1
    assert out["null_text"].violations == 1
    assert out["bad_role"].violations == 1
    assert out["null_ts"].violations == 1
    assert out["negative_turn_idx"].violations == 1
    assert out["ts_regression"].violations == 1
    # sparse convs: c2 (min=-1) and c4 (min=1, max+1 != n)... c1 has
    # idx 0,1,2 dense; None-conv group and c3 are dense
    assert out["sparse_conv"].violations == 2
    assert not out["bad_role"].passed


def test_streaming_dq_observed_metrics(spark, tmp_path):
    """observe_dq=True: the row-level expectations ride the rule
    pipeline's existing micro-batch pass and land per batch in the
    metrics listener's records — including a real violation count."""
    import os
    import time

    from osprey_spark.compiler import compile_ruleset
    from osprey_spark.streaming.metrics import JsonMetricsListener, read_metrics
    from osprey_spark.streaming.pipeline import StreamingRuleEngine
    from osprey_spark.turns import TURN_BINDINGS

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    rows = [
        ("c1", 0, "user", "hi", "2024-01-01 10:00:00"),
        ("c1", 1, "robot", "bad role here", "2024-01-01 10:00:05"),
        ("c2", 0, "assistant", None, "2024-01-01 10:00:10"),
    ]
    _frame(spark, rows).coalesce(1).write.parquet(in_dir)

    rs = compile_ruleset(
        {"main.sml": "K: str = JsonData(path='$.conv_id')\n"},
        bindings=TURN_BINDINGS,
    )
    mpath = str(tmp_path / "metrics.jsonl")
    listener = JsonMetricsListener(mpath)
    spark.streams.addListener(listener)
    try:
        eng = StreamingRuleEngine(
            spark, rs, in_dir, out_dir,
            passthrough=("conv_id", "turn_idx"), observe_dq=True,
        )
        eng.run_to_completion()
        for _ in range(40):
            if any("observed" in r for r in read_metrics(mpath)):
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)
    obs = [
        r["observed"]["dq"]
        for r in read_metrics(mpath)
        if r.get("event") == "progress" and "observed" in r
        and "dq" in r.get("observed", {})
    ]
    assert obs, "no dq observation reached the listener"
    agg = {
        k: sum(o[k] for o in obs)
        for k in ("rows", "bad_role", "null_text", "null_conv_id")
    }
    assert agg["rows"] == 3
    assert agg["bad_role"] == 1
    assert agg["null_text"] == 1
    assert agg["null_conv_id"] == 0


# --- Benford first-digit screen ----------------------------------------------


def test_benford_flags_fabricated_amounts(spark):
    """A Benford-conforming group stays quiet; a group of all-9xx
    amounts (structuring under a 1000 threshold) lights up."""
    import math

    from osprey_spark.operators.dq import benford_deviation

    rows = []
    # organic: counts proportional to Benford probabilities (x100)
    for d in range(1, 10):
        n_d = round(100 * math.log10(1 + 1 / d))
        rows += [("honest", float(f"{d}23.45"))] * n_d
    rows += [("fraud", 9.99)] * 60  # every amount starts with 9
    df = spark.createDataFrame(rows, "user_id string, value double")
    out = {r.user_id: r for r in benford_deviation(df, min_n=50).collect()}
    assert out["honest"].suspicious == 0
    assert out["fraud"].suspicious == 1
    assert out["fraud"].chi2 > out["honest"].chi2


def test_benford_chi2_known_answer_and_missing_digits(spark):
    """Exact χ² replica including the full expectation of ABSENT
    digits; groups under min_n and non-positive amounts drop."""
    import math

    from osprey_spark.operators.dq import benford_deviation

    rows = [("g", 1.23)] * 30 + [("g", 2.50)] * 20  # only digits 1 and 2
    rows += [("g", 0.0)] * 5 + [("g", -3.0)] * 5  # ignored: cents <= 0
    rows += [("tiny", 5.0)] * 10  # under min_n
    df = spark.createDataFrame(rows, "user_id string, value double")
    out = benford_deviation(df, min_n=50).collect()
    assert len(out) == 1 and out[0].user_id == "g" and out[0].n == 50
    n, counts = 50, {1: 30, 2: 20}
    chi2 = 0.0
    for d in range(1, 10):
        exp = n * math.log10(1 + 1 / d)
        c = counts.get(d, 0)
        chi2 += (c - exp) * (c - exp) / exp
    assert abs(out[0].chi2 - round(chi2, 6)) < 2e-6


def test_benford_validation(spark):
    import pytest

    from osprey_spark.operators.dq import benford_deviation

    df = spark.createDataFrame([("a", 1.0)], "user_id string, value double")
    with pytest.raises(ValueError, match="min_n"):
        benford_deviation(df, min_n=5)


# --- Cohen's kappa rule agreement ---------------------------------------------


def _rated(spark, pairs):
    return spark.createDataFrame(pairs, "a int, b int")


def test_kappa_perfect_and_inverted(spark):
    from osprey_spark.operators.dq import cohens_kappa

    r = cohens_kappa(_rated(spark, [(1, 1)] * 3 + [(0, 0)] * 5), "a", "b").collect()[0]
    assert (r.kappa, r.po) == (1.0, 1.0)
    r = cohens_kappa(_rated(spark, [(1, 0)] * 4 + [(0, 1)] * 4), "a", "b").collect()[0]
    assert r.kappa == -1.0 and r.po == 0.0


def test_kappa_chance_inflated_agreement(spark):
    """Two rare independent raters: raw agreement is high (n00
    dominates) but kappa stays near zero — the exact 2x2 from Cohen's
    formula, hand-computed."""
    from osprey_spark.operators.dq import cohens_kappa

    # n=100: n11=1, n10=9, n01=9, n00=81 -> marginals 10/90 each side
    pairs = [(1, 1)] + [(1, 0)] * 9 + [(0, 1)] * 9 + [(0, 0)] * 81
    r = cohens_kappa(_rated(spark, pairs), "a", "b").collect()[0]
    assert r.po == 0.82
    assert r.pe == round((10 * 10 + 90 * 90) / 10000, 6)  # 0.82
    assert r.kappa == 0.0  # po == pe exactly by construction


def test_kappa_known_answer(spark):
    from osprey_spark.operators.dq import cohens_kappa

    # classic: n=50, n11=20, n10=5, n01=10, n00=15
    pairs = [(1, 1)] * 20 + [(1, 0)] * 5 + [(0, 1)] * 10 + [(0, 0)] * 15
    r = cohens_kappa(_rated(spark, pairs), "a", "b").collect()[0]
    po = 35 / 50
    pe = (25 * 30 + 20 * 25) / 2500
    assert r.kappa == round((po - pe) / (1 - pe), 6)


def test_kappa_degenerate_constant_raters(spark):
    from osprey_spark.operators.dq import cohens_kappa

    r = cohens_kappa(_rated(spark, [(1, 1)] * 4), "a", "b").collect()[0]
    assert r.kappa is None and r.po == 1.0 and r.pe == 1.0


def test_kappa_accepts_boolean_columns(spark):
    from pyspark.sql import functions as F

    from osprey_spark.operators.dq import cohens_kappa

    df = _rated(spark, [(1, 1), (0, 0), (1, 0)]).select(
        F.col("a").cast("boolean").alias("a"), F.col("b").cast("boolean").alias("b")
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert (r.n11, r.n10, r.n01, r.n00) == (1, 1, 0, 1)


# --- two-proportion A/B z-test ------------------------------------------------


def _armed(spark, rows):
    return spark.createDataFrame(rows, "g int, m int")


def test_ab_known_answer(spark):
    import math

    from osprey_spark.operators.dq import ab_test

    # control: 100 units, 20 convert; treatment: 100 units, 30 convert
    rows = [(0, 1)] * 20 + [(0, 0)] * 80 + [(1, 1)] * 30 + [(1, 0)] * 70
    r = ab_test(_armed(spark, rows), "g", "m").collect()[0]
    assert (r.n_c, r.n_t, r.x_c, r.x_t) == (100, 100, 20, 30)
    assert (r.p_c, r.p_t, r.lift) == (0.2, 0.3, round(0.3 - 0.2, 6))
    pooled = 50 / 200
    se = math.sqrt(pooled * (1 - pooled) * (1 / 100 + 1 / 100))
    assert r.z == round((0.3 - 0.2) / se, 6)


def test_ab_null_effect_z_zero(spark):
    from osprey_spark.operators.dq import ab_test

    rows = [(0, 1)] * 5 + [(0, 0)] * 5 + [(1, 1)] * 5 + [(1, 0)] * 5
    r = ab_test(_armed(spark, rows), "g", "m").collect()[0]
    assert r.z == 0.0 and r.lift == 0.0


def test_ab_degenerate_cases(spark):
    from osprey_spark.operators.dq import ab_test

    # empty treatment arm
    r = ab_test(_armed(spark, [(0, 1), (0, 0)]), "g", "m").collect()[0]
    assert r.n_t == 0 and r.p_t is None and r.lift is None and r.z is None
    assert r.p_c == 0.5
    # nobody converts anywhere -> pooled 0 -> z NULL, lift defined
    r = ab_test(_armed(spark, [(0, 0), (1, 0)]), "g", "m").collect()[0]
    assert r.z is None and r.lift == 0.0


# --- rule precision/recall backtest -------------------------------------------


def test_rule_prf_known_answer(spark):
    from osprey_spark.operators.dq import rule_prf

    rows = [
        # (truth, ra, rb)
        (1, 1, 0), (1, 1, 0), (1, 0, 1), (0, 1, 0), (0, 0, 0), (0, 0, 1),
    ]
    df = spark.createDataFrame(rows, "truth int, ra int, rb int")
    out = {r.rule: r for r in rule_prf(df, "truth", ["ra", "rb"]).collect()}
    a = out["ra"]
    assert (a.tp, a.fp, a.fn, a.tn) == (2, 1, 1, 2)
    assert a.precision == round(2 / 3, 6) == a.recall
    assert a.f1 == round(4 / 6, 6)
    b = out["rb"]
    assert (b.tp, b.fp, b.fn, b.tn) == (1, 1, 2, 2)
    assert b.precision == 0.5 and b.recall == round(1 / 3, 6)
    assert b.f1 == round(2 / 5, 6)


def test_rule_prf_degenerate_and_validation(spark):
    import pytest

    from osprey_spark.operators.dq import rule_prf

    df = spark.createDataFrame([(0, 0), (0, 0)], "truth int, ra int")
    r = rule_prf(df, "truth", ["ra"]).collect()[0]
    assert r.precision is None and r.recall is None and r.f1 is None
    with pytest.raises(ValueError, match="at least one"):
        rule_prf(df, "truth", [])


# --- Gini activity concentration ----------------------------------------------


def _events_for(spark, counts):
    rows = [(f"k{i}", j) for i, c in enumerate(counts) for j in range(c)]
    return spark.createDataFrame(rows, "key string, x int")


def test_gini_perfect_equality(spark):
    from osprey_spark.operators.dq import gini_concentration

    r = gini_concentration(_events_for(spark, [4, 4, 4, 4]), "key").collect()[0]
    assert (r.n_keys, r.total, r.gini) == (4, 16, 0.0)


def test_gini_known_answer_and_replica(spark):
    from osprey_spark.operators.dq import gini_concentration

    counts = [1, 1, 2, 3, 5, 8, 20]
    xs = sorted(counts)
    n, s = len(xs), sum(xs)
    g = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * s) - (n + 1) / n
    r = gini_concentration(_events_for(spark, counts), "key").collect()[0]
    assert (r.n_keys, r.total) == (n, s)
    assert r.gini == round(g, 6)


def test_gini_extreme_concentration(spark):
    from osprey_spark.operators.dq import gini_concentration

    # 9 keys with 1 event, 1 whale with 91: gini near (but below) 1
    r = gini_concentration(_events_for(spark, [1] * 9 + [91]), "key").collect()[0]
    xs = [1] * 9 + [91]
    n, s = 10, 100
    g = 2 * sum((i + 1) * x for i, x in enumerate(sorted(xs))) / (n * s) - (n + 1) / n
    assert r.gini == round(g, 6) and r.gini > 0.8


def test_gini_tie_groups_match_sorted_formula(spark):
    """Heavy ties exercise the k·m + k(k+1)/2 rank algebra."""
    from osprey_spark.operators.dq import gini_concentration

    counts = [2] * 5 + [7] * 3 + [1] * 4
    xs = sorted(counts)
    n, s = len(xs), sum(xs)
    g = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * s) - (n + 1) / n
    r = gini_concentration(_events_for(spark, counts), "key").collect()[0]
    assert r.gini == round(g, 6)


# --- Fano-factor regularity screen --------------------------------------------


import datetime as _dt

_F_T0 = _dt.datetime(2025, 5, 1)


def _clocked(spark, spec):
    """spec: {key: [(hour, n_events)]}"""
    rows = []
    for k, buckets in spec.items():
        for h, n in buckets:
            for j in range(n):
                rows.append((k, _F_T0 + _dt.timedelta(hours=h, minutes=j % 55)))
    return spark.createDataFrame(rows, "conv_id string, ts timestamp")


def test_fano_cron_bot_vs_bursty(spark):
    from osprey_spark.operators.dq import fano_regularity

    spec = {
        # exactly 3 events every hour for 12 hours: variance 0 -> fano 0
        "cron": [(h, 3) for h in range(12)],
        # all 36 events in one hour of a 12-hour span: fano huge
        "burst": [(0, 36), (11, 1)],
    }
    out = {
        r.conv_id: r
        for r in fano_regularity(
            _clocked(spark, spec), key_col="conv_id", min_buckets=6
        ).collect()
    }
    assert out["cron"].fano == 0.0 and out["cron"].flag == 1
    assert out["burst"].fano > 4.0 and out["burst"].flag == 1
    assert out["cron"].mean == 3.0 and out["cron"].n_buckets == 12


def test_fano_poissonish_not_flagged_and_zero_hours_count(spark):
    from osprey_spark.operators.dq import fano_regularity

    # counts [2,0,1,3,0,2,1,3] over span 8 (two EMPTY hours enter as 0)
    spec = {"h": [(0, 2), (2, 1), (3, 3), (5, 2), (6, 1), (7, 3)]}
    out = fano_regularity(
        _clocked(spark, spec), key_col="conv_id", min_buckets=6
    ).collect()[0]
    xs = [2, 0, 1, 3, 0, 2, 1, 3]
    mu = sum(xs) / 8
    var = sum(x * x for x in xs) / 8 - mu * mu
    assert out.n_buckets == 8 and out.mean == mu
    assert out.fano == round(var / mu, 6)
    assert out.flag == 0


def test_fano_span_filter_and_validation(spark):
    import pytest

    from osprey_spark.operators.dq import fano_regularity

    spec = {"short": [(0, 5), (2, 5)]}
    assert (
        fano_regularity(
            _clocked(spark, spec), key_col="conv_id", min_buckets=6
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="min_buckets"):
        fano_regularity(_clocked(spark, spec), key_col="conv_id", min_buckets=1)


# --------------------------------------------------------------------------
# burstiness + k-anonymity
# --------------------------------------------------------------------------


def _bt_turns(spark, rows):
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    data = [(k, t0 + dt.timedelta(seconds=s)) for k, s in rows]
    return spark.createDataFrame(data, "conv_id string, ts timestamp")


def test_burstiness_periodic_vs_bursty(spark):
    """Exact metronome gaps → σ=0 → B=-1 (flagged); one huge gap in a
    run of tiny ones → B near +1 (flagged); moderate jitter → no flag."""
    from osprey_spark.operators.dq import burstiness

    import math

    rows = [("cron", 10 * i) for i in range(8)]          # gaps all 10
    # 20 unit gaps + one 99980 gap: B -> (sqrt(20)-1)/(sqrt(20)+1) ~ 0.63
    rows += [("burst", s) for s in list(range(21)) + [100000]]
    # Poisson-like (exponential-ish) gaps 2,1,30,7,18,4: sigma ~ mu -> B ~ 0
    jitter = [0, 2, 3, 33, 40, 58, 62]
    rows += [("human", s) for s in jitter]
    out = {r["conv_id"]: r for r in burstiness(_bt_turns(spark, rows), key_col="conv_id").collect()}
    assert out["cron"]["b"] == -1.0 and out["cron"]["flag"] == 1
    assert out["burst"]["b"] > 0.5 and out["burst"]["flag"] == 1
    # replica check for the jitter series
    gaps = [b - a for a, b in zip(jitter, jitter[1:])]
    n = len(gaps)
    mu = sum(gaps) / n
    sig = math.sqrt(sum(g * g for g in gaps) / n - mu * mu)
    assert out["human"]["b"] == round((sig - mu) / (sig + mu), 6)
    assert out["human"]["flag"] == 0


def test_burstiness_min_gaps_and_degenerate(spark):
    from osprey_spark.operators.dq import burstiness

    rows = [("few", 0), ("few", 10), ("few", 20)]  # 2 gaps < 5
    rows += [("zero", 0)] * 7                      # all-simultaneous: gaps 0
    out = {r["conv_id"]: r for r in burstiness(_bt_turns(spark, rows), key_col="conv_id").collect()}
    assert "few" not in out
    assert out["zero"]["b"] is None and out["zero"]["flag"] is None
    import pytest as _pt

    with _pt.raises(ValueError):
        burstiness(_bt_turns(spark, rows), key_col="conv_id", min_gaps=1)


def test_k_anonymity_histogram_and_violations(spark):
    from osprey_spark.operators.dq import k_anonymity

    rows = (
        [("a", "x")] * 7 + [("a", "y")] * 2 + [("b", "x")] * 1 + [("b", "y")] * 5
    )
    df = spark.createDataFrame(rows, "t string, r string")
    got = {r["class_size"]: r for r in k_anonymity(df, ["t", "r"], k=5).collect()}
    assert got[1]["n_classes"] == 1 and got[1]["violating"] == 1
    assert got[2]["n_classes"] == 1 and got[2]["violating"] == 1
    assert got[5]["n_classes"] == 1 and got[5]["violating"] == 0
    assert got[7]["n_rows"] == 7 and got[7]["violating"] == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        k_anonymity(df, ["t"], k=1)
    with _pt.raises(ValueError):
        k_anonymity(df, [], k=5)


def test_did_lift_known_answer(spark):
    """Hand cells: treated 10%->40%, control 10%->20% -> DiD = 0.2;
    z matches a python replica; empty-cell guard nulls everything."""
    from osprey_spark.operators.dq import did_lift

    import math

    rows = (
        [(1, 0, 1)] * 1 + [(1, 0, 0)] * 9      # treated pre: 10%
        + [(1, 1, 1)] * 4 + [(1, 1, 0)] * 6    # treated post: 40%
        + [(0, 0, 1)] * 1 + [(0, 0, 0)] * 9    # control pre: 10%
        + [(0, 1, 1)] * 2 + [(0, 1, 0)] * 8    # control post: 20%
    )
    df = spark.createDataFrame(rows, "g long, p long, m long")
    r = did_lift(df).collect()[0]
    assert (r["n_tp"], r["n_tq"], r["n_cp"], r["n_cq"]) == (10, 10, 10, 10)
    did = (0.4 - 0.1) - (0.2 - 0.1)
    assert r["did"] == round(did, 6)
    v = lambda mu: mu * (1 - mu) / 10  # noqa: E731
    se = math.sqrt(v(0.4) + v(0.1) + v(0.2) + v(0.1))
    assert r["z"] == round(did / se, 6)
    # empty treated-post cell -> all NULL
    df2 = spark.createDataFrame(
        [(1, 0, 1), (0, 0, 0), (0, 1, 1)], "g long, p long, m long"
    )
    r2 = did_lift(df2).collect()[0]
    assert r2["did"] is None and r2["z"] is None


def test_rolling_active_known_answer(spark):
    """Users u1 (days 0,1), u2 (day 0), u3 (day 8): dau per day and
    the 3-day rolling distinct include cross-day dedup (u1 counted
    once in a window covering both its days) and the span clip (no
    windows past the max observed day)."""
    import datetime as dt

    from osprey_spark.operators.dq import rolling_active

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        ("u1", 0), ("u1", 0), ("u1", 1),
        ("u2", 0),
        ("u3", 8),
    ]
    df = spark.createDataFrame(
        [(u, t0 + dt.timedelta(days=d)) for u, d in rows],
        "user_id string, ts timestamp",
    )
    out = {r["day"]: (r["dau"], r["rolling_active"]) for r in
           rolling_active(df, window_days=3).collect()}
    d0 = int(t0.timestamp()) // 86400
    assert out[d0] == (2, 2)            # u1, u2
    assert out[d0 + 1] == (1, 2)        # dau u1; window {u1,u2}
    assert out[d0 + 2] == (0, 2)        # no direct activity; window still covers day 0+1
    assert d0 + 3 in out and out[d0 + 3] == (0, 1)  # only u1's day-1 remains
    assert out[d0 + 8] == (1, 1)
    assert max(out) == d0 + 8           # clipped at max observed day
    import pytest as _pt

    with _pt.raises(ValueError):
        rolling_active(df, window_days=0)

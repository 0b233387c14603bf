"""Known-answer tests for the round-4 operator additions:
hypothesis tests (Mann-Whitney U, Spearman), CUSUM drift, the
compaction planner, SCD2 history, snapshot diff, association rules,
RFM segmentation, and funnel timing."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


# -------------------------------------------------------------------------
# Mann-Whitney
# -------------------------------------------------------------------------


def _mw_reference(a, b):
    """Textbook U with average ranks + tie-corrected normal z."""
    pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    n = len(pooled)
    ranks = {}
    i = 0
    vals = [v for v, _ in pooled]
    while i < n:
        j = i
        while j < n and vals[j] == vals[i]:
            j += 1
        avg = (i + 1 + j) / 2  # average of ranks i+1..j
        ranks[vals[i]] = avg
        i = j
    r_a = sum(ranks[v] for v in a)
    n_a, n_b = len(a), len(b)
    u_a = r_a - n_a * (n_a + 1) / 2
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(vals).values())
    var = n_a * n_b / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u_a - n_a * n_b / 2) / math.sqrt(var) if var > 0 else None
    return u_a, (round(z, 6) if z is not None else None)


def test_mann_whitney_matches_textbook(spark):
    from osprey_spark.operators.hypothesis import mann_whitney

    a = [3, 5, 5, 7, 9, 11, 11, 11]
    b = [1, 2, 5, 6, 6, 8]
    rows = [(v, "A") for v in a] + [(v, "B") for v in b] + [(99, "C")]
    df = spark.createDataFrame(rows, "v long, grp string")
    out = mann_whitney(df, "v", "grp", "A", "B").collect()[0]
    u_ref, z_ref = _mw_reference(a, b)
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    assert out["u_a"] == u_ref
    assert out["z"] == z_ref


def test_mann_whitney_no_variance_is_null(spark):
    from osprey_spark.operators.hypothesis import mann_whitney

    df = spark.createDataFrame(
        [(5, "A"), (5, "A"), (5, "B")], "v long, grp string"
    )
    out = mann_whitney(df, "v", "grp", "A", "B").collect()[0]
    assert out["z"] is None


# -------------------------------------------------------------------------
# Spearman
# -------------------------------------------------------------------------


def _spearman_reference(xs, ys):
    def avg_ranks(vals):
        s = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(s):
            j = i
            while j < len(s) and vals[s[j]] == vals[s[i]]:
                j += 1
            avg = (i + 1 + j) / 2
            for k in range(i, j):
                ranks[s[k]] = avg
            i = j
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    return round(num / den, 6)


def test_spearman_matches_textbook(spark):
    from osprey_spark.operators.hypothesis import spearman_corr

    xs = [1, 4, 4, 9, 16, 25, 2]
    ys = [2, 3, 5, 9, 10, 30, 3]
    df = spark.createDataFrame(
        [(f"k{i}", x, y) for i, (x, y) in enumerate(zip(xs, ys))],
        "k string, x long, y long",
    )
    out = spearman_corr(df, "x", "y", "k").collect()[0]
    assert out["n_keys"] == len(xs)
    assert out["rho"] == _spearman_reference(xs, ys)


def test_spearman_perfect_monotone(spark):
    from osprey_spark.operators.hypothesis import spearman_corr

    df = spark.createDataFrame(
        [(f"k{i}", i, i * i) for i in range(10)], "k string, x long, y long"
    )
    assert spearman_corr(df, "x", "y", "k").collect()[0]["rho"] == 1.0


# -------------------------------------------------------------------------
# CUSUM
# -------------------------------------------------------------------------


def test_cusum_drift_detects_sustained_shift(spark):
    from osprey_spark.operators.forecast import cusum_drift

    # 24 warmup hours at ~10/hr, then a +40% sustained drift
    base = [10, 11, 9, 10] * 6
    drift = [14] * 20
    rows = [(i, c) for i, c in enumerate(base + drift)]
    df = spark.createDataFrame(rows, "hour_ts long, cnt long")
    out = cusum_drift(df, warmup=24).collect()

    # sequential clamp-fold replica with the same quantization
    q = 10**6
    mu = sum(base) * q // 24
    k = mu * 10 // 100
    h = mu * 3
    s, alarms = 0, []
    for i, c in enumerate(base + drift):
        s = max(0, s + c * q - mu - k)
        if s > h:
            alarms.append((i, s))
    assert [(r["hour_ts"], r["cusum_q"]) for r in out] == alarms
    assert alarms, "the drift must actually alarm"
    # every alarm is in the drift region: no false alarm during warmup
    assert min(a[0] for a in alarms) >= 24


def test_cusum_no_drift_no_alarms(spark):
    from osprey_spark.operators.forecast import cusum_drift

    rows = [(i, 10 + (i % 3) - 1) for i in range(48)]
    df = spark.createDataFrame(rows, "hour_ts long, cnt long")
    assert cusum_drift(df, warmup=24).count() == 0


# -------------------------------------------------------------------------
# Compaction planner
# -------------------------------------------------------------------------


def test_compaction_plan_next_fit_known_answer(spark):
    from osprey_spark.operators.layout import compaction_plan

    rows = [
        ("d1", 1, 600), ("d1", 2, 600), ("d1", 3, 600),  # bins 0,1,1 @1000
        ("d2", 1, 100), ("d2", 2, 100), ("d2", 3, 100), ("d2", 4, 100),
    ]
    df = spark.createDataFrame(rows, "part string, file_id long, bytes long")
    out = {
        r["part"]: r
        for r in compaction_plan(df, target_bytes=1000).collect()
    }
    # d1: cum_before 0,600,1200 -> bins 0,0,1 -> 2 bins
    assert out["d1"]["n_bins"] == 2 and out["d1"]["n_files"] == 3
    assert out["d1"]["total_bytes"] == 1800
    assert out["d1"]["fill_pct"] == 0.9
    # d2: all 4 tiny files pack into one bin; all are "small"
    assert out["d2"]["n_bins"] == 1 and out["d2"]["small_files"] == 4
    assert out["d2"]["fill_pct"] == 0.4


# -------------------------------------------------------------------------
# SCD2 + snapshot diff
# -------------------------------------------------------------------------


def _changelog(spark):
    rows = [
        ("c1", 0, 0, "hello"),
        ("c1", 0, 1, "hello [edited]"),
        ("c1", 0, 2, "[redacted]"),
        ("c1", 1, 0, "stable"),
        ("c2", 0, 0, "orig"),
        ("c2", 0, 1, "orig [edited]"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, version int, text string"
    )


def test_scd2_history_validity_intervals(spark):
    from osprey_spark.operators.cdc import scd2_history

    out = {
        (r["conv_id"], r["turn_idx"], r["valid_from_version"]): r
        for r in scd2_history(_changelog(spark)).collect()
    }
    assert out[("c1", 0, 0)]["valid_to_version"] == 1
    assert out[("c1", 0, 1)]["valid_to_version"] == 2
    assert out[("c1", 0, 2)]["valid_to_version"] is None
    assert out[("c1", 0, 2)]["is_current"] is True
    assert out[("c1", 1, 0)]["is_current"] is True
    assert sum(1 for r in out.values() if r["is_current"]) == 3


def test_snapshot_diff_classifies_changes(spark):
    from osprey_spark.operators.cdc import snapshot_diff

    out = {
        r["change_type"]: r["n_keys"]
        for r in snapshot_diff(_changelog(spark), v_old=0, v_new=2).collect()
    }
    # c1/0 and c2/0 changed; c1/1 unchanged; nothing added/removed
    assert out == {"changed": 2, "unchanged": 1}


def test_snapshot_diff_null_payload_presence(spark):
    """A key present in BOTH snapshots with a NULL payload in one must
    classify on presence + null-safe payload compare (ADVICE r4):
    NULL->value is 'changed', NULL->NULL is 'unchanged', and only a
    genuinely absent key is 'added'/'removed'."""
    from osprey_spark.operators.cdc import snapshot_diff

    rows = [
        # k1: NULL payload at v0, real payload at v1 -> changed
        ("k1", 0, 0, None),
        ("k1", 0, 1, "filled"),
        # k2: NULL payload in both snapshots -> unchanged
        ("k2", 0, 0, None),
        # k3: only appears at v1 -> added
        ("k3", 0, 1, "new"),
        # k4: value at v0, NULL payload at v1 -> changed (not removed)
        ("k4", 0, 0, "old"),
        ("k4", 0, 1, None),
    ]
    log = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, version int, text string"
    )
    out = {
        r["change_type"]: r["n_keys"]
        for r in snapshot_diff(log, v_old=0, v_new=1).collect()
    }
    assert out == {"added": 1, "changed": 2, "unchanged": 1}


# -------------------------------------------------------------------------
# Association rules / RFM / funnel
# -------------------------------------------------------------------------


def test_assoc_rules_known_answer(spark):
    from osprey_spark.operators.journeys import assoc_rules

    rows = (
        [(u, "view") for u in (1, 2, 3, 4)]
        + [(u, "click") for u in (1, 2, 3)]
        + [(u, "purchase") for u in (1, 2)]
        + [(1, "click")]  # duplicate event — baskets are distinct
    )
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in assoc_rules(df, min_support=2).collect()
    }
    r = out[("click", "purchase")]
    assert r["support_users"] == 2
    assert r["confidence"] == round(2 / 3, 6)
    assert r["lift"] == round(4 * 2 / (3 * 2), 6)
    # view -> click: support 3, conf 3/4, lift 4*3/(4*3) = 1
    assert out[("view", "click")]["lift"] == 1.0


def test_rfm_segments_partitions_all_users(spark):
    from osprey_spark.operators.journeys import rfm_segments

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, t0 + dt.timedelta(days=u % 7, hours=k), float(u * 2 + k))
        for u in range(25)
        for k in range(1 + u % 4)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = rfm_segments(df).collect()
    assert sum(r["n_users"] for r in out) == 25
    for r in out:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 5


def test_funnel_timing_known_answer(spark):
    from osprey_spark.operators.journeys import funnel_timing

    t0 = dt.datetime(2024, 1, 1)

    def ev(u, typ, s):
        return (u, typ, t0 + dt.timedelta(seconds=s))

    rows = [
        ev(10, "click", 0), ev(10, "purchase", 100),      # cohort 0: 100 s
        ev(20, "click", 0), ev(20, "purchase", 300),      # cohort 0: 300 s
        ev(30, "click", 50), ev(30, "purchase", 40),      # purchase BEFORE click -> no conversion
        ev(11, "click", 0),                               # cohort 1: never converts
        ev(21, "click", 0), ev(21, "purchase", 60),       # cohort 1: 60 s
        ev(99, "view", 0),                                # never enters
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r["cohort"]: r for r in funnel_timing(df).collect()}
    assert out[0]["n_entered"] == 3 and out[0]["n_converted"] == 2
    assert out[0]["median_delta_s"] == 200.0  # two middle rows of [100, 300]
    assert out[1]["n_entered"] == 2 and out[1]["n_converted"] == 1
    assert out[1]["median_delta_s"] == 60.0
    assert 9 not in out  # user 99 entered nothing


# -------------------------------------------------------------------------
# wave 3: chi2, Kruskal-Wallis, harmonic centrality
# -------------------------------------------------------------------------


def test_chi2_independence_matches_textbook(spark):
    from osprey_spark.operators.hypothesis import chi2_independence

    # classic 2x2: strong association
    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 30
    )
    df = spark.createDataFrame(rows, "g string, h string")
    out = chi2_independence(df, "g", "h").collect()[0]
    # textbook replica
    import itertools

    from collections import Counter

    cnt = Counter(rows)
    ra = Counter(g for g, _ in rows)
    cb = Counter(h for _, h in rows)
    n = len(rows)
    chi = 0.0
    for (g, h), o in sorted(cnt.items()):
        import math
        contrib = (o * n - ra[g] * cb[h]) ** 2 / (n * ra[g] * cb[h])
        chi += math.floor(contrib * 1e9 + 0.5)
    chi /= 1e9
    assert out["n"] == n and out["dof"] == 1
    assert out["chi2"] == round(chi, 6)
    import math

    assert out["cramers_v"] == round(math.sqrt(chi / (n * 1)), 6)
    # independence -> chi2 == 0
    rows2 = [("a", "x")] * 10 + [("a", "y")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 10
    df2 = spark.createDataFrame(rows2, "g string, h string")
    assert chi2_independence(df2, "g", "h").collect()[0]["chi2"] == 0.0


def test_kruskal_wallis_matches_scipy_formula(spark):
    from osprey_spark.operators.hypothesis import kruskal_wallis

    groups = {
        "g1": [7, 7, 15, 11, 9],
        "g2": [12, 17, 12, 18, 18],
        "g3": [14, 18, 18, 19, 19],
    }
    rows = [(v, g) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "v long, g string")
    out = kruskal_wallis(df, "v", "g").collect()[0]
    assert out["n"] == 15 and out["k_groups"] == 3

    # replica with the same doubled-rank + floor-division arithmetic
    from collections import Counter

    vals = [v for v, _ in rows]
    t = Counter(vals)
    uniq = sorted(t)
    clt = {}
    run = 0
    for u in uniq:
        clt[u] = run
        run += t[u]
    r2 = {u: 2 * clt[u] + t[u] + 1 for u in uniq}
    n = len(vals)
    sq = 0
    for g, vs in groups.items():
        rg2 = sum(r2[v] for v in vs)
        sq += (rg2 * rg2) // len(vs)
    ties = sum(x**3 - x for x in t.values())
    h_raw = 3.0 * sq / (n * (n + 1.0)) - 3.0 * (n + 1.0)
    corr = 1.0 - ties / (float(n) ** 3 - n)
    assert out["h"] == round(h_raw / corr, 6)
    # sanity vs the published example value (~9.0 for this data)
    assert 8.0 < out["h"] < 10.5


def test_harmonic_centrality_star_center_wins(spark):
    from osprey_spark.operators.graph import harmonic_centrality_sample

    # star: hub h connected to l1..l5; seeds = two leaves
    pairs = [("h", f"l{i}") for i in range(1, 6)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src string, dst string"
    )
    seeds = spark.createDataFrame([("l1",), ("l2",)], "seed string")
    out = {
        r["node"]: (r["score_q"], r["seeds_reached"])
        for r in harmonic_centrality_sample(edges, seeds, k=4).collect()
    }
    # hub: distance 1 to both seeds -> 12+12; leaves l3..l5: distance 2
    # to both -> 6+6; seed leaves: 0 to self (excluded) + 2 to other -> 6
    assert out["h"] == (24, 2)
    assert out["l3"] == (12, 2)
    assert out["l1"] == (6, 1)


def test_brown_forsythe_matches_replica(spark):
    from osprey_spark.operators.hypothesis import brown_forsythe

    groups = {
        "tight": [10, 10, 11, 11, 10, 11, 10, 11],
        "wide": [2, 19, 5, 16, 1, 20, 4, 17],
        "mid": [7, 13, 8, 12, 9, 11, 8, 13],
    }
    rows = [(v, g) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "v long, g string")
    out = brown_forsythe(df, "v", "g").collect()[0]
    assert out["n"] == 24 and out["k_groups"] == 3

    # replica with the identical integer med2 / floor-division moments
    import statistics

    S = Q = SQG = N = 0
    for g, vs in groups.items():
        svs = sorted(vs)
        c = len(svs)
        med2 = svs[(c + 1) // 2 - 1] + svs[c // 2]
        ds = [abs(2 * v - med2) for v in vs]
        sg, qg = sum(ds), sum(d * d for d in ds)
        S += sg
        Q += qg
        SQG += (sg * sg) // len(vs)
        N += c
    k = len(groups)
    between = SQG - S * S / N
    within = Q - SQG
    f = (between / (k - 1)) / (within / (N - k))
    assert out["f_bf"] == round(f, 6)
    # the wide group drives a clearly significant F
    assert out["f_bf"] > 10


def test_brown_forsythe_equal_spread_small_f(spark):
    from osprey_spark.operators.hypothesis import brown_forsythe

    rows = [(v, g) for g in ("a", "b") for v in (1, 5, 9, 1, 5, 9)]
    df = spark.createDataFrame(rows, "v long, g string")
    out = brown_forsythe(df, "v", "g").collect()[0]
    assert out["f_bf"] == 0.0  # identical deviation profiles


# -------------------------------------------------------------------------
# wave 5: split leakage + dup-rate monitor
# -------------------------------------------------------------------------


def test_split_leakage_pair_explosion(spark):
    """The split-set → unordered-pair HOF emits exactly the C(k,2)
    pairs in sorted order, counted per pair."""
    from osprey_spark.operators.joins import hash_split

    # synthetic corpus: 3 groups of near-identical docs (same token
    # fingerprint) big enough that hash_split scatters them
    rows = []
    for g in range(30):
        for d in range(4):
            # same token SET per group (order varies, dups vary)
            toks = [f"w{g}", "alpha", "beta", "gamma"]
            if d % 2:
                toks = toks[::-1] + ["alpha"]
            rows.append((g * 10 + d, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    from pyspark.sql import functions as FF

    split = hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="doc_id", seed="r3"
    ).select("doc_id", "split")
    toks = FF.array_sort(
        FF.array_distinct(
            FF.filter(FF.split(FF.lower("text"), " "), lambda t: t != "")
        )
    )
    fps = docs.select(
        "doc_id", FF.md5(FF.array_join(toks, " ")).alias("fp")
    ).join(split, "doc_id")
    # python reference
    ref = {}
    for r in fps.collect():
        ref.setdefault(r["fp"], set()).add(r["split"])
    want = {}
    import itertools

    for splits in ref.values():
        for a, b in itertools.combinations(sorted(splits), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert want, "fixture must actually leak"

    import __spark_entry__  # noqa: F401  (q_split_leakage uses same plan)
    from osprey_spark.entrypoint import q_split_leakage  # noqa: F401

    # drive the pair-HOF directly through the same expressions
    per_fp = fps.groupBy("fp").agg(
        FF.array_sort(FF.collect_set("split")).alias("_splits")
    )
    pairs = (
        per_fp.filter(FF.size("_splits") >= 2)
        .select(
            FF.explode(
                FF.flatten(
                    FF.transform(
                        FF.sequence(FF.lit(0), FF.size("_splits") - 2),
                        lambda i: FF.transform(
                            FF.sequence(i + 1, FF.size("_splits") - 1),
                            lambda jj: FF.struct(
                                FF.element_at(FF.col("_splits"), i + 1).alias("a"),
                                FF.element_at(FF.col("_splits"), jj + 1).alias("b"),
                            ),
                        ),
                    )
                )
            ).alias("_p")
        )
        .select(FF.col("_p.a").alias("a"), FF.col("_p.b").alias("b"))
    )
    got = {
        (r["a"], r["b"]): r["n"]
        for r in pairs.groupBy("a", "b").agg(FF.count(FF.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_dup_rate_daily_known_answer(spark):
    import datetime as dt2

    from osprey_spark.operators.timeutil import epoch_long  # noqa: F401

    t0 = dt2.datetime(2024, 1, 1)
    rows = [
        ("a", t0),                                # day0 first
        ("b", t0),                                # day0 first
        ("a", t0 + dt2.timedelta(days=1)),        # day1 dup
        ("c", t0 + dt2.timedelta(days=1)),        # day1 first
        ("a", t0 + dt2.timedelta(days=2)),        # day2 dup
        ("b", t0 + dt2.timedelta(days=2)),        # day2 dup
        ("d", t0 + dt2.timedelta(days=2)),        # day2 first
    ]
    df = spark.createDataFrame(rows, "text string, ts timestamp")
    from pyspark.sql import functions as FF

    day = (epoch_long(FF.col("ts")) / 86400).cast("long")
    base = df.select(FF.md5("text").alias("fp"), day.alias("day"))
    first = base.groupBy("fp").agg(FF.min("day").cast("long").alias("_first"))
    out = (
        base.join(first, "fp")
        .groupBy("day")
        .agg(
            FF.count(FF.lit(1)).alias("n"),
            FF.sum((FF.col("day") > FF.col("_first")).cast("long")).alias("d"),
        )
        .orderBy("day")
        .collect()
    )
    got = [(r["n"], r["d"]) for r in out]
    assert got == [(2, 0), (2, 1), (3, 2)]

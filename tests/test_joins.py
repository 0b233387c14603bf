"""Unit tests for operators.joins: as-of join semantics (direction,
inclusivity, tolerance, left-join nulls), range-join strategy
equivalence, and hash_split determinism/proportions."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from osprey_spark.operators.joins import asof_join, hash_split, range_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture()
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [("A", _ts(5), 100.0), ("A", _ts(10), 101.0), ("B", _ts(3), 50.0)],
        "sym string, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(4), 99.5),
            ("A", _ts(5), 99.9),  # equal-ts: inclusive match
            ("A", _ts(8), 100.5),
            ("B", _ts(7), 49.0),  # after B's only trade
        ],
        "sym string, ts timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward_inclusive(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on=["sym"], right_cols=["bid"]).collect()
    by = {(r.sym, r.ts.minute): r for r in out}
    assert by[("A", 5)].r_bid == 99.9  # equal ts wins over minute-4
    assert by[("A", 10)].r_bid == 100.5
    assert by[("B", 3)].r_bid is None  # nothing at-or-before -> null
    assert len(out) == 3  # left cardinality preserved


def test_asof_forward(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(
        trades, quotes, on=["sym"], right_cols=["bid"], direction="forward"
    ).collect()
    by = {(r.sym, r.ts.minute): r for r in out}
    assert by[("A", 5)].r_bid == 99.9  # inclusive at equal ts
    assert by[("A", 10)].r_bid is None  # nothing at-or-after
    assert by[("B", 3)].r_bid == 49.0


def test_asof_tolerance(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(
        trades, quotes, on=["sym"], right_cols=["bid"], tolerance_s=60.0
    ).collect()
    by = {(r.sym, r.ts.minute): r for r in out}
    assert by[("A", 5)].r_bid == 99.9  # gap 0s
    assert by[("A", 10)].r_bid is None  # nearest is 2 min away > 60 s


def test_asof_prefix_collision_raises(spark, quotes_trades):
    trades, quotes = quotes_trades
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            trades,
            quotes.withColumnRenamed("bid", "price"),
            on=["sym"],
            right_cols=["price"],
            prefix="",
        )


def test_range_join_binned_equals_broadcast(spark):
    points = spark.range(0, 200).select((F.col("id") * 7 % 1000).alias("x"), "id")
    intervals = spark.createDataFrame(
        [(0, 100, "a"), (50, 400, "b"), (390, 391, "c"), (900, 2000, "d")],
        "lo long, hi long, tag string",
    )
    binned = {
        (r.id, r.tag)
        for r in range_join(points, intervals, "x", "lo", "hi", bin_width=64).collect()
    }
    bcast = {
        (r.id, r.tag)
        for r in range_join(
            points, intervals, "x", "lo", "hi", broadcast_intervals=True
        ).collect()
    }
    assert binned == bcast and len(binned) > 0
    # overlapping intervals produce one row per containing interval
    both = {t for (i, t) in binned if (i * 7 % 1000) == 70}
    assert both == {"a", "b"}


def test_range_join_keyed(spark):
    points = spark.createDataFrame(
        [("u1", 5), ("u1", 50), ("u2", 5)], "k string, x long"
    )
    intervals = spark.createDataFrame(
        [("u1", 0, 10, "w1"), ("u2", 0, 3, "w2")], "k string, lo long, hi long, tag string"
    )
    out = range_join(
        points, intervals, "x", "lo", "hi", on=["k"], bin_width=8
    ).collect()
    assert {(r.k, r.x, r.tag) for r in out} == {("u1", 5, "w1")}


def test_range_join_requires_strategy(spark):
    df = spark.range(1).select(F.col("id").alias("x"))
    iv = spark.range(1).select(F.col("id").alias("lo"), (F.col("id") + 1).alias("hi"))
    with pytest.raises(ValueError, match="bin_width"):
        range_join(df, iv, "x", "lo", "hi")


def test_hash_split_deterministic_and_proportional(spark):
    df = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(df, w, seed="s").groupBy("split").count().collect()
    b = hash_split(df, w, seed="s").groupBy("split").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    counts = {r.split: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.03
    # different seed -> different assignment of at least one row
    c = hash_split(df, w, seed="other")
    diff = (
        hash_split(df, w, seed="s")
        .alias("a")
        .join(c.alias("b"), "doc_id")
        .filter(F.col("a.split") != F.col("b.split"))
        .count()
    )
    assert diff > 0


def test_hash_split_rejects_bad_weights(spark):
    df = spark.range(1).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, {"train": 0.5, "val": 0.1})


def test_asof_join_single_exchange(spark, quotes_trades):
    """The whole point: no inequality join, ONE hash exchange on the
    key feeding one sort — SMJ-shaped cost, zero fan-out."""
    trades, quotes = quotes_trades
    plan = (
        asof_join(trades, quotes, on=["sym"], right_cols=["bid"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # union + window, not a join operator
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_ordering_enforced(spark):
    """A user who clicks BEFORE ever viewing does not count as
    view->click; equal timestamps are inclusive."""
    from osprey_spark.plans.analytics import funnel

    ev = spark.createDataFrame(
        [
            # u1: full ordered funnel
            (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
            # u2: click precedes view -> stops at view
            (2, "click", 1), (2, "view", 2),
            # u3: view + click same ts (inclusive), no purchase
            (3, "view", 5), (3, "click", 5),
            # u4: purchase only -> not even stage 0
            (4, "purchase", 9),
        ],
        "user_id long, event_type string, t long",
    ).withColumn("ts", F.col("t").cast("timestamp"))
    out = {
        r.stage: r.n_users
        for r in funnel(ev, "user_id", "event_type", "ts", ("view", "click", "purchase")).collect()
    }
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_group_percentiles_interpolation(spark):
    from osprey_spark.plans.analytics import group_percentiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in [10, 20, 30, 40]] + [("b", 7.0)],
        "g string, value double",
    )
    rows = {r.g: r for r in group_percentiles(df, "value", ["g"], (0.5, 0.9)).collect()}
    assert rows["a"].p50 == 25.0  # (20+30)/2 interpolated
    assert rows["a"].p90 == pytest.approx(37.0)  # idx 2.7 -> 30 + .7*10
    assert rows["b"].p50 == 7.0


def test_group_percentiles_approx_shape(spark):
    from osprey_spark.plans.analytics import group_percentiles

    df = spark.range(0, 1000).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").cast("double").alias("value")
    )
    rows = group_percentiles(df, "value", ["g"], (0.5,), exact=False).collect()
    assert {r.g for r in rows} == {"0", "1"}
    for r in rows:
        assert 400 <= r.p50 <= 600


def test_asof_null_timestamps_match_nothing(spark):
    """NULL-ts right rows never match (asc NULLS FIRST would otherwise
    leak their payload into matchless left rows); NULL-ts left rows
    match nothing in either direction."""
    left = spark.createDataFrame(
        [("A", _ts(5)), ("A", None)], "sym string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", None, 1.0), ("A", _ts(9), 2.0)], "sym string, ts timestamp, bid double"
    )
    back = {r.ts: r.r_bid for r in asof_join(left, right, on=["sym"], right_cols=["bid"]).collect()}
    assert back == {_ts(5): None, None: None}
    fwd = {
        r.ts: r.r_bid
        for r in asof_join(
            left, right, on=["sym"], right_cols=["bid"], direction="forward"
        ).collect()
    }
    assert fwd == {_ts(5): 2.0, None: None}


def test_hash_split_bucket_uniformity(spark):
    """The 32-bit md5 prefix keeps bucket frequencies uniform; the old
    16-bit prefix mod 10000 skewed buckets below 5536 by 7:6 and val
    (sorted last) lost ~8% relative mass."""
    df = spark.range(0, 40000).select(F.col("id").alias("doc_id"))
    counts = {
        r.split: r["count"]
        for r in hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, seed="u")
        .groupBy("split")
        .count()
        .collect()
    }
    assert abs(counts["val"] / 40000 - 0.1) < 0.008
    assert abs(counts["test"] / 40000 - 0.1) < 0.008


def test_salted_join_matches_plain_join(spark):
    """Salting must never change results: inner and left joins over a
    HOT key (one key = 80% of rows) are row-identical to plain joins."""
    from osprey_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(1, i) for i in range(80)] + [(2, 100), (3, 200), (9, 300)],
        "k long, v long",
    )
    right = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (4, "unused")], "k long, tag string"
    )
    for how in ("inner", "left"):
        got = sorted(
            (r.k, r.v, r.tag)
            for r in salted_join(left, right, "k", salts=4, how=how).collect()
        )
        want = sorted((r.k, r.v, r.tag) for r in left.join(right, "k", how).collect())
        assert got == want and len(got) > 0


def test_salted_join_spreads_hot_key(spark):
    """The hot key's left rows land in multiple salt buckets."""
    from osprey_spark.operators.joins import salted_join  # noqa: F401
    from pyspark.sql import functions as F

    left = spark.createDataFrame([(1, i) for i in range(200)], "k long, v long")
    salts = (
        left.withColumn(
            "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(4))
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts == 4


def test_stratified_split_exact_proportions(spark):
    """Per-stratum split sizes are exact to the ceil boundary, even
    for tiny and skewed strata; assignment is deterministic."""
    from osprey_spark.operators.joins import stratified_split_exact

    rows = [(i, "big") for i in range(1000)] + [(10_000 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = stratified_split_exact(df, w, strata_col="lang", seed="t")
    counts = {
        (r.lang, r.split): r["count"]
        for r in out.groupBy("lang", "split").count().collect()
    }
    assert counts[("big", "test")] == 100
    # cum boundaries: test ceil(1000*0.1)=100, train ceil(1000*(0.1+0.8))
    # — (0.1+0.8)*1000 rounds to exactly 900.0 in IEEE, so train=800
    assert counts[("big", "train")] == 800
    assert counts[("big", "val")] == 100
    assert sum(v for (l, s), v in counts.items() if l == "big") == 1000
    assert counts[("small", "test")] == 1
    assert sum(v for (l, s), v in counts.items() if l == "small") == 10
    # deterministic across invocations
    a = sorted(map(tuple, out.select("doc_id", "split").collect()))
    b = sorted(map(tuple, stratified_split_exact(df, w, strata_col="lang", seed="t").select("doc_id", "split").collect()))
    assert a == b


# --------------------------------------------------------------------------
# Markov removal-effect attribution
# --------------------------------------------------------------------------


def _ma_frame(spark, journeys):
    """journeys: list of (key, [state...]) with states in
    {'click','view','purchase'}."""
    rows = []
    for k, seq in journeys:
        for i, s in enumerate(seq):
            rows.append(
                (k, i, s if s != "purchase" else None, s == "purchase")
            )
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx long, touch string, is_conversion boolean"
    )


def test_markov_attribution_known_chain(spark):
    """3 journeys click->purchase, 1 journey view (no purchase):
    removing click kills ALL conversions (RE=1), removing view kills
    none (RE=0); shares split 1.0/0.0; p_conv = 3/4."""
    from osprey_spark.plans.analytics import markov_attribution

    js = [("a", ["click", "purchase"]), ("b", ["click", "purchase"]),
          ("c", ["click", "purchase"]), ("d", ["view"])]
    out = markov_attribution(_ma_frame(spark, js), ["click", "view"], rounds=8)
    got = {r["channel"]: r for r in out.collect()}
    assert got["click"]["p_conv"] == 0.75
    assert got["click"]["removal_effect"] == 1.0
    assert got["click"]["share"] == 1.0
    assert got["view"]["p_removed"] == 0.75
    assert got["view"]["removal_effect"] == 0.0
    assert got["view"]["share"] == 0.0


def test_markov_attribution_position_blind(spark):
    """view only ever appears on doomed journeys: first-touch would
    credit it, the removal effect does not."""
    from osprey_spark.plans.analytics import markov_attribution

    js = [
        ("a", ["view", "click"]),          # doomed
        ("b", ["view"]),                   # doomed
        ("c", ["click", "purchase"]),
        ("d", ["click", "purchase"]),
    ]
    out = markov_attribution(_ma_frame(spark, js), ["click", "view"], rounds=10)
    got = {r["channel"]: r for r in out.collect()}
    assert got["view"]["removal_effect"] <= got["click"]["removal_effect"]
    assert got["click"]["share"] > 0.5


def test_markov_attribution_multi_conversion_journeys(spark):
    """A purchase ends its journey; later touches open a new one —
    both journeys feed the chain."""
    from osprey_spark.plans.analytics import markov_attribution

    js = [("a", ["click", "purchase", "view", "purchase"])]
    out = markov_attribution(_ma_frame(spark, js), ["click", "view"], rounds=8)
    got = {r["channel"]: r for r in out.collect()}
    # both channels are on fully-converting paths: p_conv = 1
    assert got["click"]["p_conv"] == 1.0
    assert got["click"]["removal_effect"] == 0.5
    assert got["view"]["removal_effect"] == 0.5
    assert got["click"]["share"] == 0.5


def test_markov_attribution_validation(spark):
    from osprey_spark.plans.analytics import markov_attribution

    import pytest as _pt

    df = _ma_frame(spark, [("a", ["click"])])
    with _pt.raises(ValueError):
        markov_attribution(df, [], rounds=8)
    with _pt.raises(ValueError):
        markov_attribution(df, ["click"], rounds=0)



def test_curriculum_buckets_exact_quartiles(spark):
    from osprey_spark.operators.curation import curriculum_buckets

    docs = spark.createDataFrame(
        [(i, i) for i in range(1, 9)], "doc_id long, n_chars long"
    )
    got = {r.doc_id: r.bucket for r in curriculum_buckets(docs).collect()}
    # quantile_cont boundaries over 1..8: 2.75 / 4.5 / 6.25
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4}

    ties = spark.createDataFrame(
        [(i, 7) for i in range(5)], "doc_id long, n_chars long"
    )
    got = {r.doc_id: r.bucket for r in curriculum_buckets(ties).collect()}
    # equal scores always share a bucket (never split like ntile)
    assert set(got.values()) == {1}


def test_mad_outliers_robust_vs_stddev(spark):
    """The 100.0 burst is flagged; a MAD=0 degenerate group flags any
    deviation from the median; inliers emit nothing."""
    from osprey_spark.plans.analytics import mad_outliers

    rows = [
        (1, "a", 10.0), (2, "a", 11.0), (3, "a", 9.0), (4, "a", 10.5),
        (5, "a", 100.0),
        (6, "b", 5.0), (7, "b", 5.0), (8, "b", 5.0), (9, "b", 7.0),
        (10, "c", None),  # NULL values excluded entirely
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    out = {r.event_id: r for r in mad_outliers(df).collect()}
    assert set(out) == {5, 9}
    big = out[5]
    assert (big.med, big.mad) == (10.5, 0.5)
    assert big.modified_z == round(0.6745 * (100.0 - 10.5) / 0.5, 6)
    degenerate = out[9]
    assert degenerate.mad == 0.0 and degenerate.modified_z is None
    assert degenerate.is_outlier


def test_collocations_g2_known_answer(spark):
    """'new york' (always adjacent) must outrank an equally frequent
    pair whose parts also occur apart; the G² value matches a pure-
    Python contingency replay; min_count prunes rare pairs."""
    import math

    from osprey_spark.operators.curation import collocations

    # 6 docs of "new york", 6 docs where "big" and "apple" also appear
    # separated (diluting their association), 1 rare pair (pruned).
    rows = (
        [(i, "new york") for i in range(6)]
        + [(10 + i, "big apple") for i in range(6)]
        + [(20 + i, "big deal apple pie") for i in range(6)]
        + [(30, "rare pair")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocations(df, min_count=5, top_k=10)
    got = out.collect()
    out.unpersist_base()
    by_pair = {(r.w1, r.w2): r for r in got}

    assert ("rare", "pair") not in by_pair  # min_count=5 prunes count-1
    ny = by_pair[("new", "york")]
    ba = by_pair[("big", "apple")]
    assert ny.pair_count == 6 and ba.pair_count == 6

    def g2(k11, c1, c2, n):
        cells = [
            (k11, c1, c2),
            (c1 - k11, c1, n - c2),
            (c2 - k11, n - c1, c2),
            (n - c1 - c2 + k11, n - c1, n - c2),
        ]
        tot = 0.0
        for k, r, c in cells:
            if k > 0:
                tot += k * math.log(k / ((float(r) * float(c)) / float(n)))
        return round(2.0 * tot, 6)

    # bigram events: 6 (new,york) + 6 (big,apple) + 18 from the
    # 4-token docs ((big,deal),(deal,apple),(apple,pie)) + 1 rare = 31
    n = 31
    assert ny.g2 == g2(6, 6, 6, n)
    assert ba.g2 == g2(6, 12, 12, n)  # big starts 12 bigrams, apple ends 12
    # perfect association ranks strictly above the diluted pair
    assert ny.g2 > ba.g2
    # (apple, pie) is also a perfect count-6 pair -> ties (new, york)
    # and wins the deterministic (g2 desc, w1, w2) tie-break
    assert by_pair[("apple", "pie")].g2 == ny.g2
    assert (got[0].w1, got[0].w2) == ("apple", "pie")
    assert (got[1].w1, got[1].w2) == ("new", "york")

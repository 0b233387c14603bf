

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

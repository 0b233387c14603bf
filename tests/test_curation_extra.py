

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

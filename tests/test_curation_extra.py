

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


# --- logistic-regression GD trainer ------------------------------------------


def _logreg_python(rows, d, iterations=15, lr=0.5, feat_scale=100.0, quant=10**9):
    """Pure-Python replica of curation.logreg_train's quantized GD."""
    import math

    n = len(rows)
    w = [0.0] * (d + 1)
    for _ in range(iterations):
        sums = [0] * (d + 1)
        for r in rows:
            y, xs = r[0], r[1:]
            z = w[0]
            for j in range(d):
                z = z + w[j + 1] * (xs[j] / feat_scale)
            resid = 1.0 / (1.0 + math.exp(-z)) - y
            # Spark/DuckDB round() is half-away-from-zero, not half-even
            q0 = resid * quant
            sums[0] += int(math.floor(abs(q0) + 0.5)) * (1 if q0 >= 0 else -1)
            for j in range(d):
                qj = (resid * (xs[j] / feat_scale)) * quant
                sums[j + 1] += int(math.floor(abs(qj) + 0.5)) * (1 if qj >= 0 else -1)
        for j in range(d + 1):
            w[j] = w[j] - lr * (sums[j] / (n * float(quant)))
    return w


def test_logreg_learns_separable_threshold(spark):
    """y = 1 iff x0 is large: GD must drive the x0 weight positive and
    the trained model must classify every training row correctly."""
    from osprey_spark.operators.curation import logreg_train

    rows = [(1, 150, 10) if i % 2 == 0 else (0, 50, 10) for i in range(60)]
    feats = spark.createDataFrame(rows, "y int, big long, noise long")
    out = logreg_train(feats, ["big", "noise"], iterations=60, lr=2.0)
    w = {r.feature: r.weight for r in out.collect()}
    assert w["big"] > 0.1
    for y, x0, x1 in rows[:2]:
        z = w["intercept"] + w["big"] * (x0 / 100.0) + w["noise"] * (x1 / 100.0)
        assert (z > 0) == (y == 1)


def test_logreg_matches_python_replica(spark):
    """Quantized-integer gradient sums make the whole GD trajectory
    engine-exact: Spark == the pure-Python replica after round-6."""
    from osprey_spark.operators.curation import logreg_train

    rows = [
        (1, 120, 80, 3), (0, 40, 35, 0), (1, 200, 150, 7), (0, 55, 50, 1),
        (1, 90, 70, 2), (0, 30, 28, 0), (0, 60, 42, 5), (1, 180, 120, 6),
    ]
    feats = spark.createDataFrame(rows, "y int, a long, b long, c long")
    out = logreg_train(feats, ["a", "b", "c"], iterations=15, lr=0.5)
    got = {r.feature: r.weight for r in out.collect()}
    w = _logreg_python(rows, d=3, iterations=15, lr=0.5)
    expect = {"intercept": w[0], "a": w[1], "b": w[2], "c": w[3]}
    for k, v in expect.items():
        assert abs(got[k] - round(v, 6)) < 2e-6, (k, got[k], v)


def test_logreg_partition_order_independent(spark):
    """The BIGINT gradient sums are partition-order independent: 1
    partition and 13 partitions produce identical rounded weights."""
    from osprey_spark.operators.curation import logreg_train

    rows = [(i % 2, 30 + 7 * i, (3 * i) % 50) for i in range(40)]
    feats = spark.createDataFrame(rows, "y int, a long, b long")
    w1 = sorted(map(tuple, logreg_train(feats.coalesce(1), ["a", "b"]).collect()))
    w13 = sorted(map(tuple, logreg_train(feats.repartition(13), ["a", "b"]).collect()))
    assert w1 == w13


def test_logreg_validation(spark):
    import pytest

    from osprey_spark.operators.curation import logreg_train

    feats = spark.createDataFrame([(1, 5)], "y int, a long")
    with pytest.raises(ValueError, match="iterations"):
        logreg_train(feats, ["a"], iterations=0)
    with pytest.raises(ValueError, match="at least one feature"):
        logreg_train(feats, [])
    with pytest.raises(ValueError, match="empty"):
        logreg_train(feats.filter("y = 9"), ["a"])


# --- classifier evaluation (confusion + tie-credited AUC) ---------------------


def _scored(spark, rows):
    return spark.createDataFrame(rows, "y int, s double, pred int")


def test_classifier_eval_perfect_and_inverted_auc(spark):
    from osprey_spark.operators.curation import classifier_eval

    perfect = [(1, 0.9, 1), (1, 0.8, 1), (0, 0.2, 0), (0, 0.1, 0)]
    r = classifier_eval(_scored(spark, perfect)).collect()[0]
    assert (r.auc, r.accuracy, r.tp, r.tn, r.fp, r.fn) == (1.0, 1.0, 2, 2, 0, 0)
    inverted = [(0, 0.9, 1), (0, 0.8, 1), (1, 0.2, 0), (1, 0.1, 0)]
    r = classifier_eval(_scored(spark, inverted)).collect()[0]
    assert r.auc == 0.0 and r.accuracy == 0.0


def test_classifier_eval_tie_credit_and_known_answer(spark):
    """All-tied scores -> AUC exactly 0.5; a mixed set matches the
    hand-computed Mann-Whitney-with-ties value."""
    from osprey_spark.operators.curation import classifier_eval

    tied = [(1, 0.5, 1), (0, 0.5, 0)] * 5
    assert classifier_eval(_scored(spark, tied)).collect()[0].auc == 0.5
    # scores: pos at {0.9, 0.5}, neg at {0.5, 0.1}; ranks 1:0.1 2.5:0.5(x2) 4:0.9
    # sum pos ranks = 2.5 + 4 = 6.5 -> auc = (6.5 - 3) / (2*2) = 0.875
    mixed = [(1, 0.9, 1), (1, 0.5, 1), (0, 0.5, 0), (0, 0.1, 0)]
    assert classifier_eval(_scored(spark, mixed)).collect()[0].auc == 0.875


def test_classifier_eval_degenerate_single_class(spark):
    from osprey_spark.operators.curation import classifier_eval

    r = classifier_eval(_scored(spark, [(1, 0.3, 0), (1, 0.7, 1)])).collect()[0]
    assert r.auc is None and r.n_pos == 2 and r.n_neg == 0
    assert r.accuracy == 0.5


# --- calibration bins + ECE ---------------------------------------------------


def _probed(spark, rows):
    return spark.createDataFrame(rows, "y int, p double")


def test_calibration_known_answer(spark):
    """Two bins with hand-computed confidence/accuracy/ECE."""
    from osprey_spark.operators.curation import calibration_bins

    rows = [(1, 0.95), (1, 0.95), (0, 0.90), (1, 0.15), (0, 0.15)]
    out = calibration_bins(_probed(spark, rows), n_bins=10).collect()
    by_bin = {r.bin: r for r in out}
    assert set(by_bin) == {1, 9}
    b9 = by_bin[9]
    conf9 = (0.95 + 0.95 + 0.90) / 3
    assert (b9.n, b9.n_pos) == (3, 2)
    assert b9.confidence == round(conf9, 6)
    assert b9.accuracy == round(2 / 3, 6)
    b1 = by_bin[1]
    assert (b1.n, b1.n_pos, b1.confidence, b1.accuracy) == (2, 1, 0.15, 0.5)
    # ECE = (3*|2/3-conf9| + 2*|0.5-0.15|) / 5
    ece = (3 * abs(2 / 3 - conf9) + 2 * abs(0.5 - 0.15)) / 5
    assert abs(b9.ece - ece) < 1e-6 and b9.ece == b1.ece


def test_calibration_top_bin_caps_p_equal_one(spark):
    from osprey_spark.operators.curation import calibration_bins

    out = calibration_bins(_probed(spark, [(1, 1.0), (1, 0.999)]), n_bins=10).collect()
    assert [r.bin for r in out] == [9] and out[0].n == 2


def test_calibration_perfectly_calibrated_ece_zero(spark):
    from osprey_spark.operators.curation import calibration_bins

    # bin 5: p=0.55 x20, 11 positives -> acc 0.55 == conf
    rows = [(1, 0.55)] * 11 + [(0, 0.55)] * 9
    out = calibration_bins(_probed(spark, rows), n_bins=10).collect()
    assert len(out) == 1 and out[0].ece == 0.0 and out[0].gap == 0.0


def test_calibration_validation(spark):
    import pytest

    from osprey_spark.operators.curation import calibration_bins

    with pytest.raises(ValueError, match="n_bins"):
        calibration_bins(_probed(spark, [(1, 0.5)]), n_bins=0)


# --- Zipf power-law fit -------------------------------------------------------


def test_zipf_exact_power_law_slope(spark):
    """A corpus engineered so freq(rank r) = round(1000 * r^-1):
    slope ~ -1, r2 ~ 1."""
    import math

    from osprey_spark.operators.curation import zipf_fit

    words = [f"w{i}" for i in range(30)]
    docs = []
    for i, w in enumerate(words):
        freq = round(1000 / (i + 1))
        docs.extend([w] * freq)
    # pack into a few documents
    texts = [" ".join(docs[i::7]) for i in range(7)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    r = zipf_fit(df, top_n=30).collect()[0]
    assert r.n_types == 30
    assert abs(r.slope - (-1.0)) < 0.02
    assert r.r2 > 0.999
    assert abs(r.intercept - math.log(1000)) < 0.05


def test_zipf_uniform_corpus_flat_slope(spark):
    from osprey_spark.operators.curation import zipf_fit

    text = " ".join(f"tok{i}" for i in range(50) for _ in range(5))
    df = spark.createDataFrame([(text,)], "text string")
    r = zipf_fit(df, top_n=50).collect()[0]
    assert r.slope == 0.0 and r.r2 is None  # zero y-variance


def test_zipf_matches_python_ols(spark):
    import math

    from osprey_spark.operators.curation import zipf_fit

    freqs = [40, 22, 9, 9, 5, 3, 2, 2, 2, 1]
    text = " ".join(f"t{i}" for i, c in enumerate(freqs) for _ in range(c))
    df = spark.createDataFrame([(text,)], "text string")
    # replica with the same quantization
    pts = []
    order = sorted(range(len(freqs)), key=lambda i: (-freqs[i], f"t{i}"))
    for rank, i in enumerate(order, 1):
        pts.append((round(math.log(rank) * 1e6), round(math.log(freqs[i]) * 1e6)))
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts); syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    dx = n * sxx - sx * sx; dy = n * syy - sy * sy; cov = n * sxy - sx * sy
    r = zipf_fit(df, top_n=100).collect()[0]
    assert r.slope == round(cov / dx, 6)
    assert r.r2 == round((cov * cov) / (dx * dy), 6)
    import pytest as _pt

    with _pt.raises(ValueError, match="top_n"):
        zipf_fit(df, top_n=2)


# --- Good-Turing / Chao1 vocabulary coverage ----------------------------------


def test_vocab_coverage_known_answer(spark):
    from osprey_spark.operators.curation import vocab_coverage

    # tokens: a x4, b x2, c x1, d x1 -> N=8 V=4 n1=2 n2=1
    df = spark.createDataFrame([("a a b c", ), ("a a b d",)], "text string")
    r = vocab_coverage(df).collect()[0]
    assert (r.n_tokens, r.vocab_size, r.singletons, r.doubletons) == (8, 4, 2, 1)
    assert r.unseen_mass == 0.25
    assert r.chao1 == round(4 + (2 * 1) / (2 * 2), 6)  # 4.5


def test_vocab_coverage_template_vs_organic(spark):
    """A template corpus (every doc identical) has zero singletons
    and unseen_mass 0; an all-distinct corpus has unseen_mass 1."""
    from osprey_spark.operators.curation import vocab_coverage

    template = spark.createDataFrame([("buy now cheap",)] * 20, "text string")
    r = vocab_coverage(template).collect()[0]
    assert r.singletons == 0 and r.unseen_mass == 0.0 and r.chao1 == 3.0
    organic = spark.createDataFrame(
        [(f"tok{i} tok{i + 100}",) for i in range(10)], "text string"
    )
    r = vocab_coverage(organic).collect()[0]
    assert r.unseen_mass == 1.0 and r.doubletons == 0
    # bias-corrected chao1 stays defined with n2=0
    assert r.chao1 == round(20 + 20 * 19 / 2, 6)


# --- multi-touch attribution --------------------------------------------------


def _journey(spark, rows):
    """rows: (conv, idx, touch_or_None, is_conv)"""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, touch string, is_conversion boolean"
    )


def test_attribution_three_models_known_answer(spark):
    from osprey_spark.plans.analytics import attribution

    rows = [
        ("c1", 0, "click", False),
        ("c1", 1, "view", False),
        ("c1", 2, "view", False),
        ("c1", 3, None, True),      # conv: first=click last=view lin: click 1/3, view 2/3
        ("c2", 0, "view", False),
        ("c2", 1, None, True),      # conv: first=last=view, lin view 1.0
        ("c3", 0, None, True),      # conversion with NO touch: no credit
    ]
    out = attribution(_journey(spark, rows), ["click", "view"]).collect()
    got = {(r.model, r.touch): r.credit for r in out}
    assert got[("first_touch", "click")] == 1.0
    assert got[("first_touch", "view")] == 1.0
    assert got[("last_touch", "view")] == 2.0
    assert ("last_touch", "click") not in got
    assert got[("linear", "click")] == round(1 / 3, 6)
    assert abs(got[("linear", "view")] - (2 / 3 + 1.0)) < 2e-6


def test_attribution_multiple_conversions_same_conv(spark):
    from osprey_spark.plans.analytics import attribution

    rows = [
        ("c1", 0, "click", False),
        ("c1", 1, None, True),      # first conv: click only
        ("c1", 2, "view", False),
        ("c1", 3, None, True),      # second conv: lookback sees click+view
    ]
    out = attribution(_journey(spark, rows), ["click", "view"]).collect()
    got = {(r.model, r.touch): r.credit for r in out}
    assert got[("first_touch", "click")] == 2.0  # click is first both times
    assert got[("last_touch", "click")] == 1.0
    assert got[("last_touch", "view")] == 1.0
    assert got[("linear", "click")] == 1.5
    assert got[("linear", "view")] == 0.5


def test_attribution_validation(spark):
    import pytest

    from osprey_spark.plans.analytics import attribution

    with pytest.raises(ValueError, match="touch type"):
        attribution(_journey(spark, [("c", 0, None, True)]), [])


# --------------------------------------------------------------------------
# readability (Flesch / FK)
# --------------------------------------------------------------------------


def test_readability_known_answer(spark):
    """'the cat sat on the mat.' — 6 words, 1 sentence, 6 syllables
    (every word one vowel run) → flesch = 206.835 − 1.015·6 − 84.6·1."""
    from osprey_spark.operators.curation import readability

    df = spark.createDataFrame(
        [("d1", "the cat sat on the mat.")], "doc_id string, text string"
    )
    r = readability(df).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 1, 6)
    assert r["flesch"] == round(206.835 - 1.015 * 6.0 - 84.6 * 1.0, 6)
    assert r["fk_grade"] == round(0.39 * 6.0 + 11.8 * 1.0 - 15.59, 6)


def test_readability_syllable_and_sentence_conventions(spark):
    """Vowel-less tokens floor at 1 syllable; '...' counts as ONE
    sentence run; multisyllable words count vowel groups
    ('beautiful' → eau+i+u = 3)."""
    from osprey_spark.operators.curation import readability

    df = spark.createDataFrame(
        [
            ("a", "hmm 123 beautiful... ok?! done"),
            ("b", ""),
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in readability(df).collect()}
    a = got["a"]
    # words: hmm(1) 123(1) beautiful...(3) ok?!(1) done(2: o,e) = 8
    assert a["n_words"] == 5
    assert a["n_syllables"] == 1 + 1 + 3 + 1 + 2
    assert a["n_sentences"] == 2  # '...' and '?!'
    b = got["b"]
    assert b["n_words"] == 0 and b["flesch"] is None and b["fk_grade"] is None


# --------------------------------------------------------------------------
# distinctive terms (weighted log-odds)
# --------------------------------------------------------------------------


def _dt_turns(spark, rows):
    return spark.createDataFrame(rows, "role string, text string")


def _logodds_python(y_a, y_b, na, nb, a0=100.0):
    import math

    n = float(na + nb)
    aw = float(y_a + y_b) * a0 / n
    la = math.log((y_a + aw) / (na + a0 - y_a - aw))
    lb = math.log((y_b + aw) / (nb + a0 - y_b - aw))
    delta = la - lb
    var = 1.0 / (y_a + aw) + 1.0 / (y_b + aw)
    return round(delta, 6), round(delta / math.sqrt(var), 6)


def test_distinctive_terms_skewed_word_scores_high(spark):
    """'please' dominated by user side, 'certainly' by assistant;
    shared filler is near zero. z values match a python replica."""
    from osprey_spark.operators.curation import distinctive_terms

    rows = (
        [("user", "please please help now")] * 10
        + [("assistant", "certainly certainly here now")] * 10
    )
    out = distinctive_terms(
        _dt_turns(spark, rows), min_count=5, k=3
    ).collect()
    by_side = {}
    for r in out:
        by_side.setdefault(r["side"], []).append(r)
    # counts: user words: please=20, help=10, now=10; asst: certainly=20, here=10, now=10
    na, nb = 40, 40
    assert by_side["a"][0]["term"] == "please"
    d, z = _logodds_python(20, 0, na, nb)
    assert (by_side["a"][0]["delta"], by_side["a"][0]["z"]) == (d, z)
    assert by_side["b"][0]["term"] == "certainly"
    d2, z2 = _logodds_python(0, 20, na, nb)
    assert (by_side["b"][0]["delta"], by_side["b"][0]["z"]) == (d2, z2)
    # the shared word ranks with |z| below both champions
    shared = [r for r in out if r["term"] == "now"]
    for s in shared:
        assert abs(s["z"]) < abs(z)


def test_distinctive_terms_min_count_and_validation(spark):
    from osprey_spark.operators.curation import distinctive_terms

    rows = [("user", "rare word word word word"), ("assistant", "word word")]
    out = distinctive_terms(_dt_turns(spark, rows), min_count=2, k=10).collect()
    assert all(r["term"] != "rare" for r in out)
    import pytest as _pt

    with _pt.raises(ValueError):
        distinctive_terms(_dt_turns(spark, rows), a0=0)
    with _pt.raises(ValueError):
        distinctive_terms(_dt_turns(spark, rows), k=0)


# --------------------------------------------------------------------------
# Heaps'-law vocabulary growth
# --------------------------------------------------------------------------


def test_heaps_fit_template_corpus_saturates(spark):
    """All-identical docs: vocabulary stops growing after the first
    bucket -> beta near 0. Distinct-vocab docs: every doc brings new
    types -> beta near 1. The fits bracket accordingly."""
    from osprey_spark.operators.curation import heaps_fit

    same = spark.createDataFrame(
        [(f"d{i}", "alpha beta gamma") for i in range(60)],
        "doc_id string, text string",
    )
    r_same = heaps_fit(same, n_buckets=8).collect()[0]
    assert r_same["vocab"] == 3
    assert r_same["beta"] is not None and r_same["beta"] < 0.1

    fresh = spark.createDataFrame(
        [(f"d{i}", f"tok{i}a tok{i}b tok{i}c") for i in range(60)],
        "doc_id string, text string",
    )
    r_fresh = heaps_fit(fresh, n_buckets=8).collect()[0]
    assert r_fresh["vocab"] == 180
    assert r_fresh["beta"] > 0.9
    assert r_fresh["r2"] > 0.99


def test_heaps_fit_matches_python_replica(spark):
    """Exact beta agreement with a replica of the bucketed curve +
    quantized OLS."""
    import hashlib
    import math

    from osprey_spark.operators.curation import heaps_fit

    docs = [(f"doc{i}", " ".join(f"w{(i * j) % 37}" for j in range(5))) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = heaps_fit(df, n_buckets=8).collect()[0]

    B = 8
    buck = {
        d: int(hashlib.md5(d.encode()).hexdigest()[:8], 16) % B for d, _ in docs
    }
    dn = [0] * B
    first = {}
    for d, t in docs:
        dn[buck[d]] += 1
        for w in t.split(" "):
            if w:
                first[w] = min(first.get(w, B), buck[d])
    vn = [0] * B
    for w, b in first.items():
        vn[b] += 1
    pts = []
    dc = vc = 0
    for b in range(B):
        dc += dn[b]
        vc += vn[b]
        if dc >= 1 and vc >= 1:
            x = round(math.log(dc) * 1e6)
            y = round(math.log(vc) * 1e6)
            pts.append((x, y))
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts); sxy = sum(x * y for x, y in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert got["n_checkpoints"] == n
    assert got["beta"] == round(beta, 6)

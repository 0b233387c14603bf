"""Corpus-curation operators: decontamination, PII scrub, repetition
signals — known-answer fixtures (the driver oracle covers the
testdata-scale replay; these pin the semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osprey_spark.operators import curation


def test_decontaminate_flags_shared_shingles(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),     # shares 5-gram with bench
            (2, "one two three four five six seven"),       # clean
            (3, "x alpha beta gamma delta epsilon y"),      # shares (shifted)
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = {r.doc_id: r.n_hit_shingles for r in curation.decontaminate(docs, bench).collect()}
    assert out == {1: 1, 3: 1}
    # plan shape: benchmark side broadcast (no sort-merge on the eval set)
    plan = curation.decontaminate(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com or alice@corp.io now"),
            (2, "server at 10.0.0.1 responded"),
            (3, "call +1 (555) 123-4567 today"),
            (4, "nothing sensitive here"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in curation.pii_scrub(df).collect()}
    assert rows[1].scrubbed == "mail <EMAIL> or <EMAIL> now"
    assert rows[1].n_email == 2 and rows[1].n_ipv4 == 0
    assert rows[2].scrubbed == "server at <IP> responded"
    assert rows[2].n_ipv4 == 1
    assert rows[3].scrubbed == "call <PHONE> today"
    assert rows[3].n_phone == 1
    assert rows[4].scrubbed == "nothing sensitive here"
    assert rows[5].scrubbed is None and rows[5].n_email is None  # NULL passthrough


def test_curate_pipeline_stages_and_plan(spark):
    """The composed pass: fingerprint dup dropped, repetitive doc
    dropped, contaminated doc dropped, survivor scrubbed; plan stays
    equi/broadcast joins only."""
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "theta eta zeta epsilon delta gamma beta alpha"),   # fingerprint dup of 1
            (3, "spam spam spam spam spam spam spam ham"),          # repetitive
            (4, "one two three four five six seven eight mail bob@x.io"),
            (5, "leak leak0 the secret bench phrase is here now"),  # contaminated
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the secret bench phrase is here")], "doc_id long, text string"
    )
    out = curation.curate(corpus, bench)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 4}
    assert rows[4].scrubbed.endswith("mail <EMAIL>")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    out.unpersist_base()  # release the survivors cache (session-scoped fixture)


def test_scrub_pii_udf_in_ruleset(spark):
    """ScrubPii/CountPii ride the SML surface: a rule can gate on PII
    presence and extract the scrubbed text."""
    from osprey_spark.compiler import compile_ruleset

    sml = """
T: str = JsonData(path='$.t')
Clean = ScrubPii(s=T)
NumEmails = CountPii(s=T, category='email')
HasPii = NumEmails > 0
"""
    rs = compile_ruleset({"main.sml": sml})
    df = spark.createDataFrame(
        [(1, "x", '{"t": "ping bob@x.io"}', "2024-01-01 00:00:00")],
        "action_id long, action_name string, data string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = rs.apply(df).collect()[0]
    assert row["Clean"] == "ping <EMAIL>"
    assert row["NumEmails"] == 1 and row["HasPii"] is True

    import pytest as _pytest

    from osprey_spark.sml.errors import SmlError

    with _pytest.raises(SmlError, match="category"):
        compile_ruleset(
            {"main.sml": "T: str = JsonData(path='$.t')\nN = CountPii(s=T, category='ssn')\n"}
        )


def test_repetition_signals_known_answers(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),              # max repetition
            (2, "all words here are unique"),        # none
            (3, "ab cd ab cd ab"),                   # bigram 'ab cd' x2 of 4
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in curation.repetition_signals(df).collect()}
    assert rows[1].top_unigram_frac == 1.0
    assert rows[1].top_bigram_frac == 1.0
    assert rows[1].distinct_token_ratio == 0.25
    assert rows[2].top_unigram_frac == 0.2
    assert rows[2].distinct_token_ratio == 1.0
    assert rows[3].top_unigram_frac == 0.6        # 'ab' 3 of 5
    assert rows[3].top_bigram_frac == 0.5         # 'ab cd' 2 of 4


def test_gopher_quality_known_answers(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and that dog did have fun with it"),
            (2, "hi there"),                       # too few words
            (3, "- one\n- two\n- three\n- four"),  # all bullet lines, no stopwords
            (4, "the ### cat ### and ### hat ### that"),  # symbol-heavy
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in curation.gopher_quality(docs).collect()}
    assert rows[1].passes and rows[1].stopword_hits >= 2
    assert not rows[2].passes and rows[2].n_words == 2
    assert not rows[3].passes and rows[3].bullet_line_frac == 1.0
    assert not rows[4].passes and rows[4].symbol_word_ratio > 0.1
    # pure per-row projection: no exchange anywhere in the plan
    plan = (
        curation.gopher_quality(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan


def test_decontaminate_bloom_matches_exact_decontaminate(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),
            (2, "one two three four five six seven eight"),
            (3, "pre alpha beta gamma delta epsilon post"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    exact = {
        r.doc_id: r.n_hit_shingles
        for r in curation.decontaminate(docs, bench).collect()
    }
    bloom = {
        r.doc_id: r
        for r in curation.decontaminate_bloom(docs, bench).collect()
    }
    # verified hits identical to the direct shingle join; candidates are a
    # false-positive-bounded superset of the true hits
    assert {k: v.n_hit_shingles for k, v in bloom.items() if v.n_hit_shingles} == exact
    for r in bloom.values():
        assert r.n_candidate_shingles >= r.n_hit_shingles
    plan = (
        curation.decontaminate_bloom(docs, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


def test_dsir_importance_weights_orders_target_like_docs(spark):
    """DSIR sanity: documents made of target-distribution tokens must
    score a strictly higher log-weight than documents made of
    raw-only tokens; a mixed doc lands between. Also: the only joins
    are broadcasts of constant-size histograms (no cartesian over
    docs)."""
    from pyspark.sql import functions as F
    from osprey_spark.operators.curation import importance_weights

    rows = []
    # target corpus: 20 docs of "alpha beta gamma", flagged lang='t'
    for i in range(20):
        rows.append((i, "alpha beta gamma alpha beta", "t"))
    # raw-only noise: 20 docs of disjoint vocabulary
    for i in range(20, 40):
        rows.append((i, "zeta omega kappa zeta omega", "r"))
    # probes: one target-looking, one raw-looking, one mixed
    rows += [(100, "alpha beta gamma", "r"),
             (101, "zeta omega kappa", "r"),
             (102, "alpha beta kappa", "r")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = importance_weights(docs, target_pred=(F.col("lang") == "t"), n_buckets=64)
    w = {r.doc_id: r.log_weight for r in out.collect()}
    assert w[100] > w[102] > w[101]
    # token counts survive the fold
    n = {r.doc_id: r.n_tokens for r in out.collect()}
    assert n[100] == 3 and n[101] == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_winsorized_quality_z_clamps_and_normalizes(spark):
    """Winsorize sanity on a constructed corpus: the clamp band is per
    group, outliers land exactly on the band edge, and z has mean ~0
    within each group."""
    from osprey_spark.operators.curation import winsorized_quality_z

    # two "languages" with different quality regimes (text length
    # drives the len_term of the heuristic score)
    rows = []
    for i in range(40):
        rows.append((i, "alpha beta gamma delta " * (2 + i % 5), "aa"))
    for i in range(40, 80):
        rows.append((i, "zz " * (1 + i % 3), "bb"))
    # one extreme outlier per group: must be clamped to the p95 edge
    rows.append((900, "alpha beta gamma delta " * 60, "aa"))
    rows.append((901, "quick brown foxes jumped " * 40, "bb"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = winsorized_quality_z(docs).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        qs = sorted(r.q_winsor for r in rs)
        # clamped values stay within the observed band and z-means ~0
        assert min(qs) >= min(r.quality for r in rs)
        assert max(qs) <= max(r.quality for r in rs)
        zs = [r.z for r in rs if r.z is not None]
        assert zs and abs(sum(zs) / len(zs)) < 0.05
    # winsorization actually clamps something in the spread-out group
    assert any(r.q_winsor != r.quality for r in out)


def test_lm_nll_bigram_model_known_answer(spark):
    """Hand-checked add-one bigram model: vocab from target rows only,
    <unk> mapping, docs without bigrams drop."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "en", "a b a b"),
            (2, "en", "a b"),
            (3, "fr", "c"),          # 1 token -> no bigrams -> dropped
            (4, "fr", "a b x"),      # x is OOV -> <unk>
        ],
        "doc_id long, lang string, text string",
    )
    out = {
        r.doc_id: r
        for r in curation.lm_nll(docs, target_pred=(F.col("lang") == "en")).collect()
    }
    # target tokens: a:3 b:3 -> vocab {a, b}, V = 3
    # bigram counts (target): (a,b)=3 (b,a)=1; unigram: a=3 b=3
    p_ab, p_ba, p_bu = 4 / 6, 2 / 6, 1 / 6
    assert set(out) == {1, 2, 4}
    assert out[1].n_bigrams == 3
    assert out[1].nll == round(-(2 * math.log(p_ab) + math.log(p_ba)) / 3, 6)
    assert out[2].n_bigrams == 1
    assert out[2].nll == round(-math.log(p_ab), 6)
    assert out[4].n_bigrams == 2
    assert out[4].nll == round(-(math.log(p_ab) + math.log(p_bu)) / 2, 6)


def test_bpe_merges_sennrich_corpus(spark):
    """The classic BPE walkthrough corpus (Sennrich et al. 2016):
    es -> est, lo -> low, and newest's ewest assemble in frequency
    order with lexicographic tie-breaks."""
    docs = spark.createDataFrame(
        [(1, ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).strip())],
        "doc_id long, text string",
    )
    out = curation.bpe_merges(docs, rounds=6)
    got = [(r.round, r.p1, r.p2, r.merged, r.pair_count) for r in out.collect()]
    out.unpersist_base()
    assert got == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
        (4, "lo", "w", "low", 7),
        (5, "e", "w", "ew", 6),
        (6, "ew", "est", "ewest", 6),
    ]


def test_bpe_merge_fold_greedy_left_to_right(spark):
    """Consecutive occurrences of the winning pair merge greedily and
    non-overlapping ('a a a a' with pair (a,a) -> 'aa aa', and the
    merged symbol never re-matches as its own left half)."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa bb bb")], "doc_id long, text string"
    )
    out = curation.bpe_merges(docs, rounds=2)
    got = [(r.round, r.p1, r.p2, r.pair_count) for r in out.collect()]
    out.unpersist_base()
    # round 1: (a,a) count 9 (3 per word, greedy pairs); round 2:
    # each word is now 'aa aa' -> (aa,aa) count 3, beating (b,b) 2
    assert got == [(1, "a", "a", 9), (2, "aa", "aa", 3)]


def test_bpe_encode_token_counts(spark):
    """Encoding with learned merges: 'low' (fully merged after 4
    rounds) counts as ONE BPE token; unseen-structure words stay
    character-split except where merges apply."""
    docs = spark.createDataFrame(
        [
            (1, ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).strip()),
            (2, "low low"),
        ],
        "doc_id long, text string",
    )
    out = curation.bpe_encode(docs, rounds=6)
    rows = {r.doc_id: r for r in out.collect()}
    out.unpersist_base()
    # after 6 rounds: low=1 sym, lower=low+e+r=3, newest=n+ewest=2,
    # widest=w+i+d+est=4
    assert rows[2].n_bpe_tokens == 2
    assert rows[2].n_chars == 6
    assert rows[2].chars_per_token == 3.0
    assert rows[1].n_bpe_tokens == 5 * 1 + 2 * 3 + 6 * 2 + 3 * 4


def test_nb_classifier_known_answer(spark):
    """Hand-checked add-one multinomial NB: vocab from the union of
    both training classes, <unk> weight 0, prior ln(da/db), pred from
    the rounded score."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "src0", "good good fine"),
            (2, "src1", "bad bad fine"),
            (3, "src2", "good bad zzz"),  # score-only; zzz -> <unk>
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r.doc_id: r
        for r in curation.nb_classifier(
            docs,
            class_a_pred=(F.col("source") == "src0"),
            class_b_pred=(F.col("source") == "src1"),
        ).collect()
    }
    # vocab {good, bad, fine} (each seen 2x in training), V=4, Na=Nb=3
    # l(good)=ln((2+1)/(0+1))=ln 3, l(bad)=ln(1/3), l(fine)=0, l(<unk>)=0
    # prior = ln(1/1) = 0
    assert set(out) == {1, 2, 3}
    assert out[1].n_tokens == 3
    assert out[1].log_odds == round(2 * math.log(3.0), 6)
    assert out[1].pred_a is True
    assert out[2].log_odds == round(2 * math.log(1 / 3), 6)
    assert out[2].pred_a is False
    assert out[3].log_odds == 0.0
    assert out[3].pred_a is False


def test_scrub_duplicate_spans_removes_shared_span_only(spark):
    """Lee et al. §4 removal semantics: the 8-token span shared by two
    docs is cut from BOTH; unique surroundings survive; a doc shorter
    than k passes through untouched."""
    from osprey_spark.operators.dedup import scrub_duplicate_spans

    span = "the quick brown fox jumps over the lazy"  # 8 tokens
    rows = [
        (1, f"intro one {span} outro alpha"),
        (2, f"different lead {span} tail beta gamma"),
        (3, "totally unique text with no duplication at all here"),
        (4, "short doc"),  # n < k: untouched
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in scrub_duplicate_spans(docs, k=8).collect()
    }
    # the shared span (8 tokens) is gone from both docs
    for d in (1, 2):
        assert "quick" not in out[d]["scrubbed_text"]
        assert out[d]["kept_tokens"] == out[d]["n_tokens"] - 8
    assert out[1]["scrubbed_text"] == "intro one outro alpha"
    assert out[2]["scrubbed_text"] == "different lead tail beta gamma"
    # unique doc intact
    assert out[3]["kept_tokens"] == out[3]["n_tokens"]
    # short doc untouched
    assert out[4]["scrubbed_text"] == "short doc"


def test_unigram_encode_known_answer(spark):
    """Hand-checkable corpus: vocab = top-6 substrings of
    {hello x3, help x2, lolo x5}; Viterbi picks h+el+lo for 'hello'
    (3 pieces), lo+lo for 'lolo' (2), h+el+p for 'help' (3 — p falls
    back to a single char outside the vocab)."""
    from osprey_spark.operators.curation import unigram_encode

    rows = (
        [(f"a{i}", "hello") for i in range(3)]
        + [(f"b{i}", "help") for i in range(2)]
        + [(f"c{i}", "lolo") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {
        r.doc_id: (r.n_unigram_tokens, r.n_chars)
        for r in unigram_encode(df, vocab_size=6).collect()
    }
    assert out["a0"] == (3, 5)
    assert out["b0"] == (3, 4)
    assert out["c0"] == (2, 4)


def test_unigram_encode_bounds(spark):
    """Piece count per word is between 1 and the word length (single
    chars always admissible), so per doc: n_words <= tokens <= chars."""
    from osprey_spark.operators.curation import unigram_encode
    from osprey_spark.functions.text import tokenize_col
    from pyspark.sql import functions as F

    rows = [(f"d{i}", f"some variably worded document number {i} {i*i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    enc = unigram_encode(df).collect()
    words = {
        r.doc_id: r.nw
        for r in df.select(
            "doc_id", F.size(tokenize_col(F.col("text"))).alias("nw")
        ).collect()
    }
    for r in enc:
        assert words[r.doc_id] <= r.n_unigram_tokens <= r.n_chars


def test_span_corruption_known_answer(spark):
    from osprey_spark.operators.curation import span_corruption

    # 12 tokens, block=6, span=2: two blocks, each masks a 2-token run
    toks = [f"t{i}" for i in range(12)]
    docs = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    row = span_corruption(docs, block=6, span_len=2).collect()[0]
    assert row.n_tokens == 12 and row.n_masked == 4

    # recompute the seeded offsets exactly as the operator does
    import hashlib

    def s_of(b):
        h = int(hashlib.md5(f"1:{b}".encode()).hexdigest()[:8], 16)
        return h % (6 - 2 + 1)

    s0, s1 = s_of(0), s_of(1)
    expect_corrupted = []
    for p in range(12):
        b, off = divmod(p, 6)
        s = (s0, s1)[b]
        if off == s:
            expect_corrupted.append(f"<X_{b}>")
        elif not (s < off < s + 2):
            expect_corrupted.append(toks[p])
    assert row.corrupted == " ".join(expect_corrupted)
    assert row.target == (
        f"<X_0> {toks[s0]} {toks[s0+1]} <X_1> {toks[6+s1]} {toks[6+s1+1]}"
    )


def test_span_corruption_short_tail_block(spark):
    from osprey_spark.operators.curation import span_corruption

    # 7 tokens, block=5, span=2: tail block has 2 tokens (== span) ->
    # too short to mask, only block 0 masks
    docs = spark.createDataFrame(
        [(9, "a b c d e f g")], "doc_id long, text string"
    )
    row = span_corruption(docs, block=5, span_len=2).collect()[0]
    assert row.n_tokens == 7 and row.n_masked == 2
    assert "<X_1>" not in row.corrupted and "<X_1>" not in row.target
    assert row.corrupted.count("<X_0>") == 1
    # round trip: corrupted keeps n - span + 1 sentinel-adjusted tokens
    assert len(row.corrupted.split(" ")) == 7 - 2 + 1


def test_span_corruption_rejects_bad_params(spark):
    import pytest

    from osprey_spark.operators.curation import span_corruption

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        span_corruption(docs, block=2, span_len=2)


def test_watchlist_hits_known_answer(spark):
    from osprey_spark.operators.match import watchlist_hits

    docs = spark.createDataFrame(
        [
            (1, "buy cheap meds now buy cheap meds"),   # phrase twice
            (2, "cheap meds only"),                     # partial: no 'buy'
            (3, "buy cheap socks"),                     # prefix diverges
            (4, "totally clean text"),
            (5, "x buy cheap meds y free money z"),     # two phrases
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_hits, r.n_phrases, r.first_pos)
        for r in watchlist_hits(docs, ["buy cheap meds", "free money"]).collect()
    }
    assert got == {
        1: (2, 1, 0),
        5: (2, 2, 1),
    }


def test_watchlist_hits_rejects_overlong_phrase(spark):
    import pytest

    from osprey_spark.operators.match import watchlist_hits

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        watchlist_hits(docs, ["a b c d e f"], max_len=5)


def test_winnow_guarantee_and_tie_rule(spark):
    """Winnowing contract: any shared substring of >= k+w-1 tokens
    shares a fingerprint regardless of position shift; tie windows
    select the rightmost minimum; sub-k docs emit nothing."""
    from osprey_spark.operators.dedup import winnow_fingerprints, winnow_pairs

    k, w = 3, 3
    shared_run = "alpha beta gamma delta epsilon"  # 5 tokens = k+w-1
    docs = spark.createDataFrame(
        [
            (1, shared_run + " tail words here"),
            (2, "prefix tokens then " + shared_run),
            (3, "unrelated content entirely different words"),
            (4, "xy"),  # < k tokens -> no grams
            (5, "rep rep rep rep rep rep"),  # identical grams -> tie rule
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=k, w=w)
    rows = fps.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    # guarantee: docs 1 and 2 share the k+w-1 run -> >= 1 common fp
    assert by_doc[1] & by_doc[2]
    assert 4 not in by_doc
    # all grams of doc 5 are identical -> every window's rightmost min
    # advances with the window: one fp value, several positions
    d5 = [r for r in rows if r.doc_id == 5]
    assert len({r.fp for r in d5}) == 1
    assert {r.pos for r in d5} == {3, 4}  # windows [1..3],[2..4] -> rightmost
    pairs = {(r.doc_a, r.doc_b): r for r in winnow_pairs(docs, k=k, w=w, min_shared=1).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)].shared >= 1
    assert all(p in {(1, 2)} or 3 not in p for p in pairs)


def test_winnow_density_and_max_df_cull(spark):
    """Expected fingerprint density ~2/(w+1); a gram ubiquitous
    across > max_df docs is culled from pair detection."""
    from osprey_spark.operators.dedup import winnow_fingerprints, winnow_pairs

    text = " ".join(f"t{i * 7919 % 1009}" for i in range(200))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_sel = winnow_fingerprints(docs, k=4, w=8).count()
    n_grams = 200 - 3
    density = n_sel / n_grams
    assert 0.1 < density < 0.4  # 2/(w+1) = 0.222 expected
    # ubiquitous boilerplate: same text in 4 docs, max_df=3 culls every
    # shared fp -> no pairs survive
    boiler = spark.createDataFrame(
        [(i, "common header line shared by every doc") for i in range(4)],
        "doc_id long, text string",
    )
    assert winnow_pairs(boiler, k=3, w=2, min_shared=1, max_df=3).count() == 0
    assert winnow_pairs(boiler, k=3, w=2, min_shared=1, max_df=4).count() == 6

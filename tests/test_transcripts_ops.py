"""Transcript-curation operators: consecutive-turn repetition and
boilerplate-turn detection — known-answer fixtures (the driver oracle
covers the testdata-scale replay; these pin the semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osprey_spark.operators.transcripts import boilerplate_turns, turn_repetition


def _turns(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")


def test_turn_repetition_flags_agent_loops(spark):
    turns = _turns(
        spark,
        [
            # degenerate loop: identical consecutive turns
            ("a", 0, "i will check that"),
            ("a", 1, "i will check that"),
            ("a", 2, "i will check that"),
            # healthy conversation: disjoint turns
            ("b", 0, "hello there"),
            ("b", 1, "completely different words"),
            # single turn -> no pairs -> dropped
            ("c", 0, "lonely"),
        ],
    )
    out = {r.conv_id: r for r in turn_repetition(turns).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"].n_pairs == 2
    assert out["a"].n_repetitive == 2
    assert out["a"].mean_jaccard == 1.0
    assert out["b"].n_pairs == 1
    assert out["b"].n_repetitive == 0
    assert out["b"].mean_jaccard == 0.0


def test_turn_repetition_partial_overlap_and_empty(spark):
    turns = _turns(
        spark,
        [
            ("a", 0, "alpha beta gamma"),
            ("a", 1, "beta gamma delta"),   # |inter|=2 |union|=4 -> 0.5
            ("b", 0, "..."),                # tokenizes to nothing
            ("b", 1, "..."),                # both empty -> j = 1.0
        ],
    )
    out = {r.conv_id: r for r in turn_repetition(turns, threshold=0.6).collect()}
    assert out["a"].mean_jaccard == 0.5
    assert out["a"].n_repetitive == 0       # 0.5 < 0.6
    assert out["b"].mean_jaccard == 1.0


def test_boilerplate_turns_counts_distinct_convs(spark):
    canned = "I cannot help with that"
    turns = _turns(
        spark,
        [
            ("a", 0, canned),
            ("a", 1, "unique a"),
            ("b", 0, canned),
            ("b", 1, canned),   # intra-conv repeat: still ONE distinct conv
            ("c", 0, canned),
            ("d", 0, "only twice"),
            ("e", 0, "only twice"),  # 2 convs < min_convs=3 -> not boilerplate
        ],
    )
    out = {r.conv_id: r for r in boilerplate_turns(turns, min_convs=3).collect()}
    assert out["a"].n_boilerplate == 1 and out["a"].n_turns == 2
    assert out["a"].boilerplate_frac == 0.5
    assert out["b"].n_boilerplate == 2      # both copies counted in the rollup
    assert out["c"].boilerplate_frac == 1.0
    assert out["d"].n_boilerplate == 0 and out["e"].n_boilerplate == 0


def test_token_entropy_known_values(spark):
    import math

    from osprey_spark.operators.curation import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "x x x x"),          # one token -> H = 0
            (2, "a b a b"),          # uniform over 2 -> H = ln 2
            (3, "a a a b"),          # p = (3/4, 1/4)
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in token_entropy(docs).collect()}
    assert out[1].entropy == 0.0 and out[1].n_distinct == 1
    assert out[2].entropy == round(math.log(2), 6)
    h3 = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert out[3].entropy == round(h3, 6)
    assert out[3].n_tokens == 4

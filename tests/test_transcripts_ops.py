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


def _ts(i):
    return f"2024-01-01 10:{i // 60:02d}:{i % 60:02d}"


def test_stream_turn_repetition_matches_batch(spark, tmp_path):
    """Streaming repetition over a mid-conversation file split: the
    latest emitted row per conversation is bit-equal to the batch
    operator (including mean_jaccard), with the split pair spanning
    micro-batches."""
    from osprey_spark.operators.transcripts import stream_turn_repetition

    convs = {
        "a": ["loop loop loop", "loop loop loop", "loop loop loop", "loop loop loop"],
        "b": ["alpha beta gamma", "beta gamma delta", "unrelated words here", "beta gamma delta"],
        "c": ["single"],
        "d": ["one two", "two three", "three four"],
    }
    rows = []
    for ci, (conv, texts) in enumerate(sorted(convs.items())):
        for i, t in enumerate(texts):
            rows.append((conv, i, t, _ts(i * 60 + ci)))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts_str string"
    ).select("conv_id", "turn_idx", "text", F.to_timestamp("ts_str").alias("ts"))
    src = str(tmp_path / "turns")
    df.filter(F.col("turn_idx") < 2).coalesce(1).write.parquet(src)
    df.filter(F.col("turn_idx") >= 2).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_turn_repetition(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("rep_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("select * from rep_stream").collect()
    latest = {}
    for r in emitted:
        prev = latest.get(r.conv_id)
        if prev is None or r.n_pairs > prev.n_pairs:
            latest[r.conv_id] = r
    got = {
        k: (r.n_pairs, r.n_repetitive, r.mean_jaccard) for k, r in latest.items()
    }
    batch = turn_repetition(df).collect()
    want = {r.conv_id: (r.n_pairs, r.n_repetitive, r.mean_jaccard) for r in batch}
    assert got == want                      # bit-equal means included
    assert "c" not in got                   # no pairs -> withheld, like batch
    assert got["a"] == (3, 3, 1.0)


def test_stream_turn_repetition_survives_restart(spark, tmp_path):
    """The previous-turn token set and counters live in the state
    store: stop after batch 1, start a NEW query on the same
    checkpoint, and the spanning pair is still counted."""
    from osprey_spark.operators.transcripts import stream_turn_repetition

    rows1 = [("a", 0, "x y z", _ts(0)), ("a", 1, "x y q", _ts(60))]
    rows2 = [("a", 2, "x y q", _ts(120))]
    schema = "conv_id string, turn_idx int, text string, ts_str string"
    src = str(tmp_path / "turns")
    ckpt = str(tmp_path / "ckpt")

    def write(rows, mode):
        (
            spark.createDataFrame(rows, schema)
            .select("conv_id", "turn_idx", "text", F.to_timestamp("ts_str").alias("ts"))
            .coalesce(1)
            .write.mode(mode)
            .parquet(src)
        )

    out_dir = str(tmp_path / "out")

    def run():
        stream = (
            spark.readStream.schema(
                "conv_id string, turn_idx int, text string, ts timestamp"
            ).parquet(src)
        )
        q = (
            stream_turn_repetition(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(spark.read.parquet(out_dir).collect(), key=lambda r: r.n_pairs)

    write(rows1, "overwrite")
    first = run()
    assert [(r.n_pairs, r.n_repetitive) for r in first] == [(1, 1)]  # j = 2/4 >= 0.5
    write(rows2, "append")
    second = run()  # fresh query, same checkpoint + state store
    # turn 2 pairs with checkpointed turn 1: identical -> repetitive
    assert [(r.n_pairs, r.n_repetitive) for r in second] == [(1, 1), (2, 2)]
    assert second[-1].mean_jaccard == round((0.5 + 1.0) / 2, 6)


def test_conv_near_dup_finds_rephrased_conversation(spark):
    """Two conversations with the same token mix in different turn
    order/phrasing pair up at k=1; an unrelated one does not."""
    from osprey_spark.operators import dedup

    rows = [
        ("c1", 0, "please book a flight to paris"),
        ("c1", 1, "sure the flight to paris is booked"),
        ("c2", 0, "sure the flight is booked"),
        ("c2", 1, "please book a paris flight to paris"),
        ("c3", 0, "completely unrelated topic about gardening"),
    ]
    turns = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    conv_docs = turns.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("turn_idx").alias("i"), F.col("text").alias("t")))
                ),
                lambda s: s["t"],
            ),
            " ",
        ).alias("text")
    )
    out = dedup.minhash_lsh_pairs(
        conv_docs, id_col="conv_id", text_col="text",
        n_hashes=8, n_bands=4, jaccard_threshold=0.55, k=1,
    ).collect()
    assert [(r.id_a, r.id_b) for r in out] == [("c1", "c2")]
    assert out[0].jaccard == 1.0  # identical token sets


def test_transition_counts_known_answer(spark):
    from osprey_spark.operators.transcripts import transition_counts

    rows = [
        # c1: user -> assistant -> search -> search -> search -> assistant
        ("c1", 0, "user", None),
        ("c1", 1, "assistant", None),
        ("c1", 2, "tool", "search"),
        ("c1", 3, "tool", "search"),
        ("c1", 4, "tool", "search"),
        ("c1", 5, "assistant", None),
        # c2: user -> user (protocol violation) -> assistant
        ("c2", 0, "user", None),
        ("c2", 1, "user", None),
        ("c2", 2, "assistant", None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )
    got = {
        (r.src, r.dst): (r.n, r.out_total)
        for r in transition_counts(t).collect()
    }
    assert got == {
        ("user", "assistant"): (2, 3),
        ("user", "user"): (1, 3),  # the violation is visible
        ("assistant", "search"): (1, 1),
        ("search", "search"): (2, 3),  # retry loop = self-transition
        ("search", "assistant"): (1, 3),
    }
    # 5 transitions in c1 + 2 in c2; no cross-conversation pair
    assert sum(n for n, _ in got.values()) == 7


def test_response_latency_known_answer(spark):
    from osprey_spark.operators.transcripts import response_latency

    rows = [
        # c1: user@0s -> assistant@4s (gap 4); assistant -> user (no);
        #     user@10s -> assistant@13s (gap 3)
        ("c1", 0, "user", "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", "2024-01-01 00:00:04"),
        ("c1", 2, "user", "2024-01-01 00:00:10"),
        ("c1", 3, "assistant", "2024-01-01 00:00:13"),
        # c2: user -> tool -> assistant: NOT a direct response pair
        ("c2", 0, "user", "2024-01-01 00:00:00"),
        ("c2", 1, "tool", "2024-01-01 00:00:01"),
        ("c2", 2, "assistant", "2024-01-01 00:00:02"),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts_str string"
    ).select("conv_id", "turn_idx", "role", F.to_timestamp("ts_str").alias("ts"))
    got = {
        r.conv_id: (r.n_responses, r.max_gap_s, r.sum_gap_s)
        for r in response_latency(t).collect()
    }
    # c2 has zero direct pairs -> filtered out entirely
    assert got == {"c1": (2, 4, 7)}


def test_stream_transition_counts_retraction_changelog(spark, tmp_path):
    """Update-mode contract: the changelog's summed deltas equal batch
    transition_counts in ANY arrival order — even-indexed turns arrive
    first, so every odd turn later SPLITS an already-counted pair and
    forces a retraction (delta = -1) row."""
    from osprey_spark.operators.transcripts import (
        stream_transition_counts,
        transition_counts,
    )
    from osprey_spark.turns import turns_from_events

    t = turns_from_events(spark, "/root/testdata/sf0.001").limit(300).select(
        "conv_id", "turn_idx", "role", "tool"
    )
    src = str(tmp_path / "trans_src")
    t.filter(F.col("turn_idx") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    t.filter(F.col("turn_idx") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, tool string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_transition_counts(stream, n_buckets=16)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("trans_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    changelog = spark.sql("select * from trans_stream")
    assert changelog.filter(F.col("delta") < 0).count() > 0, (
        "no retraction emitted — the split path never ran"
    )
    got = {
        (r.src, r.dst): r.n
        for r in changelog.groupBy("src", "dst")
        .agg(F.sum("delta").cast("long").alias("n"))
        .filter(F.col("n") != 0)
        .collect()
    }
    expect = {
        (r.src, r.dst): r.n for r in transition_counts(t).collect()
    }
    assert got == expect


def test_stream_transition_counts_duplicate_delivery(spark, tmp_path):
    """At-least-once upstream: a redelivered (conv, turn_idx) row must
    not change the counted pairs (first delivery wins)."""
    from osprey_spark.operators.transcripts import stream_transition_counts

    schema = "conv_id string, turn_idx int, role string, tool string"
    src = str(tmp_path / "dup_src")
    spark.createDataFrame(
        [("c", 0, "user", None), ("c", 1, "assistant", None)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    # redelivery of turn 1 (different symbol — must be ignored) + turn 2
    spark.createDataFrame(
        [("c", 1, "tool", "exec"), ("c", 2, "user", None)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_transition_counts(stream, n_buckets=4)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("trans_dup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.src, r.dst): r.n
        for r in spark.sql(
            "select src, dst, cast(sum(delta) as long) n from trans_dup group by 1,2"
        ).collect()
    }
    assert got == {("user", "assistant"): 1, ("assistant", "user"): 1}


def test_preference_pairs_invariants(spark):
    """(prompt, chosen, rejected) triples from the flagship ruleset:
    rejected always carries the spam link, chosen never does, and the
    prompt is exactly the turns before the earlier of the two."""
    import __spark_entry__ as e

    rows = e.queries()["preference_pairs"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 10
    for r in rows[:50]:
        assert "spam.example.com" in r.rejected
        assert "spam.example.com" not in r.chosen
        assert r.chosen_idx != r.rejected_idx
        cut = min(r.chosen_idx, r.rejected_idx)
        n_prompt_turns = 0 if r.prompt == "" else len(r.prompt.split("\n"))
        assert n_prompt_turns == cut  # turn_idx is dense from 0


def test_sft_render_merges_and_renders(spark):
    from osprey_spark.operators.transcripts import sft_render

    rows = [
        ("c1", 0, "system", "you are helpful"),
        ("c1", 1, "user", "hi"),
        ("c1", 2, "user", "are you there"),       # merged into previous
        ("c1", 3, "assistant", "yes"),
        ("c1", 4, "tool", "a"),
        ("c1", 5, "tool", "b"),                   # merged
        ("c1", 6, "tool", "c"),                   # merged
        ("c2", 0, "user", "solo"),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = {r.conv_id: r for r in sft_render(t).collect()}
    assert got["c1"].n_turns == 7 and got["c1"].n_merged == 3
    assert got["c1"].rendered == (
        "<|system|> you are helpful\n"
        "<|user|> hi are you there\n"
        "<|assistant|> yes\n"
        "<|tool|> a b c"
    )
    assert got["c2"].n_turns == 1 and got["c2"].n_merged == 0
    assert got["c2"].rendered == "<|user|> solo"


def test_echo_overlap_known_answer(spark):
    from osprey_spark.operators.transcripts import echo_overlap

    rows = [
        ("c1", 0, "user", "the cat sat on the mat"),
        ("c1", 1, "assistant", "the cat sat quietly"),
        ("c1", 2, "user", "ok"),
        ("c1", 3, "assistant", "ok"),
        ("c1", 4, "user", "hm"),
        ("c1", 5, "assistant", "!!!"),          # tokenizes to nothing
        ("c2", 0, "assistant", "no prior user"),  # no preceding turn
        ("c3", 0, "tool", "x"),
        ("c3", 1, "assistant", "y"),            # preceding turn not user
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = {(r.conv_id, r.turn_idx): r for r in echo_overlap(t).collect()}
    assert set(got) == {("c1", 1), ("c1", 3), ("c1", 5)}
    r = got[("c1", 1)]
    # cand [the cat sat quietly]: uni clip = the+cat+sat = 3/4
    # bigrams: {the cat, cat sat} of 3 -> 2/3
    assert (r.n_cand, r.uni_clip, r.bi_clip) == (4, 3, 2)
    assert r.uni_prec == 0.75 and r.bi_prec == 0.666667 and r.echoed
    r = got[("c1", 3)]  # exact parrot, single token, no bigrams
    assert (r.n_cand, r.uni_clip, r.uni_prec, r.bi_prec) == (1, 1, 1.0, 0.0)
    assert r.echoed
    r = got[("c1", 5)]  # empty candidate -> defined 0.0, not echoed
    assert (r.n_cand, r.uni_prec, r.echoed) == (0, 0.0, False)


def test_context_windows_budget_suffix(spark):
    from osprey_spark.operators.transcripts import context_windows

    rows = [
        ("c1", 0, "user", "a b c"),        # 3 tokens, pre=0
        ("c1", 1, "tool", "d e"),          # 2 tokens, pre=3
        ("c1", 2, "user", "f g h i"),      # 4 tokens, pre=5
        ("c1", 3, "assistant", "target one"),   # pre=9
        ("c1", 4, "assistant", "target two"),   # pre=11
        ("c2", 0, "assistant", "no history"),   # turn 0: never a target
        ("c3", 0, "user", "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
        ("c3", 1, "assistant", "over budget"),  # sole prior turn > budget
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")

    tight = {(r.conv_id, r.turn_idx): r for r in context_windows(t, budget=5).collect()}
    assert set(tight) == {("c1", 3), ("c1", 4)}
    r = tight[("c1", 3)]  # 9 - pre <= 5 -> only turn 2 (pre=5)
    assert (r.ctx_turns, r.ctx_tokens) == (1, 4)
    assert r.ctx_text == "<|user|> f g h i" and r.target_text == "target one"
    r = tight[("c1", 4)]  # 11 - pre <= 5 -> only turn 3 (pre=9)
    assert (r.ctx_turns, r.ctx_tokens) == (1, 2)
    assert r.ctx_text == "<|assistant|> target one"

    wide = {(r.conv_id, r.turn_idx): r for r in context_windows(t, budget=100).collect()}
    r = wide[("c1", 3)]  # whole history fits, line order by turn_idx
    assert (r.ctx_turns, r.ctx_tokens) == (3, 9)
    assert r.ctx_text == "<|user|> a b c\n<|tool|> d e\n<|user|> f g h i"
    assert ("c3", 1) in wide and ("c2", 0) not in wide


def test_pivot_roles_wide_counts(spark):
    from osprey_spark.operators.transcripts import pivot_roles

    rows = [
        ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, "tool"),
        ("c1", 3, "tool"), ("c1", 4, "assistant"),
        ("c2", 0, "system"), ("c2", 1, "user"),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    got = {r.conv_id: r for r in pivot_roles(t).collect()}
    r = got["c1"]
    assert (r.n_user, r.n_assistant, r.n_system, r.n_tool, r.n_turns) == (1, 2, 0, 2, 5)
    r = got["c2"]
    assert (r.n_user, r.n_assistant, r.n_system, r.n_tool, r.n_turns) == (1, 0, 1, 0, 2)


def test_conv_trend_known_answers(spark):
    """Slope known answers: perfectly linear growth, flat, shrinking,
    NULL-text-as-zero, and the min_turns filter."""
    from osprey_spark.operators.transcripts import conv_trend

    rows = [
        # c_up: lengths 2, 4, 6 over idx 0,1,2 -> slope exactly 2
        ("c_up", 0, "ab"), ("c_up", 1, "abcd"), ("c_up", 2, "abcdef"),
        # c_flat: constant length -> slope 0
        ("c_flat", 0, "xxx"), ("c_flat", 1, "yyy"), ("c_flat", 2, "zzz"),
        # c_down: 6, 4, 2 -> slope -2; NULL counted as 0 at idx 3 steepens
        ("c_down", 0, "abcdef"), ("c_down", 1, "abcd"),
        ("c_down", 2, "ab"), ("c_down", 3, None),
        # c_short: below min_turns -> dropped
        ("c_short", 0, "hello"), ("c_short", 1, "hi"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {r.conv_id: r for r in conv_trend(df).collect()}
    assert set(out) == {"c_up", "c_flat", "c_down"}
    assert out["c_up"].slope == 2.0 and out["c_up"].mean_len == 4.0
    assert out["c_flat"].slope == 0.0
    # exact OLS over (0,6),(1,4),(2,2),(3,0): slope -2
    assert out["c_down"].slope == -2.0
    assert out["c_down"].n_turns == 4


def test_rouge_l_known_answers(spark):
    from osprey_spark.operators.transcripts import rouge_l

    rows = [
        # gappy copy: LCS("a b c d e", "a x b y c d") = a b c d = 4
        ("g", 0, "user", "a b c d e"),
        ("g", 1, "assistant", "a x b y c d"),
        # exact parrot
        ("g", 2, "user", "hello world"),
        ("g", 3, "assistant", "hello world"),
        # disjoint: LCS = 0 -> all metrics 0.0 (F1 guard, no NaN)
        ("h", 0, "user", "p q"),
        ("h", 1, "assistant", "z z z"),
        # assistant not after user -> no row
        ("h", 2, "assistant", "p q"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = {(r.conv_id, r.turn_idx): r for r in rouge_l(df).collect()}
    assert set(out) == {("g", 1), ("g", 3), ("h", 1)}
    gappy = out[("g", 1)]
    assert (gappy.lcs_len, gappy.n_cand, gappy.n_ref) == (4, 6, 5)
    assert gappy.rouge_p == round(4 / 6, 6)
    assert gappy.rouge_r == 0.8
    p, r = 4 / 6, 4 / 5
    assert gappy.rouge_f == round(2.0 * p * r / (p + r), 6)
    exact = out[("g", 3)]
    assert (exact.rouge_p, exact.rouge_r, exact.rouge_f) == (1.0, 1.0, 1.0)
    disjoint = out[("h", 1)]
    assert (disjoint.lcs_len, disjoint.rouge_f) == (0, 0.0)


def test_rouge_l_cap_and_empty(spark):
    from osprey_spark.operators.transcripts import rouge_l

    rows = [
        # cap at max_tokens=3: cand/ref sliced before the DP
        ("k", 0, "user", "a b c d e f"),
        ("k", 1, "assistant", "a b c x y z"),
        # empty candidate after tokenization (punctuation only)
        ("m", 0, "user", "w x"),
        ("m", 1, "assistant", "..."),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = {(r.conv_id, r.turn_idx): r for r in rouge_l(df, max_tokens=3).collect()}
    capped = out[("k", 1)]
    assert (capped.n_cand, capped.n_ref, capped.lcs_len) == (3, 3, 3)
    assert capped.rouge_f == 1.0
    empty = out[("m", 1)]
    assert (empty.n_cand, empty.lcs_len, empty.rouge_p, empty.rouge_f) == (
        0,
        0,
        0.0,
        0.0,
    )


def test_topic_segments_boundary_at_topic_shift(spark):
    from osprey_spark.operators.transcripts import topic_segments

    rows = [
        # two cohesive topics with zero lexical overlap: the gap
        # between them is a deep valley flanked by high-sim peaks
        ("c", 0, "onion butter pan"),
        ("c", 1, "onion butter salt"),
        ("c", 2, "pan salt onion"),
        ("c", 3, "stock market index"),
        ("c", 4, "market index shares"),
        ("c", 5, "shares stock market"),
        ("d", 0, "single"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {r.turn_idx: r for r in topic_segments(
        df, block=2, peak_window=3, depth_threshold=0.5
    ).filter(F.col("conv_id") == "c").collect()}
    # last turn has no following block; turns 0..4 emit gap rows
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[2].sim == 0.0 and out[2].n_common == 0  # disjoint topics
    assert out[2].boundary  # the deep valley
    assert not out[1].boundary and not out[3].boundary
    # depth = peakL + peakR - 2*sim, peaks = window max over 3 gaps
    assert out[2].depth == round(
        max(out[0].sim, out[1].sim) + max(out[3].sim, out[4].sim), 6
    )
    # flanking gaps inherit large depth from the valley's peaks but
    # are NOT local minima -> not boundaries (the valley condition)
    assert out[1].depth >= 0.5 and not out[1].boundary
    # single-turn conversation emits no gap rows
    assert topic_segments(df).filter(F.col("conv_id") == "d").count() == 0


def test_textrank_hub_turn_ranks_first(spark):
    from osprey_spark.operators.transcripts import textrank_turns

    rows = [
        ("c", 0, "alpha beta"),
        ("c", 1, "alpha beta gamma delta"),  # hub: overlaps 0 and 2
        ("c", 2, "gamma delta"),
        ("c", 3, "zzz qqq"),                 # isolated
        ("d", 0, "solo turn"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {(r.conv_id, r.turn_idx): r for r in textrank_turns(df, top_m=2).collect()}
    assert out[("c", 1)].rank == 1 and out[("c", 1)].selected
    # isolated turn gets the damping floor (1-d) and ranks last
    assert out[("c", 3)].score == round(1 - 0.85, 6)
    assert out[("c", 3)].rank == 4 and not out[("c", 3)].selected
    # symmetric satellites tie on score; tie breaks by turn index
    assert out[("c", 0)].score == out[("c", 2)].score
    assert (out[("c", 0)].rank, out[("c", 2)].rank) == (2, 3)
    # singleton conversation: floor score, rank 1, selected
    assert out[("d", 0)].score == round(1 - 0.85, 6)
    assert out[("d", 0)].rank == 1 and out[("d", 0)].selected


def test_textrank_max_turns_cap(spark):
    from osprey_spark.operators.transcripts import textrank_turns

    rows = [("c", i, f"tok{i} shared") for i in range(6)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = textrank_turns(df, max_turns=4).collect()
    assert sorted(r.turn_idx for r in out) == [0, 1, 2, 3]


# --- Kleinberg burst detection -----------------------------------------------


def _ts_turns(spark, rows):
    import datetime as dt

    data = [
        (c, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec))
        for c, i, sec in rows
    ]
    return spark.createDataFrame(data, "conv_id string, turn_idx int, ts timestamp")


def _burst_python(gaps, s=2.0, gamma=1.0):
    """Pure-Python replica of burst_spans' Viterbi fold."""
    import math

    m, T = len(gaps), sum(gaps)
    lam0 = m / T
    lam1 = s * lam0
    l0, l1 = math.log(lam0), math.log(lam1)
    tr = gamma * math.log(m)
    c0, c1, p0, p1 = 0.0, 1e18, [], []
    for x in gaps:
        e0, e1 = lam0 * x - l0, lam1 * x - l1
        up = c0 + tr
        nc0, nc1 = min(c0, c1) + e0, min(c1, up) + e1
        np0 = (p0 if c0 <= c1 else p1) + [0]
        np1 = (p1 if c1 <= up else p0) + [1]
        c0, c1, p0, p1 = nc0, nc1, np0, np1
    return p0 if c0 <= c1 else p1


def test_burst_spans_flags_rapid_fire_run(spark):
    """Slow-fast-slow gap profile: the fast middle run is one burst;
    gaps and the state sequence match the pure-Python Viterbi."""
    from osprey_spark.operators.transcripts import burst_spans

    gaps = [600, 600, 600, 5, 5, 5, 5, 5, 600, 600, 600]
    secs = [0]
    for g in gaps:
        secs.append(secs[-1] + g)
    rows = [("a", i, s) for i, s in enumerate(secs)]
    out = burst_spans(_ts_turns(spark, rows)).collect()
    got = sorted((r.gap_idx, r.gap_s, r.in_burst) for r in out)
    expect_states = _burst_python(gaps)
    assert [g for _, g, _ in got] == gaps
    assert [st for _, _, st in got] == expect_states
    # the fast run is burst, the slow shoulders are not
    assert expect_states[3:8] == [1] * 5 and expect_states[0] == 0


def test_burst_spans_uniform_gaps_silent(spark):
    """Uniform cadence -> the burst state never pays for itself ->
    conversation absent from the output entirely."""
    from osprey_spark.operators.transcripts import burst_spans

    rows = [("u", i, i * 60) for i in range(20)]
    assert burst_spans(_ts_turns(spark, rows)).count() == 0


def test_burst_spans_zero_span_and_short_convs_dropped(spark):
    """All-simultaneous turns (span 0) and single-gap conversations
    carry no rate signal and are filtered, not NaN'd."""
    from osprey_spark.operators.transcripts import burst_spans

    rows = [("z", i, 0) for i in range(5)] + [("s", 0, 0), ("s", 1, 3)]
    assert burst_spans(_ts_turns(spark, rows)).count() == 0


def test_burst_spans_max_turns_cap_and_validation(spark):
    """Turns past max_turns never contribute gaps; bad params raise."""
    import pytest

    from osprey_spark.operators.transcripts import burst_spans

    gaps = [600] * 5 + [5] * 6 + [600] * 5
    secs = [0]
    for g in gaps:
        secs.append(secs[-1] + g)
    rows = [("a", i, s) for i, s in enumerate(secs)]
    capped = burst_spans(_ts_turns(spark, rows), max_turns=8).collect()
    # 8 turns -> 7 gaps max
    assert max(r.gap_idx for r in capped) <= 7 if capped else True
    with pytest.raises(ValueError, match="s must be > 1"):
        burst_spans(_ts_turns(spark, rows), s=1.0)
    with pytest.raises(ValueError, match="max_turns"):
        burst_spans(_ts_turns(spark, rows), max_turns=2)


# --- binary-segmentation changepoints ----------------------------------------


def _text_turns(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")


def _binseg_python(xs, penalty=8.0, max_cps=3):
    """Pure-Python replica of transcripts.changepoints' greedy binseg."""
    n = len(xs)
    P = [0]
    Q = [0]
    for x in xs:
        P.append(P[-1] + x)
        Q.append(Q[-1] + x * x)

    def cost(l, r):
        s = float(P[r] - P[l - 1])
        return float(Q[r] - Q[l - 1]) - (s * s) / float(r - l + 1)

    thr = penalty * (cost(1, n) / n)
    cuts = []
    for _ in range(max_cps):
        bounds = [0] + cuts + [n]
        best = None
        for i in range(len(bounds) - 1):
            l, r = bounds[i] + 1, bounds[i + 1]
            for k in range(l, r):
                g = cost(l, r) - cost(l, k) - cost(k + 1, r)
                if best is None or (-g, k) < best:
                    best = (-g, k)
        if best is not None and -best[0] > thr:
            cuts = sorted(cuts + [best[1]])
    return cuts


def test_changepoints_two_regime_known_answer(spark):
    """Short turns then long turns: one cut exactly at the boundary;
    a constant conversation stays silent."""
    from osprey_spark.operators.transcripts import changepoints

    rows = [("a", i, "w w w") for i in range(10)]
    rows += [("a", i, " ".join(["w"] * 12)) for i in range(10, 20)]
    rows += [("b", i, "w w w") for i in range(20)]
    out = changepoints(_text_turns(spark, rows)).collect()
    assert [(r.conv_id, r.cp_pos, r.turn_idx) for r in out] == [("a", 10, 10)]


def test_changepoints_matches_python_replica(spark):
    """Irregular three-regime series: Spark's per-row fold == the
    pure-Python greedy binseg at every max_cps."""
    from osprey_spark.operators.transcripts import changepoints

    lens = [3] * 6 + [15] * 5 + [7] * 7 + [2] * 6
    rows = [("c", i, " ".join(["w"] * k)) for i, k in enumerate(lens)]
    for mc in (1, 2, 3):
        out = changepoints(_text_turns(spark, rows), max_cps=mc).collect()
        got = sorted(r.cp_pos for r in out)
        assert got == _binseg_python(lens, max_cps=mc), f"max_cps={mc}"


def test_changepoints_maps_cut_to_turn_idx(spark):
    """turn_idx output is the FIRST turn of the new regime even when
    turn indices are sparse (gaps in numbering)."""
    from osprey_spark.operators.transcripts import changepoints

    rows = [("s", 2 * i + 1, "w w") for i in range(8)]
    rows += [("s", 100 + i, " ".join(["w"] * 10)) for i in range(8)]
    out = changepoints(_text_turns(spark, rows)).collect()
    assert len(out) == 1 and out[0].cp_pos == 8 and out[0].turn_idx == 100


def test_changepoints_validation(spark):
    import pytest

    from osprey_spark.operators.transcripts import changepoints

    t = _text_turns(spark, [("a", 0, "w")])
    with pytest.raises(ValueError, match="max_cps"):
        changepoints(t, max_cps=0)
    with pytest.raises(ValueError, match="max_cps"):
        changepoints(t, max_turns=3)


# --- transition entropy (scripted-bot predictability) -------------------------


def _role_turns(spark, convs):
    rows = []
    for cid, roles in convs.items():
        for i, r in enumerate(roles):
            rows.append((cid, i, r))
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")


def test_transition_entropy_deterministic_loop_is_zero(spark):
    from osprey_spark.operators.transcripts import transition_entropy

    out = transition_entropy(
        _role_turns(spark, {"bot": ["a", "b"] * 6})
    ).collect()[0]
    # transitions: a->b x6, b->a x5 -> two pair types, but each c>1:
    # H = ln(11) - (6 ln 6 + 5 ln 5)/11
    import math

    h = math.log(11) - (6 * math.log(6) + 5 * math.log(5)) / 11
    assert out.n_transitions == 11 and out.n_pairs == 2
    assert out.entropy == round(h, 6)
    assert out.evenness == round(h / math.log(2), 6)


def test_transition_entropy_pure_cycle_vs_varied(spark):
    """A strict 3-state cycle has far lower evenness than a varied
    conversation with the same length."""
    from osprey_spark.operators.transcripts import transition_entropy

    cycle = ["u", "a", "t"] * 8
    varied = ["u", "a", "u", "t", "a", "a", "u", "u", "t", "u", "a", "t",
              "t", "u", "a", "t", "u", "u", "a", "t", "a", "u", "t", "a"]
    out = {
        r.conv_id: r
        for r in transition_entropy(
            _role_turns(spark, {"cycle": cycle, "varied": varied})
        ).collect()
    }
    # the cycle uses exactly 3 pair types with near-equal counts ->
    # evenness ~ 1 BUT only 3 pairs; the varied conv spreads over many
    # pair types; its raw entropy is much higher
    assert out["varied"].entropy > out["cycle"].entropy + 0.5
    assert out["cycle"].n_pairs == 3


def test_transition_entropy_singletons_and_replica(spark):
    import math

    from osprey_spark.operators.transcripts import transition_entropy

    # all-distinct transitions: H = ln(n) exactly (c ln c = 0), evenness 1
    out = transition_entropy(
        _role_turns(spark, {"c": ["a", "b", "c", "d", "e"]})
    ).collect()[0]
    assert out.entropy == round(math.log(4), 6)
    assert out.evenness == 1.0
    # single-transition conv: H = 0, evenness NULL
    out = transition_entropy(_role_turns(spark, {"c": ["a", "b"]})).collect()[0]
    assert out.entropy == 0.0 and out.evenness is None
    # single-turn conv: no transitions, no row
    assert transition_entropy(_role_turns(spark, {"c": ["a"]})).count() == 0


# --- top journey paths --------------------------------------------------------


def test_top_paths_ranking_and_share(spark):
    from osprey_spark.operators.transcripts import top_paths

    convs = {
        "a": ["u", "a", "u"],
        "b": ["u", "a", "u"],
        "c": ["u", "a", "t"],
        "d": ["u"],
    }
    out = top_paths(_role_turns(spark, convs), depth=5, k=10).collect()
    assert out[0].path == "u>a>u" and out[0].n_convs == 2
    assert out[0].share == 0.5
    got = {r.path: (r.n_convs, r.share) for r in out}
    assert got["u>a>t"] == (1, 0.25) and got["u"] == (1, 0.25)


def test_top_paths_depth_cap_and_tiebreak(spark):
    import pytest

    from osprey_spark.operators.transcripts import top_paths

    convs = {
        "a": ["u", "a", "t", "u", "a", "t", "t", "t"],  # depth 3 -> u>a>t
        "b": ["x"],
        "c": ["y"],
    }
    out = top_paths(_role_turns(spark, convs), depth=3, k=2).collect()
    assert out[0].path == "u>a>t"
    # tie between x and y resolves alphabetically; k caps at 2
    assert [r.path for r in out] == ["u>a>t", "x"]
    with pytest.raises(ValueError, match="depth"):
        top_paths(_role_turns(spark, convs), depth=0)


# --------------------------------------------------------------------------
# markov stationary distribution
# --------------------------------------------------------------------------


def _mk_counts(spark, rows):
    """rows: (src, dst, n); out_total derived."""
    from collections import Counter

    tot = Counter()
    for s, _d, n in rows:
        tot[s] += n
    data = [(s, d, n, tot[s]) for s, d, n in rows]
    return spark.createDataFrame(
        data, "src string, dst string, n long, out_total long"
    )


def _mk_replica(rows, rounds=8, scale=10**12):
    """Pure-python integer power iteration with the self-loop fix."""
    from collections import Counter, defaultdict

    tot = Counter()
    states = set()
    for s, d, n in rows:
        tot[s] += n
        states |= {s, d}
    e = list(rows)
    for st in sorted(states):
        if tot[st] == 0:
            e.append((st, st, 1))
            tot[st] = 1
    pi = {st: scale for st in states}
    for _ in range(rounds):
        nxt = defaultdict(int)
        for s, d, n in e:
            if s in pi:  # dropped states emit no join rows in Spark
                nxt[d] += (pi[s] * n) // tot[s]
        pi = dict(nxt)
    return pi


def test_markov_stationary_two_state_chain(spark):
    """P = [[0,1],[1/2,1/2]] has stationary (1/3, 2/3); the integer
    iteration converges to it within rounding and matches a python
    replica exactly."""
    from osprey_spark.operators.transcripts import markov_stationary

    rows = [("A", "B", 2), ("B", "A", 1), ("B", "B", 1)]
    out = markov_stationary(_mk_counts(spark, rows), rounds=8)
    got = {r["state"]: (r["pi"], r["share"]) for r in out.collect()}
    out.unpersist_base()
    want = _mk_replica(rows, rounds=8)
    assert {s: p for s, (p, _sh) in got.items()} == want
    assert abs(got["A"][1] - 1 / 3) < 1e-3
    assert abs(got["B"][1] - 2 / 3) < 1e-3


def test_markov_stationary_dangling_self_loop(spark):
    """A->B with B dangling: the self-loop absorbs all mass in B
    instead of evaporating it."""
    from osprey_spark.operators.transcripts import markov_stationary

    rows = [("A", "B", 3)]
    out = markov_stationary(_mk_counts(spark, rows), rounds=6)
    got = {r["state"]: r for r in out.collect()}
    out.unpersist_base()
    # states that receive zero mass drop out of the frame entirely
    # (groupBy dst), in Spark, the oracle, and the replica alike
    assert "A" not in got
    assert got["B"]["share"] == 1.0
    assert got["B"]["pi"] == _mk_replica(rows, rounds=6)["B"]


def test_markov_stationary_validation(spark):
    from osprey_spark.operators.transcripts import markov_stationary

    import pytest as _pt

    with _pt.raises(ValueError):
        markov_stationary(_mk_counts(spark, [("A", "B", 1)]), rounds=0)


# --------------------------------------------------------------------------
# Burrows' Delta stylometry
# --------------------------------------------------------------------------


def test_burrows_delta_same_style_pairs_rank_first(spark):
    """Two authors with identical function-word profiles score delta
    0 together and far from a third author with an inverted profile."""
    from osprey_spark.operators.transcripts import burrows_delta

    rows = []
    # a1/a2: heavy 'the', light 'of'; a3: inverted
    for a in ("a1", "a2"):
        rows += [(a, "the the the the of filler")] * 5
    rows += [("a3", "of of of of the filler")] * 5
    df = spark.createDataFrame(rows, "conv_id string, text string")
    out = burrows_delta(
        df, author_col="conv_id", top_words=5, n_authors=3, k=10
    ).collect()
    first = out[0]
    assert (first["author_a"], first["author_b"]) == ("a1", "a2")
    assert first["delta"] == 0.0
    others = [r["delta"] for r in out[1:]]
    assert all(d > 0.5 for d in others)


def test_burrows_delta_missing_word_is_zero_not_absent(spark):
    """An author who never uses a head word gets a real z for count
    0 (the dense-grid contract), so the pair frame always has
    top_words rows per pair."""
    from osprey_spark.operators.transcripts import burrows_delta

    rows = [
        ("x", "alpha alpha beta"),
        ("y", "alpha beta beta"),
        ("z", "alpha gamma gamma"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, text string")
    out = burrows_delta(
        df, author_col="conv_id", top_words=5, n_authors=3, k=10
    ).collect()
    # vocab: alpha(3) beta(3) gamma(2) -> only 3 head words exist
    assert all(r["n_words"] == 3 for r in out)
    assert len(out) == 3


def test_burrows_delta_validation(spark):
    from osprey_spark.operators.transcripts import burrows_delta

    import pytest as _pt

    df = spark.createDataFrame([("a", "x")], "conv_id string, text string")
    with _pt.raises(ValueError):
        burrows_delta(df, top_words=2)
    with _pt.raises(ValueError):
        burrows_delta(df, n_authors=2)

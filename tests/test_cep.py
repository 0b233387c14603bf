"""CEP sequence-pattern operator: known-answer + semantics tests.

Driver-oracle parity (counts and first-match positions vs DuckDB over
thousands of turns) is exercised by the `cep_sequence` entry in
tools/check_parity.py; these tests pin the hand-checkable semantics:
ordering, non-overlapping counting, 0-based first-match position,
construction-time validation.
"""

import pytest
from pyspark.sql import functions as F

from osprey_spark.operators import cep


def _turns(spark, seq_by_conv):
    rows = [
        (conv, i, sym)
        for conv, seq in seq_by_conv.items()
        for i, sym in enumerate(seq)
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")


SYMS = {"u": "u", "a": "a", "s": "s", "t": "t"}


def test_known_answer_counts_and_position(spark):
    df = _turns(
        spark,
        {
            "c1": "uattuatt",  # two non-overlapping 'att' matches, first at 1
            "c2": "uuuu",  # no match
            "c3": "attatt",  # matches at 0 and 3
        },
    )
    out = cep.sequence_match(
        df, "at{2}", cep.symbols_from_map(F.col("role"), SYMS)
    ).collect()
    got = {r["conv_id"]: (r["seq_len"], r["n_matches"], r["first_match_idx"]) for r in out}
    assert got == {"c1": (8, 2, 1), "c3": (6, 2, 0)}


def test_order_cols_define_sequence_order(spark):
    # rows arrive shuffled; turn_idx must define the string order
    rows = [("c1", 2, "t"), ("c1", 0, "a"), ("c1", 1, "t")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    out = cep.sequence_match(
        df, "att", cep.symbols_from_map(F.col("role"), SYMS)
    ).collect()
    assert len(out) == 1 and out[0]["first_match_idx"] == 0


def test_nonoverlapping_leftmost(spark):
    # 'aaa' in 'aaaaa' counts once (leftmost match consumes 0-2, the
    # remainder 'aa' cannot match) — the Matcher.find convention
    df = _turns(spark, {"c": "aaaaa"})
    out = cep.sequence_match(
        df, "aaa", cep.symbols_from_map(F.col("role"), SYMS)
    ).collect()
    assert out[0]["n_matches"] == 1


def test_min_matches_filters(spark):
    df = _turns(spark, {"c1": "atat", "c2": "atuu"})
    out = cep.sequence_match(
        df, "at", cep.symbols_from_map(F.col("role"), SYMS), min_matches=2
    ).collect()
    assert [r["conv_id"] for r in out] == ["c1"]


def test_unmapped_and_null_roles_get_default(spark):
    rows = [("c", 0, "assistant"), ("c", 1, None), ("c", 2, "weird")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    out = cep.sequence_match(
        df, "a\\?\\?", cep.symbols_from_map(F.col("role"), {"assistant": "a"})
    ).collect()
    assert out[0]["n_matches"] == 1


def test_empty_matching_pattern_rejected(spark):
    df = _turns(spark, {"c": "a"})
    with pytest.raises(ValueError, match="empty"):
        cep.sequence_match(df, "a*", cep.symbols_from_map(F.col("role"), SYMS))


def test_multichar_symbol_rejected():
    with pytest.raises(ValueError, match="single"):
        cep.symbols_from_map(F.col("x"), {"user": "uu"})


def test_sessions_bound_matching(spark):
    """A pattern whose symbols straddle a session gap must NOT match;
    within-session matches report session-relative positions."""
    # conv c1: 'a','t' at minute 0-1, then a 2-hour gap, then 'a','t','t'
    rows = [
        ("c1", 0, "a", "2024-01-01 10:00:00"),
        ("c1", 1, "a", "2024-01-01 10:01:00"),  # session 1 ends 'aa'
        ("c1", 2, "t", "2024-01-01 12:30:00"),  # session 2: 'tt' alone
        ("c1", 3, "t", "2024-01-01 12:31:00"),
        ("c2", 0, "a", "2024-01-01 10:00:00"),
        ("c2", 1, "t", "2024-01-01 10:05:00"),
        ("c2", 2, "t", "2024-01-01 10:06:00"),  # one session: 'att'
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts_str string"
    ).select("conv_id", "turn_idx", "role", F.to_timestamp("ts_str").alias("ts"))
    out = cep.sequence_match_sessions(
        df, "at{2}", cep.symbols_from_map(F.col("role"), SYMS), gap_seconds=1800
    ).collect()
    # c1's 'a...tt' spans the session boundary -> no match anywhere;
    # unsessionized matching WOULD find it (guard the premise)
    whole = cep.sequence_match(
        df, "at{2}", cep.symbols_from_map(F.col("role"), SYMS)
    ).collect()
    assert {r["conv_id"] for r in whole} == {"c1", "c2"}
    assert [(r["conv_id"], r["session_id"], r["n_matches"], r["first_match_idx"]) for r in out] == [
        ("c2", 1, 1, 0)
    ]


def _ts(i):
    return f"2024-01-01 10:{i // 60:02d}:{i % 60:02d}"


ROLE_SYMS = {"user": "u", "assistant": "a", "tool": "t"}


def test_stream_sequence_match_matches_batch(spark, tmp_path):
    """Streaming CEP over multi-batch file splits: the latest emitted
    row per conversation equals the batch operator's row, for a
    fixed-length pattern (the batch-exact class), including matches
    whose symbols SPAN micro-batches."""
    rows = []
    seqs = {"c1": "uattuatt", "c2": "uuuuu", "c3": "attatt", "c4": "aat"}
    for ci, (conv, seq) in enumerate(sorted(seqs.items())):
        for i, sym in enumerate(seq):
            role = {"u": "user", "a": "assistant", "t": "tool"}[sym]
            rows.append((conv, i, role, _ts(i * 60 + ci)))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts_str string"
    ).select("conv_id", "turn_idx", "role", F.to_timestamp("ts_str").alias("ts"))
    src = str(tmp_path / "turns")
    # split mid-match: turn_idx < 3 in file 1, the rest in file 2, so
    # c1's second 'att' and c3's second 'att' straddle the boundary
    df.filter(F.col("turn_idx") < 3).coalesce(1).write.parquet(src)
    df.filter(F.col("turn_idx") >= 3).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, role string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = cep.stream_sequence_match(
        stream, "at{2}", cep.symbols_from_map(F.col("role"), ROLE_SYMS)
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("cep_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("select * from cep_stream").collect()
    latest = {}
    for r in emitted:
        prev = latest.get(r.conv_id)
        if prev is None or r.seq_len > prev.seq_len:
            latest[r.conv_id] = r
    got = {
        k: (r.seq_len, r.n_matches, r.first_match_idx) for k, r in latest.items()
    }
    batch = cep.sequence_match(
        df, "at{2}", cep.symbols_from_map(F.col("role"), ROLE_SYMS), min_matches=0
    ).collect()
    want = {
        r.conv_id: (
            r.seq_len,
            r.n_matches,
            r.first_match_idx if r.n_matches > 0 else None,
        )
        for r in batch
    }
    assert got == want
    assert got["c1"][1] == 2 and got["c3"][1] == 2  # spanning matches found


def test_stream_sequence_buffer_cap_bounds_state(spark, tmp_path):
    """A never-matching conversation's buffer caps at max_buffer; the
    counters stay exact."""
    rows = [("c", i, "user", _ts(i)) for i in range(50)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts_str string"
    ).select("conv_id", "turn_idx", "role", F.to_timestamp("ts_str").alias("ts"))
    src = str(tmp_path / "turns")
    df.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, role string, ts timestamp")
        .parquet(src)
    )
    out = cep.stream_sequence_match(
        stream, "at{2}", cep.symbols_from_map(F.col("role"), ROLE_SYMS), max_buffer=8
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("cep_cap")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    r = spark.sql("select * from cep_cap").collect()[-1]
    assert (r.seq_len, r.n_matches, r.first_match_idx) == (50, 0, None)


def test_stream_session_gap_matches_batch_sessions(spark, tmp_path):
    """With session_gap_seconds set, the streaming changelog's latest
    row per (conv, session) equals sequence_match_sessions — including
    a session that STRADDLES the micro-batch split, and a gap that
    closes a session mid-batch."""
    rows = [
        # c1: session 1 = 'aa' (no match), 2h gap, session 2 = 'att'
        ("c1", 0, "assistant", "2024-01-01 10:00:00"),
        ("c1", 1, "assistant", "2024-01-01 10:01:00"),
        ("c1", 2, "assistant", "2024-01-01 12:30:00"),
        ("c1", 3, "tool", "2024-01-01 12:31:00"),
        ("c1", 4, "tool", "2024-01-01 12:32:00"),
        # c2: one session 'att'
        ("c2", 0, "assistant", "2024-01-01 10:00:00"),
        ("c2", 1, "tool", "2024-01-01 10:05:00"),
        ("c2", 2, "tool", "2024-01-01 10:06:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts_str string"
    ).select("conv_id", "turn_idx", "role", F.to_timestamp("ts_str").alias("ts"))
    src = str(tmp_path / "turns")
    # c1's session 2 straddles the file split (turn 3 boundary)
    df.filter(F.col("turn_idx") < 4).coalesce(1).write.parquet(src)
    df.filter(F.col("turn_idx") >= 4).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, role string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = cep.stream_sequence_match(
        stream,
        "at{2}",
        cep.symbols_from_map(F.col("role"), ROLE_SYMS),
        session_gap_seconds=1800,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("cep_sess_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = {}
    for r in spark.sql("select * from cep_sess_stream").collect():
        k = (r.conv_id, r.session_id)
        if k not in latest or r.seq_len > latest[k].seq_len:
            latest[k] = r
    got = {
        k: (r.seq_len, r.n_matches, r.first_match_idx) for k, r in latest.items()
    }
    want = {
        (r.conv_id, r.session_id): (
            r.seq_len,
            r.n_matches,
            r.first_match_idx if r.n_matches > 0 else None,
        )
        for r in cep.sequence_match_sessions(
            df,
            "at{2}",
            cep.symbols_from_map(F.col("role"), ROLE_SYMS),
            gap_seconds=1800,
            min_matches=0,
        ).collect()
    }
    assert got == want
    assert got[("c1", 2)] == (3, 1, 0)  # straddling session matched


def test_stream_sequence_state_survives_checkpoint_restart(spark, tmp_path):
    """North rule: resumable from checkpoint. A pattern whose symbols
    span an engine RESTART must still match — the unconsumed buffer
    persists in the state store."""
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    schema = "conv_id string, turn_idx int, role string, ts_str string"

    def write(rows):
        (
            spark.createDataFrame(rows, schema)
            .select("conv_id", "turn_idx", "role", F.to_timestamp("ts_str").alias("ts"))
            .coalesce(1)
            .write.mode("append")
            .parquet(in_dir)
        )

    def run():
        stream = (
            spark.readStream.schema(
                "conv_id string, turn_idx int, role string, ts timestamp"
            ).parquet(in_dir)
        )
        out = cep.stream_sequence_match(
            stream, "at{2}", cep.symbols_from_map(F.col("role"), ROLE_SYMS)
        )
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write([("c1", 0, "assistant", _ts(0)), ("c1", 1, "tool", _ts(60))])
    run()
    write([("c1", 2, "tool", _ts(120))])
    run()  # fresh query, same checkpoint + state store
    rows = sorted(
        spark.read.parquet(out_dir).collect(), key=lambda r: r.seq_len
    )
    assert [(r.seq_len, r.n_matches, r.first_match_idx) for r in rows] == [
        (2, 0, None),
        (3, 1, 0),  # the 'att' completed by the post-restart turn
    ]


def test_stream_anchor_rejected(spark):
    df = spark.createDataFrame([("c", 0, "user")], "conv_id string, turn_idx int, role string")
    with pytest.raises(ValueError, match="anchor"):
        cep.stream_sequence_match(
            df, "^at", cep.symbols_from_map(F.col("role"), SYMS)
        )


# --------------------------------------------------------------------------
# sequential pattern mining
# --------------------------------------------------------------------------


def _sp_turns(spark, convs):
    """convs: {conv_id: [state, state, ...]} — turn_idx = position."""
    rows = [
        (cv, i, s) for cv, seq in convs.items() for i, s in enumerate(seq)
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx long, role string")


def _sp(spark, convs, **kw):
    from osprey_spark.operators.cep import sequential_patterns

    out = sequential_patterns(_sp_turns(spark, convs), **kw)
    return {
        r["pattern"]: (r["length"], r["support"], r["share"]) for r in out.collect()
    }


def test_seq_patterns_gap_allowed_existence(spark):
    """u>t supported with a gap (u,a,t); one count per conversation
    no matter how many embeddings of the pattern exist."""
    got = _sp(
        spark,
        {
            "c1": ["u", "a", "t"],
            "c2": ["u", "u", "t", "t"],
            "c3": ["t", "u"],
        },
        min_support=1,
    )
    # u>t in c1 (gap) and c2 (multiple embeddings) but NOT c3 (order)
    assert got["u>t"] == (2, 2, round(2 / 3, 6))
    # t>u only in c3
    assert got["t>u"] == (2, 1, round(1 / 3, 6))


def test_seq_patterns_repeated_state_needs_two_occurrences(spark):
    """a>a requires two distinct occurrences (strict f<l); a>a>a
    requires a middle index strictly inside."""
    got = _sp(
        spark,
        {"c1": ["a"], "c2": ["a", "a"], "c3": ["a", "a", "a"]},
        min_support=1,
    )
    assert got["a>a"] == (2, 2, round(2 / 3, 6))  # c2, c3
    assert got["a>a>a"] == (3, 1, round(1 / 3, 6))  # only c3
    assert "a>a>a>a" not in got


def test_seq_patterns_three_step_strict_between(spark):
    """u>a>t needs an 'a' strictly between the first u and last t:
    ['a','u','t'] does NOT support it, ['u','a','t'] does."""
    got = _sp(
        spark,
        {"c1": ["a", "u", "t"], "c2": ["u", "a", "t"]},
        min_support=1,
    )
    assert got["u>a>t"] == (3, 1, round(1 / 2, 6))


def test_seq_patterns_min_support_and_topk_and_validation(spark):
    import pytest as _pt

    got = _sp(spark, {"c1": ["u", "a"], "c2": ["u", "a"]}, min_support=2)
    assert all(s >= 2 for (_l, s, _sh) in got.values())
    from osprey_spark.operators.cep import sequential_patterns

    with _pt.raises(ValueError):
        sequential_patterns(_sp_turns(spark, {"c": ["u"]}), min_support=0)
    with _pt.raises(ValueError):
        sequential_patterns(_sp_turns(spark, {"c": ["u"]}), k=0)

"""Sequence packing + dataset mixing — known-answer fixtures and
invariants (the driver oracle covers the testdata-scale replay)."""

from __future__ import annotations

import pytest

from osprey_spark.operators.packing import dataset_mixing, sequence_packing


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_sequence_packing_layout(spark):
    # one stream (n_streams=1, one source), budget 5; token counts
    # 3, 4, 5, 2 laid end-to-end -> starts 0, 3, 7, 12
    docs = _docs(
        spark,
        [
            (0, "a b c", "s"),
            (1, "d e f g", "s"),
            (2, "h i j k l", "s"),
            (3, "m n", "s"),
        ],
    )
    out = {
        r.doc_id: (r.pack_id, r.pack_offset, r.n_packs_spanned)
        for r in sequence_packing(docs, token_budget=5, n_streams=1).collect()
    }
    assert out == {
        0: (0, 0, 1),  # tokens [0,3) — fits pack 0
        1: (0, 3, 2),  # tokens [3,7) — crosses into pack 1
        2: (1, 2, 2),  # tokens [7,12) — crosses into pack 2
        3: (2, 2, 1),  # tokens [12,14)
    }


def test_sequence_packing_streams_are_independent(spark):
    # same docs, 2 streams: even/odd ids pack separately, both from 0
    docs = _docs(
        spark,
        [(i, "w x y", "s") for i in range(4)],  # 3 tokens each
    )
    out = {
        r.doc_id: (r.stream, r.pack_id, r.pack_offset)
        for r in sequence_packing(docs, token_budget=4, n_streams=2).collect()
    }
    # stream 0: ids 0,2 -> starts 0,3; stream 1: ids 1,3 -> starts 0,3
    assert out == {0: (0, 0, 0), 2: (0, 0, 3), 1: (1, 0, 0), 3: (1, 0, 3)}


def test_sequence_packing_empty_doc_and_validation(spark):
    docs = _docs(spark, [(0, "", "s"), (1, "a b", "s")])
    out = {
        r.doc_id: (r.n_tokens, r.n_packs_spanned)
        for r in sequence_packing(docs, token_budget=8, n_streams=1).collect()
    }
    assert out == {0: (0, 0), 1: (2, 1)}
    with pytest.raises(ValueError, match="token_budget"):
        sequence_packing(docs, token_budget=0)


def test_sequence_packing_offsets_within_budget(spark):
    docs = _docs(
        spark,
        [(i, " ".join(["t"] * (1 + i % 7)), f"src{i % 3}") for i in range(60)],
    )
    rows = sequence_packing(docs, token_budget=6, n_streams=2).collect()
    assert len(rows) == 60
    for r in rows:
        assert 0 <= r.pack_offset < 6
        assert r.n_packs_spanned >= 1
        # a doc that fits the remaining budget must not span
        if r.pack_offset + r.n_tokens <= 6:
            assert r.n_packs_spanned == 1


def test_dataset_mixing_weight_semantics(spark):
    docs = spark.createDataFrame(
        [(i, "x", ["en", "de", "fr", "zh"][i % 4]) for i in range(400)],
        "doc_id long, text string, lang string",
    )
    out = dataset_mixing(
        docs, {"en": 0.5, "de": 2.0, "fr": 0.0, "zh": 1.0}
    ).collect()
    by_lang: dict = {}
    copies: dict = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
        copies[(r.doc_id, r.copy)] = copies.get((r.doc_id, r.copy), 0) + 1
    assert "fr" not in by_lang  # weight 0 drops the stratum
    assert len(by_lang["zh"]) == 100  # weight 1 passes through
    # weight 2.0: every de doc exactly twice
    de_rows = [r for r in out if r.lang == "de"]
    assert len(de_rows) == 200 and {r.copy for r in de_rows} == {1, 2}
    # weight 0.5: a deterministic ~half of en docs (md5 bucket)
    n_en = len(by_lang["en"])
    assert 30 <= n_en <= 70
    # deterministic: second run identical
    out2 = dataset_mixing(docs, {"en": 0.5, "de": 2.0, "fr": 0.0, "zh": 1.0}).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # no duplicate (doc, copy) rows
    assert all(v == 1 for v in copies.values())


def test_dataset_mixing_default_weight_and_validation(spark):
    docs = spark.createDataFrame(
        [(1, "x", "en"), (2, "x", "unlisted")], "doc_id long, text string, lang string"
    )
    out = dataset_mixing(docs, {"en": 2.0}, default_weight=1.0).collect()
    assert sorted((r.doc_id, r.copy) for r in out) == [(1, 1), (1, 2), (2, 1)]
    with pytest.raises(ValueError, match="negative"):
        dataset_mixing(docs, {"en": -1.0})


def test_global_shuffle_order_is_permutation_and_prefix_invariant(spark):
    from osprey_spark.operators.packing import global_shuffle_order

    docs = spark.createDataFrame([(i, "t") for i in range(97)], "doc_id long, text string")
    out = global_shuffle_order(docs).collect()
    # positions are exactly 1..N — a permutation, no gaps or dups
    assert sorted(r.position for r in out) == list(range(1, 98))
    # position = global rank of the md5 key, independent of grouping
    by_key = {r.doc_id: r.position for r in out}
    expected = {
        r.doc_id: rank + 1
        for rank, r in enumerate(sorted(out, key=lambda r: r.shuffle_key))
    }
    assert by_key == expected
    # a different prefix_len changes the plan, not the result
    out2 = global_shuffle_order(docs, prefix_len=2).collect()
    assert {r.doc_id: r.position for r in out2} == by_key
    # a different seed is a different permutation
    out3 = global_shuffle_order(docs, seed="epoch1").collect()
    assert {r.doc_id: r.position for r in out3} != by_key


def test_chunk_documents_overlap_and_tail(spark):
    """c=8, s=6: a 20-token doc chunks at starts 1/7/13 (the last
    chunk ends exactly at token 20, full size); a 21-token doc gets
    ceil((21-8)/6)+1 = 4 chunks at starts 1/7/13/19 with lengths
    8/8/8/3. Short docs yield one whole-doc chunk; empty docs none."""
    from osprey_spark.operators.packing import chunk_documents

    def words(n):
        return " ".join(f"w{i}" for i in range(1, n + 1))

    docs = spark.createDataFrame(
        [(1, words(20)), (2, words(21)), (3, words(5)), (4, "")],
        "doc_id long, text string",
    )
    out = {}
    for r in chunk_documents(docs, chunk_tokens=8, stride=6).collect():
        out.setdefault(r["doc_id"], []).append(r)
    for rows in out.values():
        rows.sort(key=lambda r: r["chunk_idx"])

    assert [(r["chunk_start"], r["chunk_len"]) for r in out[1]] == [
        (1, 8), (7, 8), (13, 8)
    ]
    assert [(r["chunk_start"], r["chunk_len"]) for r in out[2]] == [
        (1, 8), (7, 8), (13, 8), (19, 3)
    ]
    # overlap: chunk 1 of doc 1 repeats tokens w7,w8 from chunk 0
    assert out[1][0]["chunk_text"].split()[-2:] == ["w7", "w8"]
    assert out[1][1]["chunk_text"].split()[:2] == ["w7", "w8"]
    # the final chunk always reaches the last token
    assert out[1][-1]["chunk_text"].split()[-1] == "w20"
    assert out[2][-1]["chunk_text"].split()[-1] == "w21"
    # short doc: one whole-doc chunk; empty doc: absent
    assert [(r["chunk_start"], r["chunk_len"]) for r in out[3]] == [(1, 5)]
    assert 4 not in out


def test_chunk_documents_rejects_bad_stride(spark):
    from osprey_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, stride=9)


def test_weighted_sample_matches_python_aes(spark):
    """The engine's k-smallest of -ln(u)/w equals a verbatim Python
    A-ES replay of the same seeded md5 uniforms (exact ids, exact
    order), and repartitioning does not change the sample."""
    import hashlib
    import math

    from osprey_spark.operators.packing import weighted_sample

    rows = [(i, (i % 7) * 13 + 1) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = weighted_sample(docs, k=25).collect()
    got = [(r.doc_id, r.weight) for r in out]

    def key(i, w):
        h = int(hashlib.md5(f"ws1:{i}".encode()).hexdigest()[:15], 16)
        return -math.log((h + 1) / float(1 << 60)) / max(w, 1)

    exp = sorted(rows, key=lambda t: (key(t[0], t[1]), t[0]))[:25]
    assert got == [(i, max(w, 1)) for i, w in exp]
    out13 = weighted_sample(docs.repartition(13), k=25).collect()
    assert [(r.doc_id, r.weight) for r in out13] == got


def test_weighted_sample_weight_monotone_and_uniform_degenerate(spark):
    """Heavy rows dominate the draw (weight 100 vs 1), and with all
    weights equal the race degenerates to the plain seeded-uniform
    top-k by hash (-ln(u) smallest where u is largest)."""
    from pyspark.sql import functions as F

    from osprey_spark.operators.packing import weighted_sample

    rows = [(i, 100 if i % 2 == 0 else 1) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    picked = [r.doc_id for r in weighted_sample(docs, k=60).collect()]
    heavy = sum(1 for i in picked if i % 2 == 0)
    assert heavy >= 50  # deterministic draw; ~99:1 odds per pair

    flat = spark.createDataFrame([(i, 7) for i in range(100)], "doc_id long, n_chars long")
    got = [r.doc_id for r in weighted_sample(flat, k=10).collect()]
    base = (
        flat.select(
            "doc_id",
            F.conv(
                F.substring(F.md5(F.concat(F.lit("ws1:"), F.col("doc_id").cast("string"))), 1, 15),
                16,
                10,
            ).cast("long").alias("h"),
        )
        .orderBy(F.desc("h"), "doc_id")
        .limit(10)
        .collect()
    )
    assert got == [r.doc_id for r in base]


def test_weighted_sample_stratified_k_per_group(spark):
    """by='lang' takes exactly min(k, group size) per group and the
    per-group picks equal the global race restricted to that group."""
    from osprey_spark.operators.packing import weighted_sample

    rows = [(i, 5 + (i % 3), "en" if i < 30 else ("de" if i < 40 else "fr"))
            for i in range(44)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long, lang string")
    out = weighted_sample(docs, k=8, by="lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert len(by_lang["en"]) == 8 and len(by_lang["de"]) == 8
    assert len(by_lang["fr"]) == 4  # group smaller than k: take all
    for lang in ("en", "de"):
        solo = weighted_sample(docs.filter(f"lang = '{lang}'"), k=8).collect()
        assert sorted(r.doc_id for r in solo) == sorted(by_lang[lang])


def test_temperature_weights_known_answer_and_limits(spark):
    """alpha=0.5 over token counts 100/400: p ∝ (10, 20) → 1/3, 2/3;
    boost >1 for the low-resource stratum; alpha=1 degenerates to
    natural shares (boost 1.0); alpha out of range rejects."""
    import pytest
    from pyspark.sql import functions as F

    from osprey_spark.operators.packing import temperature_weights

    rows = [("a", "en", 100), ("b", "de", 400)]
    docs = spark.createDataFrame(rows, "doc_id string, lang string, n long")
    out = {
        r.lang: r
        for r in temperature_weights(
            docs, alpha=0.5, size_col=F.col("n")
        ).collect()
    }
    assert out["en"].n_tokens == 100 and out["de"].n_tokens == 400
    assert abs(out["en"].p_temp - round(1 / 3, 6)) < 1e-12
    assert abs(out["de"].p_temp - round(2 / 3, 6)) < 1e-12
    assert out["en"].boost == round((1 / 3) / 0.2, 4)  # upweighted
    assert out["de"].boost < 1.0
    flat = {
        r.lang: r
        for r in temperature_weights(docs, alpha=1.0, size_col=F.col("n")).collect()
    }
    assert flat["en"].p_temp == 0.2 and flat["en"].boost == 1.0
    with pytest.raises(ValueError):
        temperature_weights(docs, alpha=0.0)

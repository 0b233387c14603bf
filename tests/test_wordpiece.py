"""WordPiece training + greedy longest-match encode vs an independent
pure-Python reference (the HF-course statement of Schuster & Nakajima's
algorithm), plus the [UNK] path on unseen characters."""

from __future__ import annotations

from osprey_spark.operators.curation import wordpiece_encode, wordpiece_merges

# the HF course's WordPiece walkthrough corpus
WORD_COUNTS = {"hug": 10, "pug": 5, "pun": 12, "bun": 4, "hugs": 5}


def ref_train(word_counts, rounds):
    splits = {w: [w[0]] + ["##" + c for c in w[1:]] for w in word_counts}
    merges = []
    for r in range(1, rounds + 1):
        pair_counts: dict = {}
        sym_counts: dict = {}
        for w, c in word_counts.items():
            syms = splits[w]
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + c
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        # argmax score desc, ties lexicographic asc on (p1, p2) — the
        # identical double division the engine computes
        (p1, p2), cnt = min(
            pair_counts.items(),
            key=lambda kv: (
                -kv[1] / (sym_counts[kv[0][0]] * sym_counts[kv[0][1]]),
                kv[0],
            ),
        )
        merged = p1 + p2[2:]
        merges.append(
            (r, p1, p2, merged, cnt, sym_counts[p1], sym_counts[p2])
        )
        for w, syms in splits.items():
            out: list = []
            for s in syms:
                if out and out[-1] == p1 and s == p2:
                    out[-1] = merged
                else:
                    out.append(s)
            splits[w] = out
    return merges, splits


def ref_encode_word(w, vocab, max_consume):
    pos, toks = 0, []
    while pos < len(w):
        for j in range(min(max_consume, len(w) - pos), 0, -1):
            piece = w[pos : pos + j] if pos == 0 else "##" + w[pos : pos + j]
            if piece in vocab:
                toks.append(piece)
                pos += j
                break
        else:
            return None  # [UNK]
    return toks


def _docs(spark, word_counts):
    text = " ".join(w for w, c in sorted(word_counts.items()) for _ in range(c))
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_merges_match_reference(spark):
    got = [
        (r.round, r.p1, r.p2, r.merged, r.pair_count, r.p1_count, r.p2_count)
        for r in wordpiece_merges(_docs(spark, WORD_COUNTS), rounds=4).collect()
    ]
    expect, _ = ref_train(WORD_COUNTS, 4)
    assert got == expect
    # WordPiece's signature behavior: the first merge is NOT the most
    # frequent pair (BPE would pick ('##u','##g'), count 20) but the
    # best-scoring one
    assert (got[0][1], got[0][2]) != ("##u", "##g")


def test_encode_matches_reference_greedy(spark):
    rounds = 4
    merges, _ = ref_train(WORD_COUNTS, rounds)
    alphabet = {w[0] for w in WORD_COUNTS} | {
        "##" + c for w in WORD_COUNTS for c in w[1:]
    }
    vocab = alphabet | {m[3] for m in merges}
    max_consume = max(len(p) - 2 if p.startswith("##") else len(p) for p in vocab)
    out = wordpiece_encode(_docs(spark, WORD_COUNTS), rounds=rounds).collect()
    assert len(out) == 1
    exp_tokens = 0
    exp_chars = 0
    for w, c in WORD_COUNTS.items():
        toks = ref_encode_word(w, vocab, max_consume)
        assert toks is not None
        exp_tokens += len(toks) * c
        exp_chars += len(w) * c
    r = out[0]
    assert (r.n_wordpiece_tokens, r.n_unk_words, r.n_chars) == (
        exp_tokens,
        0,
        exp_chars,
    )


def test_unk_on_unseen_characters(spark):
    train = _docs(spark, WORD_COUNTS)
    enc = spark.createDataFrame(
        [(1, "hug zebra"), (2, "pun pun qat")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in wordpiece_encode(train, rounds=4, encode_docs=enc).collect()
    }
    # 'zebra' has chars outside the training alphabet -> 1 [UNK] token
    assert out[1].n_unk_words == 1
    assert out[2].n_unk_words == 1
    # an [UNK] word contributes exactly 1 token
    merges, _ = ref_train(WORD_COUNTS, 4)
    alphabet = {w[0] for w in WORD_COUNTS} | {
        "##" + c for w in WORD_COUNTS for c in w[1:]
    }
    vocab = alphabet | {m[3] for m in merges}
    mc = max(len(p) - 2 if p.startswith("##") else len(p) for p in vocab)
    assert out[1].n_wordpiece_tokens == len(ref_encode_word("hug", vocab, mc)) + 1
    assert (
        out[2].n_wordpiece_tokens
        == 2 * len(ref_encode_word("pun", vocab, mc)) + 1
    )

"""Property test: the distributed BPE trainer against an independent
pure-Python reference implementation of the Sennrich et al. (2016)
algorithm (get_stats / merge_vocab, written here from the paper's
pseudocode) on random small corpora.

Spark sessions are expensive, so hypothesis drives corpus generation
via random.Random seeds inside ONE test body rather than @given (same
pattern cost-wise as the deterministic loops in test_properties)."""

from __future__ import annotations

import random
import re


def _ref_bpe(word_counts: dict[str, int], rounds: int):
    """Reference BPE: symbols per word, most-frequent adjacent pair
    (ties: lexicographic), greedy left-to-right merge."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for r in range(1, rounds + 1):
        stats: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                stats[pair] = stats.get(pair, 0) + c
        if not stats:
            break
        # max count, then lexicographically smallest pair
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (p1, p2), cnt = best
        merges.append((r, p1, p2, p1 + p2, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == p1 and syms[i + 1] == p2:
                    out.append(p1 + p2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges, vocab


def test_bpe_matches_reference_on_random_corpora(spark):
    from osprey_spark.operators.curation import bpe_encode, bpe_merges

    alphabet = "abcd"
    for seed in range(8):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 12))
        ]
        text = " ".join(
            w for w in words for _ in range(rng.randint(1, 5))
        )
        counts: dict[str, int] = {}
        for w in re.split(r"[\W_]+", text.lower()):
            if w:
                counts[w] = counts.get(w, 0) + 1
        rounds = rng.randint(1, 5)
        want_merges, want_vocab = _ref_bpe(counts, rounds)

        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = bpe_merges(docs, rounds=rounds)
        got = [(r.round, r.p1, r.p2, r.merged, r.pair_count) for r in out.collect()]
        out.unpersist_base()
        assert got == want_merges, f"seed {seed}: merges diverge"

        # encode parity: per-doc BPE token count == sum over words of
        # final-segmentation length x occurrences
        enc = bpe_encode(docs, rounds=rounds)
        row = enc.collect()[0]
        enc.unpersist_base()
        seg_len = {"".join(syms): len(syms) for syms in want_vocab}
        want_tokens = sum(seg_len[w] * c for w, c in counts.items())
        assert row.n_bpe_tokens == want_tokens, f"seed {seed}: encode diverges"

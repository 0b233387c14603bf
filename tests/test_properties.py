"""Property-based tests (hypothesis) for the hand-rolled primitives.

The reference has no property tests (SURVEY §5); these cover the
places where a from-scratch implementation could silently diverge:
the vectorized murmur3 (vs an independent scalar reference
implementation written here), and the lossless prunes (prefix filter)
against brute force on random corpora.
"""

from __future__ import annotations

import random
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from osprey_spark.functions.mmh3 import murmur3_32


def _murmur3_32_scalar(data: bytes, seed: int = 0) -> int:
    """Independent straight-line reference implementation of the
    public MurmurHash3 x86-32 algorithm (Austin Appleby), kept
    deliberately naive: per-4-byte loop, no numpy."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    nblocks = len(data) // 4
    for i in range(nblocks):
        (k,) = struct.unpack_from("<I", data, i * 4)
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[nblocks * 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=64), st.integers(min_value=0, max_value=2**32 - 1))
def test_vectorized_murmur3_matches_scalar_reference(s, seed):
    assert int(murmur3_32([s], seed=seed)[0]) == _murmur3_32_scalar(s.encode("utf-8"), seed)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=24), min_size=1, max_size=40),
       st.integers(min_value=0, max_value=2**31))
def test_vectorized_murmur3_batch_consistency(strings, seed):
    """Batched hashing must equal element-wise hashing (the fixed-width
    byte-matrix path has per-batch maxlen — padding must not leak)."""
    batch = murmur3_32(strings, seed=seed)
    assert [int(x) for x in batch] == [int(murmur3_32([s], seed=seed)[0]) for s in strings]


def test_prefix_filter_lossless_on_random_corpora(spark):
    """AllPairs/PPJoin prune: for random word-soup corpora (including
    shared boilerplate), the prefix-filtered join must return exactly
    the brute-force Jaccard pairs."""
    from pyspark.sql import functions as F

    from osprey_spark.operators import dedup

    vocab = [f"w{i}" for i in range(12)]
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        docs = []
        for i in range(40):
            n = rng.randint(3, 12)
            words = [rng.choice(vocab) for _ in range(n)]
            if i % 4 == 0:
                words = ["common", "boiler", "plate"] + words
            docs.append((i, " ".join(words)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in dedup.ngram_jaccard_pairs(df, threshold=0.4, k=2).collect()
        }
        sh = dedup.shingles(F.col("text"), 2)
        b = df.select(F.col("doc_id").alias("_id"), sh.alias("_sh"))
        x, y = b.alias("x"), b.alias("y")
        inter = F.size(F.array_intersect(F.col("x._sh"), F.col("y._sh")))
        union = F.size(F.col("x._sh")) + F.size(F.col("y._sh")) - inter
        want = {
            (r.id_a, r.id_b, r.jaccard)
            for r in x.join(y, F.col("x._id") < F.col("y._id"))
            .select(
                F.col("x._id").alias("id_a"),
                F.col("y._id").alias("id_b"),
                F.round(inter.cast("double") / union, 6).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= 0.4)
            .collect()
        }
        assert got == want, f"seed {seed}: prefix filter lost/added pairs"


def test_pii_scrub_idempotent_and_clean(spark):
    """Property: scrubbing is idempotent (scrub(scrub(x)) == scrub(x))
    and a scrubbed text matches none of the PII patterns — on random
    texts mixing PII shapes with near-miss lookalikes."""
    import re as _re

    from pyspark.sql import functions as F

    from osprey_spark.operators.curation import PII_PATTERNS, pii_scrub_col

    rng = random.Random(13)
    pieces = [
        "hello", "a@b", "x.y", "user@example.com", "1.2.3.4", "999.1.2.3",
        "+1 555 123 4567", "v1.2.3.4.5", "no-at-sign.com", "a@b.co",
        "+12", "call +44 20 7946 0958 now", "127.0.0.1:8080", "..", "@",
    ]
    rows = [
        (i, " ".join(rng.choice(pieces) for _ in range(rng.randint(1, 8))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    once = df.select("i", pii_scrub_col(F.col("text")).alias("s1"))
    twice = once.select("i", "s1", pii_scrub_col(F.col("s1")).alias("s2"))
    out = twice.collect()
    for r in out:
        assert r.s1 == r.s2, f"not idempotent: {r.s1!r} -> {r.s2!r}"
        for cat, (pat, _repl) in PII_PATTERNS.items():
            assert not _re.search(pat, r.s1.replace("<EMAIL>", "").replace("<IP>", "").replace("<PHONE>", "")), (cat, r.s1)


def test_repetition_signals_bounds(spark):
    """Property: every repetition signal lies in (0, 1], and
    single-token docs hit the defined edge values."""
    from osprey_spark.operators.curation import repetition_signals

    rng = random.Random(99)
    vocab = [f"t{i}" for i in range(6)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
            for i in range(150)]
    rows.append((999, "solo"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in repetition_signals(df).collect():
        assert 0 < r.top_unigram_frac <= 1
        assert 0 < r.top_bigram_frac <= 1
        assert 0 < r.distinct_token_ratio <= 1
        if r.doc_id == 999:
            assert (r.top_unigram_frac, r.top_bigram_frac, r.distinct_token_ratio) == (1.0, 1.0, 1.0)


def test_decontaminate_exact_vs_bruteforce(spark):
    """Property: the broadcast shingle join returns exactly the docs a
    brute-force any-shared-k-gram check finds, with exact hit counts."""
    from pyspark.sql import functions as F

    from osprey_spark.operators import dedup
    from osprey_spark.operators.curation import decontaminate

    vocab = [f"w{i}" for i in range(10)]
    for seed in (3, 21):
        rng = random.Random(seed)
        mk = lambda n: " ".join(rng.choice(vocab) for _ in range(n))
        docs = [(i, mk(rng.randint(4, 14))) for i in range(30)]
        bench = [(100 + i, mk(rng.randint(4, 10))) for i in range(5)]
        ddf = spark.createDataFrame(docs, "doc_id long, text string")
        bdf = spark.createDataFrame(bench, "doc_id long, text string")
        got = {(r.doc_id, r.n_hit_shingles) for r in decontaminate(ddf, bdf, k=3).collect()}
        # brute force in python
        def sh(text):
            w = [t for t in text.lower().split(" ") if t]
            if len(w) <= 3:
                return {" ".join(w)}
            return {" ".join(w[i:i+3]) for i in range(len(w) - 2)}
        bench_sh = set().union(*[sh(t) for _, t in bench])
        want = set()
        for i, t in docs:
            hits = len(sh(t) & bench_sh)
            if hits:
                want.add((i, hits))
        assert got == want, f"seed {seed}"


@given(
    s=st.text(alphabet="uast", max_size=200),
    splits=st.lists(st.integers(min_value=0, max_value=200), max_size=8),
    pat=st.sampled_from(["at", "at{2}", "a[ts]t", "ut", "ss", "a[ts][ts]"]),
)
@settings(max_examples=300, deadline=None)
def test_incremental_matcher_split_invariant(s, splits, pat):
    """The streaming CEP consume loop (cep.consume_matches) is
    split-invariant for fixed-length patterns: ANY chunking of the
    symbol string yields the same n_matches / first_match_idx as the
    batch regex (non-overlapping leftmost findall)."""
    import re

    from osprey_spark.operators.cep import consume_matches

    rx = re.compile(pat)
    bounds = sorted({min(x, len(s)) for x in splits} | {0, len(s)})
    chunks = [s[a:b] for a, b in zip(bounds, bounds[1:])]

    buf, base, n, first = "", 0, 0, -1
    for ch in chunks:
        buf, base, n, first = consume_matches(rx, buf + ch, base, n, first)

    want_n = len(rx.findall(s))
    m = rx.search(s)
    want_first = m.start() if m else -1
    assert (n, first) == (want_n, want_first)

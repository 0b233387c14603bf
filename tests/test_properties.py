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

"""Vectorized MurmurHash3 x86 32-bit for Experiment bucket parity.

The reference buckets entities with ``mmh3.hash(f'{name}/{id}',
seed=42, signed=False) % 10000`` (ref: stdlib/udfs/experiments.py
:156-158, HASH_SEED at :23). MurmurHash3 is a public-domain algorithm
(Austin Appleby); this is a from-scratch numpy implementation that
processes a whole Arrow batch at once: strings become a fixed-width
byte matrix, the 4-byte block mix runs as column-sliced uint32 ops
(wrap-around multiplication is numpy's native unsigned behavior), so
per-row cost is a handful of SIMD-able array ops, not a Python loop.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_U5 = np.uint32(5)
_N1 = np.uint32(0xE6546B64)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def murmur3_32(strings, seed: int = 0) -> np.ndarray:
    """murmur3 x86_32 of each utf-8 string, unsigned, vectorized."""
    data = [s.encode("utf-8") if isinstance(s, str) else bytes(s or b"") for s in strings]
    n = len(data)
    if n == 0:
        return np.zeros(0, np.uint32)
    lengths = np.fromiter((len(b) for b in data), np.int64, n)
    maxlen = max(int(lengths.max()), 4)
    mat = np.frombuffer(
        np.array(data, dtype=f"S{maxlen}").tobytes(), dtype=np.uint8
    ).reshape(n, maxlen)

    h = np.full(n, np.uint32(seed), np.uint32)
    nblocks = lengths // 4
    for i in range(int(nblocks.max())):
        o = 4 * i
        k = (
            mat[:, o].astype(np.uint32)
            | (mat[:, o + 1].astype(np.uint32) << np.uint32(8))
            | (mat[:, o + 2].astype(np.uint32) << np.uint32(16))
            | (mat[:, o + 3].astype(np.uint32) << np.uint32(24))
        )
        k = _rotl(k * _C1, 15) * _C2
        h2 = _rotl(h ^ k, 13) * _U5 + _N1
        h = np.where(nblocks > i, h2, h)

    # tail: the trailing len % 4 bytes, gathered per row
    rem = (lengths % 4).astype(np.int64)
    start = np.minimum(4 * nblocks, maxlen - 1)

    def byte_at(j):
        idx = np.minimum(start + j, maxlen - 1)
        return np.take_along_axis(mat, idx[:, None], 1)[:, 0].astype(np.uint32)

    k = np.zeros(n, np.uint32)
    k ^= np.where(rem >= 3, byte_at(2) << np.uint32(16), np.uint32(0))
    k ^= np.where(rem >= 2, byte_at(1) << np.uint32(8), np.uint32(0))
    k ^= np.where(rem >= 1, byte_at(0), np.uint32(0))
    k = _rotl(k * _C1, 15) * _C2
    h = np.where(rem > 0, h ^ k, h)

    h ^= lengths.astype(np.uint32)
    h ^= h >> np.uint32(16)
    h *= np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h *= np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h


def hash_mod(experiment_name: str, entity_ids, seed: int = 42, granularity: int = 10000) -> np.ndarray:
    """The reference's Experiment.hash_mod, batched over entity ids."""
    keys = [f"{experiment_name}/{e}" if e is not None else None for e in entity_ids]
    mask = np.array([k is None for k in keys])
    out = murmur3_32([k or "" for k in keys], seed=seed) % np.uint32(granularity)
    return np.where(mask, -1, out.astype(np.int64))

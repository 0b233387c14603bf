"""Property tests for the new round-3 operators against pure-Python
references on random inputs (seeded random.Random inside one test
body — the cost pattern test_bpe_properties documents)."""

from __future__ import annotations

import random
import string

import pyspark.sql.functions as F

from osprey_spark.operators.curation import wordpiece_merges
from osprey_spark.operators.sketches import drift_metrics, py_drift_metrics, py_hist_bin
from tests.test_wordpiece import ref_train


def _random_word_counts(rng: random.Random) -> dict[str, int]:
    n = rng.randint(3, 8)
    out = {}
    for _ in range(n):
        w = "".join(rng.choice("abcd") for _ in range(rng.randint(1, 5)))
        out[w] = rng.randint(1, 9)
    return out


def test_wordpiece_trainer_matches_reference_on_random_corpora(spark):
    for seed in range(6):
        rng = random.Random(1000 + seed)
        wc = _random_word_counts(rng)
        rounds = rng.randint(1, 4)
        text = " ".join(w for w, c in sorted(wc.items()) for _ in range(c))
        docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
        got = [
            (r.round, r.p1, r.p2, r.merged, r.pair_count, r.p1_count, r.p2_count)
            for r in wordpiece_merges(docs, rounds=rounds).collect()
        ]
        expect, _ = ref_train(wc, rounds)
        assert got == expect, f"seed {seed}: {got} != {expect}"


def test_drift_properties_random(spark):
    """PSI >= 0 (every add-one term is (p-q)ln(p/q) >= 0), KS in
    [0,1], symmetry under period swap, and exact agreement with the
    pure-Python replay."""
    for seed in range(5):
        rng = random.Random(2000 + seed)
        ref = [rng.randint(1, 500) for _ in range(rng.randint(5, 60))]
        cur = [rng.randint(1, 2000) for _ in range(rng.randint(5, 60))]
        rows = [("g", v, False) for v in ref] + [("g", v, True) for v in cur]
        df = spark.createDataFrame(rows, "grp string, v long, cur boolean")
        r = drift_metrics(df, F.col("v"), F.col("cur"), ["grp"]).collect()[0]
        assert r.psi >= 0.0 and 0.0 <= r.ks <= 1.0, (seed, r)
        rb = {}
        cb = {}
        for v in ref:
            rb[py_hist_bin(v)] = rb.get(py_hist_bin(v), 0) + 1
        for v in cur:
            cb[py_hist_bin(v)] = cb.get(py_hist_bin(v), 0) + 1
        rn, cn, nb, psi, ks = py_drift_metrics(rb, cb)
        assert (r.ref_n, r.cur_n, r.n_bins, r.psi, r.ks) == (rn, cn, nb, psi, ks)
        # swap: PSI and KS are symmetric in the two periods
        df2 = spark.createDataFrame(
            [(g, v, not c) for (g, v, c) in rows], "grp string, v long, cur boolean"
        )
        r2 = drift_metrics(df2, F.col("v"), F.col("cur"), ["grp"]).collect()[0]
        assert r2.psi == r.psi and r2.ks == r.ks, seed

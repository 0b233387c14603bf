"""Experiment mmh3 bucket parity (ref: stdlib/udfs/experiments.py:156-158).

Anchors: public murmur3-x86-32 test vectors plus the reference's own
test value — Experiment.hash_mod('E1', 'ID1') == 8548
(ref: stdlib/udfs/tests/test_experiments.py:30-38).
"""

from __future__ import annotations

from osprey_spark.compiler import compile_ruleset
from osprey_spark.functions.mmh3 import hash_mod, murmur3_32

VECTORS = [
    ("", 0, 0x00000000),
    ("", 1, 0x514E28B7),
    ("test", 0, 0xBA6BD213),
    ("Hello, world!", 0, 0xC0363E43),
    ("The quick brown fox jumps over the lazy dog", 0, 0x2E4FF723),
    ("abc", 0, 0xB3DD93FA),
]


def test_murmur3_public_vectors():
    got = murmur3_32([s for s, _, _ in VECTORS if _ == _], seed=0)
    for s, seed, want in VECTORS:
        assert int(murmur3_32([s], seed=seed)[0]) == want, s


def test_reference_hash_mod_anchor():
    assert hash_mod("E1", ["ID1"]).tolist() == [8548]
    # batched + null handling
    assert hash_mod("E1", ["ID1", None, "ID1"]).tolist() == [8548, -1, 8548]


def test_experiment_parity_end_to_end(spark):
    sml = """
U: Entity[str] = EntityJson(type='U', path='$.u')
Exp = Experiment(entity=U, name='E1', buckets=['control', 'treat'],
                 bucket_sizes=[5000, 5000], parity=True)
"""
    rs = compile_ruleset({"main.sml": sml})
    ids = ["ID1", "ID2", "ID3", "user_a", "user_b", "user_c"]
    rows = [(i, "act", '{"u": "%s"}' % u, "2024-01-01 00:00:00") for i, u in enumerate(ids)]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "action_id long, action_name string, data string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["__action_id"]: r["Exp"] for r in rs.apply(df).collect()}
    want_points = hash_mod("E1", ids)
    for i, (u, p) in enumerate(zip(ids, want_points)):
        expect = "control" if p < 5000 else "treat"
        assert out[i] == expect, (u, p, out[i])
    # ID1 point is 8548 -> treat, pinned against the reference test value
    assert out[0] == "treat"

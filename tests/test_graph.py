"""Integer-exact PageRank (operators/graph.py): known-answer on a
tiny star graph, bit-reproducibility across partitionings (the point
of integer floor-division contributions), and persist hygiene."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from osprey_spark.operators.graph import RANK_SCALE, khop_distance, pagerank


def _star_edges(spark, leaves=4):
    """Undirected star: hub h ↔ leaves l1..lN."""
    rows = []
    for i in range(1, leaves + 1):
        rows.append(("h", f"l{i}"))
        rows.append((f"l{i}", "h"))
    return spark.createDataFrame(rows, "src string, dst string")


def test_pagerank_star_known_answer(spark):
    """One round on the star by hand: hub deg=4, leaf deg=1.
    r0 = S everywhere. After round 1:
    leaf = teleport + (S*85) DIV (100*4)  (one in-edge from hub)
    hub  = teleport + 4 * ((S*85) DIV 100)  (four in-edges from leaves)
    """
    S = RANK_SCALE
    tel = round(0.15 * S)
    out = {
        r["node"]: r["rank"]
        for r in pagerank(_star_edges(spark), rounds=1).collect()
    }
    assert out["h"] == tel + 4 * ((S * 85) // 100)
    for i in range(1, 5):
        assert out[f"l{i}"] == tel + (S * 85) // (100 * 4)
    # hub dominates
    assert out["h"] > out["l1"]


def test_pagerank_partition_independent(spark):
    """Long sums + integer floor divisions: the exact same longs at
    any partitioning. A float implementation would fail this test."""
    e = _star_edges(spark, leaves=7)
    a = {r["node"]: r["rank"] for r in pagerank(e.repartition(1), rounds=4).collect()}
    b = {r["node"]: r["rank"] for r in pagerank(e.repartition(13), rounds=4).collect()}
    assert a == b


def test_pagerank_rejects_bad_damping(spark):
    with pytest.raises(ValueError):
        pagerank(_star_edges(spark), damping_pct=100)


def test_khop_distance_chain(spark):
    """Chain a-b-c-d (undirected), seed {a}: hops are exact shortest
    distances and nodes beyond k are absent."""
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    edges = spark.createDataFrame(
        pairs + [(y, x) for x, y in pairs], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    out = {r["node"]: r["hops"] for r in khop_distance(edges, seeds, k=2).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}  # d is 3 hops away -> absent


def test_khop_distance_min_over_multiple_seeds(spark):
    """Two seeds, shared neighbor: min distance wins; a seed stays 0
    even if another seed can reach it."""
    pairs = [("a", "m"), ("z", "m"), ("a", "z")]
    edges = spark.createDataFrame(
        pairs + [(y, x) for x, y in pairs], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",), ("z",)], "node string")
    out = {r["node"]: r["hops"] for r in khop_distance(edges, seeds, k=2).collect()}
    assert out == {"a": 0, "z": 0, "m": 1}


def test_khop_rejects_bad_k(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError):
        khop_distance(edges, seeds, k=0)


def test_pagerank_releases_edge_persist(spark):
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = pagerank(_star_edges(spark), rounds=2)
    out.collect()
    out.unpersist_base()
    # back to the pre-call level (the session fixture may carry other
    # tests' persists; blocking unpersist makes this race-free)
    assert jsc.getPersistentRDDs().size() <= before

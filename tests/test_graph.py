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


def test_cooccurrence_counts_and_canonical_order(spark):
    """Known-answer: 3 users over 4 items — pair counts are exact,
    pairs are canonical (a < b), min_count prunes singletons."""
    from osprey_spark.operators.graph import cooccurrence

    rows = [
        ("u1", "a"), ("u1", "b"), ("u1", "c"),
        ("u2", "a"), ("u2", "b"),
        ("u3", "b"), ("u3", "d"),
    ]
    pairs = spark.createDataFrame(rows, "user string, item string")
    out = {(r.item_a, r.item_b): r.n_users
           for r in cooccurrence(pairs, cap=20, min_count=2).collect()}
    assert out == {("a", "b"): 2}  # (a,c),(b,c),(b,d) have 1 user each
    all_pairs = {(r.item_a, r.item_b): r.n_users
                 for r in cooccurrence(pairs, cap=20, min_count=1).collect()}
    assert all_pairs == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1, ("b", "d"): 1}
    assert all(a < b for a, b in all_pairs)


def test_cooccurrence_cap_bounds_power_user_fanout(spark):
    """A power user with 40 items contributes exactly C(cap,2) pairs,
    the cap subsample is deterministic, and validation rejects cap<2."""
    import pytest

    from osprey_spark.operators.graph import cooccurrence

    rows = [("power", f"i{j:02d}") for j in range(40)]
    pairs = spark.createDataFrame(rows, "user string, item string")
    out = cooccurrence(pairs, cap=5, min_count=1).collect()
    assert len(out) == 10  # C(5,2)
    again = cooccurrence(pairs.repartition(7), cap=5, min_count=1).collect()
    assert sorted((r.item_a, r.item_b) for r in again) == sorted(
        (r.item_a, r.item_b) for r in out
    )
    with pytest.raises(ValueError):
        cooccurrence(pairs, cap=1)


def test_skew_profile_known_answer(spark):
    """10+5+1 rows over 3 keys: shares, mean, max and skew ratio are
    the hand-computed values; heavy list respects top."""
    from osprey_spark.plans.analytics import skew_profile

    rows = [("hot",)] * 10 + [("warm",)] * 5 + [("cold",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = skew_profile(df, ["k"], p=0.5, top=2).orderBy("n", ascending=False).collect()
    assert [(r.k, r.n) for r in out] == [("hot", 10), ("warm", 5)]
    r = out[0]
    assert r.total_rows == 16 and r.distinct_keys == 3 and r.max_per_key == 10
    assert r.share_pct == 62.5
    assert abs(r.mean_per_key - 5.33) < 1e-9
    assert r.pq_per_key == 5.0  # median of (1, 5, 10)
    assert abs(r.skew_ratio - 1.88) < 1e-9  # 10 / (16/3)


def test_triangle_count_known_answer(spark):
    from osprey_spark.operators.graph import triangle_count

    # K4 on {a,b,c,d} (4 triangles, each node in 3) plus a pendant
    # edge d-e (e closes nothing) and a disconnected pair f-g
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("f", "g"),
        ("b", "a"),  # duplicate in reverse orientation: must dedupe
    ]
    df = spark.createDataFrame(edges, "a string, b string")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    assert sum(got.values()) // 3 == 4  # global count


def test_triangle_count_partition_invariant(spark):
    from osprey_spark.operators.graph import triangle_count

    import itertools

    nodes = [f"n{i}" for i in range(12)]
    # deterministic quasi-random graph
    edges = [
        (u, v)
        for u, v in itertools.combinations(nodes, 2)
        if (hash(None) or True) and ((ord(u[-1]) * 7 + ord(v[-1]) * 13) % 3 == 0)
    ]
    df = spark.createDataFrame(edges, "a string, b string")
    a = triangle_count(df.repartition(1)).collect()
    b = triangle_count(df.repartition(9)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kcore_peels_to_clique(spark):
    """3-core keeps exactly the K4; 2-core keeps K4 + the separate
    triangle; the pendant chain always peels away."""
    from osprey_spark.operators.graph import kcore

    und = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"),                      # K4
        ("d", "e"), ("e", "f"),          # pendant chain
        ("x", "y"), ("y", "z"), ("x", "z"),  # triangle
    ]
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src string, dst string")
    core3 = kcore(edges, k=3)
    assert sorted((r.node, r.deg) for r in core3.collect()) == [
        ("a", 3), ("b", 3), ("c", 3), ("d", 3)
    ]
    core3.unpersist_base()
    core2 = kcore(edges, k=2)
    assert {r.node for r in core2.collect()} == {"a", "b", "c", "d", "x", "y", "z"}
    core2.unpersist_base()
    # k above max degree -> empty core, schema intact
    core9 = kcore(edges, k=9)
    assert core9.count() == 0 and core9.columns == ["node", "deg"]
    core9.unpersist_base()


def test_kcore_warns_on_round_exhaustion(spark):
    """A path graph peels one layer per round under k=2; max_rounds=1
    leaves it unconverged and must warn."""
    import warnings

    from osprey_spark.operators.graph import kcore

    path = [(f"n{i}", f"n{i+1}") for i in range(8)]
    sym = path + [(b, a) for a, b in path]
    edges = spark.createDataFrame(sym, "src string, dst string")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = kcore(edges, k=2, max_rounds=1)
        n = out.count()
        out.unpersist_base()
    assert any("fixpoint not reached" in str(w.message) for w in caught)
    assert n > 0  # partially peeled remnant, larger than the true core
    # converged run: a pure path has NO 2-core at all
    full = kcore(edges, k=2)
    assert full.count() == 0
    full.unpersist_base()


def _lpa_python(sym_edges, rounds):
    """Pure-Python replica of graph.lpa's synchronous semantics:
    neighbor votes + one self-vote, argmax by (count desc, label asc)."""
    from collections import Counter, defaultdict

    nbrs = defaultdict(list)
    for a, b in sym_edges:
        nbrs[a].append(b)
    lbl = {n: n for n in nbrs}
    for _ in range(rounds):
        nxt = {}
        for n in nbrs:
            votes = Counter(lbl[m] for m in nbrs[n])
            votes[lbl[n]] += 1
            nxt[n] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lbl = nxt
    return lbl


def test_lpa_two_cliques_one_bridge(spark):
    """Two K4s joined by a single bridge edge resolve to two
    communities — the partition connected components cannot give
    (one component) and k-core cannot give (both survive a 3-core)."""
    from osprey_spark.operators.graph import lpa

    und = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
        ("w", "x"), ("w", "y"), ("w", "z"), ("x", "y"), ("x", "z"), ("y", "z"),
        ("d", "w"),  # bridge
    ]
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src string, dst string")
    out = lpa(edges, rounds=4)
    got = {r.node: r.community for r in out.collect()}
    out.unpersist_base()
    assert got == _lpa_python(sym, 4)
    assert got["a"] == got["b"] == got["c"] == got["d"] == "a"
    assert got["w"] == got["x"] == got["y"] == got["z"] == "w"


def test_lpa_tie_breaks_to_min_label(spark):
    """Single edge p–q: round 1 is a 1-1 vote tie at both endpoints;
    min label wins, so both land in community 'p'."""
    from osprey_spark.operators.graph import lpa

    edges = spark.createDataFrame(
        [("p", "q"), ("q", "p")], "src string, dst string"
    )
    out = lpa(edges, rounds=2)
    got = {r.node: r.community for r in out.collect()}
    out.unpersist_base()
    assert got == {"p": "p", "q": "p"}


def test_lpa_matches_python_replica_and_releases_state(spark):
    """Fixed irregular graph: Spark == the pure-Python synchronous
    replica at every round count, and unpersist_base drops both the
    edge persist and the final checkpoint blocks."""
    from osprey_spark.operators.graph import lpa

    und = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("c", "d"), ("d", "e"), ("e", "f"), ("f", "d"),
        ("g", "a"), ("h", "e"), ("h", "f"),
    ]
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src string, dst string")
    for rounds in (1, 2, 5):
        out = lpa(edges, rounds=rounds)
        got = {r.node: r.community for r in out.collect()}
        out.unpersist_base()
        assert got == _lpa_python(sym, rounds), f"rounds={rounds}"
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    before = len(jmap.keySet().toArray())
    out = lpa(edges, rounds=3)
    out.count()
    out.unpersist_base()
    after = len(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after <= before


def test_lpa_rejects_bad_rounds(spark):
    from osprey_spark.operators.graph import lpa

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match=">= 1"):
        lpa(edges, rounds=0)


# --- eigenvector centrality ---------------------------------------------------


def _sym_edges(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src string, dst string")


def test_eigencentrality_star_hub_dominates(spark):
    """A star: the hub pins at scale; leaves all tie below it; a
    degree-1 node attached to the hub outscores members of a
    separate triangle (the no-vote-splitting property)."""
    from osprey_spark.operators.graph import eigencentrality

    star = [("hub", f"leaf{i}") for i in range(6)]
    tri = [("t1", "t2"), ("t2", "t3"), ("t3", "t1")]
    out = eigencentrality(_sym_edges(spark, star + tri), rounds=8)
    got = {r.node: r.score for r in out.collect()}
    out.unpersist_base()
    assert got["hub"] == max(got.values())
    leaf_scores = {got[f"leaf{i}"] for i in range(6)}
    assert len(leaf_scores) == 1  # symmetric leaves tie exactly
    assert got["leaf0"] > got["t1"]


def test_eigencentrality_matches_python_replica(spark):
    """Exact integer agreement with a pure-Python replica of the
    max-renormalized power iteration."""
    from osprey_spark.operators.graph import eigencentrality

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("b", "d"), ("d", "e")]
    scale = 10**12
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    score = {n: scale for n in adj}
    for _ in range(6):
        sums = {n: score[n] + sum(score[m] for m in nbrs) for n, nbrs in adj.items()}
        mx = max(sums.values())
        score = {n: (v * scale) // mx for n, v in sums.items()}  # exact int
    out = eigencentrality(_sym_edges(spark, pairs), rounds=6)
    got = {r.node: r.score for r in out.collect()}
    out.unpersist_base()
    assert got == score


def test_eigencentrality_validation(spark):
    import pytest

    from osprey_spark.operators.graph import eigencentrality

    with pytest.raises(ValueError, match="rounds"):
        eigencentrality(_sym_edges(spark, [("a", "b")]), rounds=0)


# --------------------------------------------------------------------------
# link prediction + assortativity
# --------------------------------------------------------------------------


def _lp_pairs(spark, rows):
    return spark.createDataFrame(rows, "user string, item string")


def test_link_prediction_known_answer(spark):
    """Hand graph: u1,u2 share {i1,i2}; u3 shares only i1 with them.
    item degrees: i1→3, i2→2, i3→1 (u3 private, never shared).
    u1={i1,i2}, u2={i1,i2}, u3={i1,i3}.
    (u1,u2): cn=2, jaccard=2/(2+2-2)=1.0, ra=1/3+1/2.
    (u1,u3): cn=1 (below min_cn=2 → absent at default, present at 1).
    """
    from osprey_spark.operators.graph import link_prediction

    rows = [
        ("u1", "i1"), ("u1", "i2"),
        ("u2", "i1"), ("u2", "i2"),
        ("u3", "i1"), ("u3", "i3"),
    ]
    out = link_prediction(_lp_pairs(spark, rows), cap=20, min_cn=1)
    got = {(r["user_a"], r["user_b"]): r for r in out.collect()}
    out.unpersist_base()
    assert set(got) == {("u1", "u2"), ("u1", "u3"), ("u2", "u3")}
    r12 = got[("u1", "u2")]
    assert r12["cn"] == 2 and r12["deg_a"] == 2 and r12["deg_b"] == 2
    assert r12["jaccard"] == 1.0
    # exact quantized RA: floor(1e12/3) + floor(1e12/2), /1e12 rounded 6
    assert r12["ra"] == round((10**12 // 3 + 10**12 // 2) / 1e12, 6)
    r13 = got[("u1", "u3")]
    assert r13["cn"] == 1 and r13["jaccard"] == round(1 / 3, 6)
    assert r13["ra"] == round((10**12 // 3) / 1e12, 6)


def test_link_prediction_min_cn_filters(spark):
    from osprey_spark.operators.graph import link_prediction

    rows = [("u1", "i1"), ("u2", "i1"), ("u1", "i2"), ("u2", "i2"), ("u3", "i1")]
    out = link_prediction(_lp_pairs(spark, rows), cap=20, min_cn=2)
    got = {(r["user_a"], r["user_b"]) for r in out.collect()}
    out.unpersist_base()
    assert got == {("u1", "u2")}


def test_link_prediction_cap_bounds_hub_fanout(spark):
    """A hub item with 10 users capped at 3 yields at most C(3,2)
    pairs from that item, and degrees are computed on the capped
    frame (internal consistency: jaccard <= 1)."""
    from osprey_spark.operators.graph import link_prediction

    rows = [(f"u{i}", "hub") for i in range(10)]
    out = link_prediction(_lp_pairs(spark, rows), cap=3, min_cn=1)
    pairs = out.collect()
    out.unpersist_base()
    assert len(pairs) == 3  # C(3,2)
    for r in pairs:
        assert r["jaccard"] <= 1.0


def test_link_prediction_validation(spark):
    from osprey_spark.operators.graph import link_prediction

    with pytest.raises(ValueError):
        link_prediction(_lp_pairs(spark, [("u", "i")]), cap=1)
    with pytest.raises(ValueError):
        link_prediction(_lp_pairs(spark, [("u", "i")]), min_cn=0)


def _assort_r(edges):
    """Pure-python Newman r over a directed edge list — out/in
    formulation: x = out-degree(src), y = in-degree(dst). For the
    symmetrized lists these tests build, out == in per node, so this
    equals the undirected replica too."""
    from collections import Counter
    import math

    odeg = Counter(s for s, _ in edges)
    ideg = Counter(d for _, d in edges)
    xs = [odeg[s] for s, d in edges]
    ys = [ideg[d] for s, d in edges]
    m = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    vx, vy = m * sxx - sx * sx, m * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None
    return round((m * sxy - sx * sy) / math.sqrt(float(vx) * float(vy)), 6)


def test_assortativity_star_is_negative(spark):
    """A star is maximally dissortative: every edge pairs degree 1
    with degree N. Exact value matches the python replica."""
    from osprey_spark.operators.graph import assortativity

    pairs = [("h", f"l{i}") for i in range(1, 6)]
    edges = pairs + [(b, a) for a, b in pairs]
    df = spark.createDataFrame(edges, "src string, dst string")
    row = assortativity(df).collect()[0]
    assert row["m_edges"] == 10
    assert row["r"] == _assort_r(edges)
    assert row["r"] == -1.0  # two-valued degree sequence, perfect anti-correlation


def test_assortativity_regular_graph_is_null(spark):
    """Constant degree (a 4-cycle) → zero variance → NULL r."""
    from osprey_spark.operators.graph import assortativity

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    edges = pairs + [(b, a) for a, b in pairs]
    df = spark.createDataFrame(edges, "src string, dst string")
    row = assortativity(df).collect()[0]
    assert row["m_edges"] == 8
    assert row["r"] is None


def test_assortativity_mixed_graph_matches_replica(spark):
    from osprey_spark.operators.graph import assortativity

    pairs = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
        ("b", "d"), ("a", "c"), ("e", "f"),
    ]
    edges = pairs + [(b, a) for a, b in pairs]
    df = spark.createDataFrame(edges, "src string, dst string")
    row = assortativity(df).collect()[0]
    assert row["r"] == _assort_r(edges)


def test_assortativity_directed_keeps_sink_only_nodes(spark):
    """ADVICE r3: on a genuinely directed list, an edge whose dst
    never appears as src must still count — y is the dst's IN-degree,
    not a src-side degree inner-joined on dst (which silently dropped
    such edges and shrank m_edges)."""
    from osprey_spark.operators.graph import assortativity

    # 'sink' and 'z' never appear as src: pre-fix these 3 edges vanished
    edges = [
        ("a", "sink"), ("b", "sink"), ("c", "z"),
        ("a", "b"), ("b", "c"), ("c", "a"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    row = assortativity(df).collect()[0]
    assert row["m_edges"] == 6
    assert row["r"] == _assort_r(edges)

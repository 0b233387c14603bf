"""Banded-LSH near-dup: recall on planted duplicates + plan shape.

ref: the reference has no ANN operator — this is the training-data
addition the brief requires (embedding-cosine near-dup, scale path).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osprey_spark.operators import similarity


def _vec(seed: int, dim: int = 16) -> list[float]:
    return [math.sin(seed * 31 + i) for i in range(dim)]


def test_banded_near_dup_finds_planted_duplicates(spark):
    dim = 16
    rows = [(i, _vec(i, dim)) for i in range(40)]
    # plant 3 exact duplicates and one slightly-perturbed near-dup
    rows += [(100, _vec(1, dim)), (101, _vec(2, dim)), (102, _vec(3, dim))]
    rows.append((103, [x + 1e-4 for x in _vec(4, dim)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.banded_near_dup_pairs(
        df, dim=dim, threshold=0.99, n_bands=8, planes_per_band=8
    )
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    # exact duplicates share every band bucket -> guaranteed found
    assert {(1, 100), (2, 101), (3, 102), (4, 103)} <= pairs
    # and all survivors truly exceed the cosine threshold
    assert all(r.cosine >= 0.99 for r in out.collect())


def test_banded_near_dup_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, _vec(i, 8)) for i in range(10)], "vec_id long, embedding array<double>"
    )
    out = similarity.banded_near_dup_pairs(df, dim=8, n_bands=2, planes_per_band=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_oracle_sql_matches_spark_buckets(spark):
    """DuckDB replay of the banded plan returns the identical pair set."""
    import duckdb

    dim = 16
    rows = [(i, _vec(i, dim)) for i in range(30)] + [(200, _vec(5, dim))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    spark_pairs = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.banded_near_dup_pairs(
            df, dim=dim, threshold=0.3, n_bands=4, planes_per_band=6
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    sql = similarity.banded_near_dup_oracle_sql(
        dim, threshold=0.3, n_bands=4, planes_per_band=6
    )
    duck_pairs = set(map(tuple, con.execute(sql).fetchall()))
    assert spark_pairs == duck_pairs and len(spark_pairs) >= 1


def test_ngram_prefix_filter_lossless(spark):
    """Prefix filtering must lose no pair vs brute-force Jaccard —
    including docs dominated by a boilerplate hot shingle."""
    from osprey_spark.operators import dedup

    boiler = "all rights reserved contact us "
    docs = [
        (1, boiler + "alpha beta gamma delta"),
        (2, boiler + "alpha beta gamma epsilon"),   # near-dup of 1
        (3, boiler + "zeta eta theta iota"),
        (4, boiler + "zeta eta theta kappa"),        # near-dup of 3
        (5, "totally different content here now"),
        (6, "alpha beta gamma delta " + boiler),    # word-order variant of 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.4, k=2).collect()
    }

    # brute force oracle
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
    assert got == want and len(want) >= 2


def test_dedup_groups_chain_components(spark):
    """Min-label propagation must cross multi-hop chains: a-b, b-c,
    c-d all land in group min(a) even though a,d never share a pair."""
    from osprey_spark.operators.dedup import dedup_groups

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(3, 1), (1, 2), (2, 7), (5, 6)], "id_a long, id_b long"
    )
    out = {r.doc_id: (r.group_id, r.is_keeper) for r in dedup_groups(pairs, docs).collect()}
    assert out == {
        0: (0, True),
        1: (1, True),   # component {1,2,3,7}: keeper = min id
        2: (1, False),
        3: (1, False),
        7: (1, False),
        4: (4, True),   # singleton
        5: (5, True),   # component {5,6}
        6: (5, False),
    }


def test_dedup_groups_warns_on_non_convergence(spark):
    """A chain with diameter above max_iterations must not come back
    silently split (round-2 ADVICE): dedup_groups warns."""
    from osprey_spark.operators.dedup import dedup_groups

    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "id_a long, id_b long"
    )
    with pytest.warns(RuntimeWarning, match="did not converge"):
        out = dedup_groups(chain, docs, max_iterations=1)
        # the propagation ran its rounds eagerly inside dedup_groups
        # (fixpoint probes); the warning fires there, split labels out
        assert len({r.group_id for r in out.collect()}) > 1
    out.unpersist_base()


def test_dedup_groups_pointer_jumping_is_log_rounds(spark):
    """Pointer jumping must compress chain-shaped components in
    O(log diameter) rounds: a diameter-16 chain converges within 10
    rounds with the jump join and does NOT without it (pure neighbor
    propagation needs 16)."""
    import warnings

    from osprey_spark.operators.dedup import dedup_groups

    docs = spark.createDataFrame([(i,) for i in range(17)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(16)], "id_a long, id_b long"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = dedup_groups(chain, docs, max_iterations=10)
        assert {r.group_id for r in out.collect()} == {0}
    out.unpersist_base()
    with pytest.warns(RuntimeWarning, match="did not converge"):
        out = dedup_groups(chain, docs, max_iterations=10, pointer_jumping=False)
        out.collect()
    out.unpersist_base()


def test_dedup_groups_releases_persisted_frames(spark):
    """Repeated calls with unpersist_base() must not grow the set of
    persisted RDDs (round-2 VERDICT: the final labels frame leaked)."""
    from osprey_spark.operators.dedup import dedup_groups

    jsc = spark.sparkContext._jsc
    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5), (8, 9), (9, 10)], "id_a long, id_b long"
    )
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    for _ in range(3):
        out = dedup_groups(pairs, docs)
        out.collect()
        out.unpersist_base()
    # set-based: immune to the async ContextCleaner reaping unrelated
    # entries another test leaked between the two measurements
    assert set(jsc.getPersistentRDDs().keySet().toArray()) - before == set()


def test_ngram_jaccard_releases_persisted_frames(spark):
    """ngram_jaccard_pairs persists its shingle base + prefix frames
    (self-join reuse); unpersist_base() must release both."""
    from osprey_spark.operators import dedup

    jsc = spark.sparkContext._jsc
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " + str(i % 3))
         for i in range(20)],
        "doc_id long, text string",
    )
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    for _ in range(2):
        out = dedup.ngram_jaccard_pairs(docs, threshold=0.4, k=2)
        out.collect()
        out.unpersist_base()
    assert set(jsc.getPersistentRDDs().keySet().toArray()) - before == set()


def test_ann_recall_floor_vs_brute_force(spark):
    """The ANN paths must be useful, not just deterministic: recall@5
    vs brute force on the driver testdata (near-random vectors — the
    hardest case; clustered real embeddings recall far higher).
    Measured 0.34 (LSH, 6-bit buckets) and 0.56 (IVF, 8/64 cells)."""
    import osprey_spark.entrypoint as ep

    sf = "/root/testdata/sf0.01"
    bf = {(r.query_id, r.vec_id) for r in ep.QUERIES["embedding_topk"](spark, sf).collect()}
    lsh = {(r.query_id, r.vec_id) for r in ep.QUERIES["embedding_lsh_topk"](spark, sf).collect()}
    ivf = {(r.query_id, r.vec_id) for r in ep.QUERIES["embedding_ivf_topk"](spark, sf).collect()}
    assert len(lsh & bf) / len(bf) >= 0.25
    assert len(ivf & bf) / len(bf) >= 0.40


def test_semantic_dedup_drops_larger_id_duplicates(spark):
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),   # exact dup of 1 -> dropped
            (3, [0.0, 1.0, 0.0, 0.0]),   # distinct direction -> kept
            (4, [0.99, 0.14, 0.0, 0.0]),  # near-dup of 1 (cos ~0.99) -> dropped
        ],
        "vec_id long, embedding array<double>",
    )
    out = similarity.semantic_dedup(vecs, dim=4, n_centroids=2, tau=0.9)
    rows = {r.vec_id: r for r in out.collect()}
    out.unpersist_base()
    assert rows[1].is_kept and rows[3].is_kept
    # exact duplicate always shares 1's cell (same nearest centroid) -> dropped
    assert rows[2].cell == rows[1].cell and not rows[2].is_kept
    # SemDeDup semantics: the near-dup is dropped iff it shares a cell with a
    # smaller-id similar vector (cross-cell near-dups are missed by design)
    assert rows[4].is_kept == (rows[4].cell not in (rows[1].cell, rows[2].cell))


def test_semantic_dedup_plan_is_equi_join(spark):
    vecs = spark.createDataFrame(
        [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2), 0.1]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    out = similarity.semantic_dedup(vecs, dim=4, n_centroids=2, tau=0.95)
    plan = out._jdf.queryExecution().executedPlan().toString()
    out.unpersist_base()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pq_recall_floor_and_plan(spark):
    """IVF-PQ: recall@5 vs brute force on the driver testdata must
    clear a floor (measured 0.52 with 8/64 probed cells + 8x16 codes
    + rerank=32 on near-random vectors — ADC-only was 0.34; the
    shortlist re-rank recovers IVF-flat's 0.56-class recall), and the
    candidate join must be an equi-join on the cell id — no cartesian
    anywhere."""
    import osprey_spark.entrypoint as ep

    sf = "/root/testdata/sf0.01"
    bf = {(r.query_id, r.vec_id) for r in ep.QUERIES["embedding_topk"](spark, sf).collect()}
    out = ep.QUERIES["embedding_pq_topk"](spark, sf)
    pq = {(r.query_id, r.vec_id) for r in out.collect()}
    assert len(pq & bf) / len(bf) >= 0.40
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pq_codes_reconstruct_sample_vectors_exactly(spark):
    """A vector that IS one of the k_codes sample vectors encodes to
    its own index in every subspace (distance 0), so its ADC dot with
    itself equals its true squared norm — a self-consistency anchor
    for the encode + ADC pair."""
    dim = 8
    rows = [(i, _vec(i, dim)) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.ivf_centroids(df, "vec_id", "embedding", 4)
    sample0 = cents[0]
    enc = df.select(
        "vec_id",
        similarity.pq_codes(F.col("embedding"), cents, dim, m_sub=2, k_codes=4).alias("codes"),
        similarity.pq_adc_dot(
            F.col("embedding"),
            similarity.pq_codes(F.col("embedding"), cents, dim, m_sub=2, k_codes=4),
            cents, dim, m_sub=2, k_codes=4,
        ).alias("adc"),
    ).collect()
    full = {r.vec_id: r for r in enc}
    match = [vid for vid, e in rows if e == sample0]
    assert match, "md5 sample must come from the corpus"
    r0 = full[match[0]]
    assert list(r0.codes) == [0, 0]
    assert abs(r0.adc - sum(x * x for x in sample0)) < 1e-9


def test_kmeans_separable_clusters_and_partitioning_invariance(spark):
    """Lloyd k-means: (a) on linearly separable blobs every blob lands
    in one cell with tiny dist2; (b) the integer-moment centroid
    update makes the result IDENTICAL under different partitionings
    (the order-dependent float mean this replaces does not survive a
    repartition)."""
    import itertools

    dim = 8
    blobs = []
    vid = 0
    for b in range(3):
        center = [10.0 * (b + 1) if i == b else 0.0 for i in range(dim)]
        for j in range(10):
            blobs.append((vid, [c + 0.01 * ((j % 5) - 2) for c in center]))
            vid += 1
    df = spark.createDataFrame(blobs, "vec_id long, embedding array<double>")
    out1 = similarity.kmeans_clusters(df, dim=dim, k=3, iterations=3).collect()
    out2 = similarity.kmeans_clusters(
        df.repartition(7), dim=dim, k=3, iterations=3
    ).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    # blob members share a cell; cross-blob members never do
    cell = {r.vec_id: r.cell for r in out1}
    for b in range(3):
        ids = range(b * 10, (b + 1) * 10)
        assert len({cell[i] for i in ids}) == 1
    assert len({cell[b * 10] for b in range(3)}) == 3
    assert all(r.dist2 < 0.01 for r in out1)


def test_fuzzy_match_pairs_known_answer(spark):
    from osprey_spark.operators.similarity import fuzzy_match_pairs

    texts = {
        1: "prefix0123456789 hello world",
        2: "prefix0123456789 hello w0rld",        # 1 substitution from d1
        3: "prefix0123456789 completely different tail",
        4: "other prefix entirely hello world",   # different block
        5: "prefix0123456789 hello world",        # exact dup of d1
    }
    docs = spark.createDataFrame(
        [(i, t, len(t)) for i, t in texts.items()],
        "doc_id long, text string, n_chars long",
    )
    got = {
        (r.doc_a, r.doc_b): r.dist
        for r in fuzzy_match_pairs(docs, threshold=5, block_len=16).collect()
    }
    # in-block, within threshold: (1,2)=1, (1,5)=0, (2,5)=1; the
    # early-exit -1 sentinel for >threshold pairs must be filtered out
    assert got == {(1, 2): 1, (1, 5): 0, (2, 5): 1}


def test_retrieval_eval_contract(spark):
    """recall@k/MRR known answers incl. the empty-candidate query."""
    from osprey_spark.operators.similarity import retrieval_eval

    truth = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2), (3, 30, 1), (3, 31, 2)],
        "query_id long, vec_id long, rank long",
    )
    cand = spark.createDataFrame(
        # q1: perfect; q2: second candidate is the only hit; q3: absent
        [(1, 10, 1), (1, 11, 2), (2, 99, 1), (2, 20, 2)],
        "query_id long, vec_id long, rank long",
    )
    out = {r.query_id: r for r in retrieval_eval(truth, cand, k=2).collect()}
    assert (out[1].n_hits, out[1].recall_at_k, out[1].rr) == (2, 1.0, 1.0)
    assert (out[2].n_hits, out[2].recall_at_k, out[2].rr) == (1, 0.5, 0.5)
    assert (out[3].n_hits, out[3].recall_at_k, out[3].rr) == (0, 0.0, 0.0)


def test_mmr_rerank_diversifies_planted_near_dups(spark):
    """MMR contract: rank 1 is the pure-relevance winner; low-lambda
    selection skips a planted near-duplicate of the top hit that
    plain top-k keeps; selected ids are unique; high lambda (1.0)
    degenerates to relevance order."""
    q = [1.0, 0.0, 0.0, 0.0]
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),        # exact hit
        (1, [0.999, 0.01, 0.0, 0.0]),     # near-dup of 0, 2nd by relevance
        (2, [0.7, 0.7, 0.0, 0.0]),        # diverse, mid relevance
        (3, [0.5, 0.0, 0.8, 0.0]),        # diverse
        (4, [0.0, 1.0, 0.0, 0.0]),        # orthogonal
    ]
    vdf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame([(100, q)], "query_id long, embedding array<double>")

    plain = similarity.brute_force_topk(vdf, qdf, k=3)
    assert [r.vec_id for r in plain.collect()] == [0, 1, 2]

    low = similarity.mmr_rerank(vdf, qdf, k=3, n_candidates=5, lam=0.3)
    sel = [r.vec_id for r in low.orderBy("mmr_rank").collect()]
    assert sel[0] == 0  # round 1 == relevance argmax
    assert 1 not in sel  # the near-dup is crowded out at low lambda
    assert len(set(sel)) == 3

    pure = similarity.mmr_rerank(vdf, qdf, k=3, n_candidates=5, lam=1.0)
    assert [r.vec_id for r in pure.orderBy("mmr_rank").collect()] == [0, 1, 2]


def test_mmr_rerank_k_exceeds_candidates(spark):
    """Requesting more rows than candidates returns every candidate
    exactly once (k_eff = n)."""
    vecs = [(i, [float(i == j) for j in range(3)]) for i in range(3)]
    vdf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(
        [(9, [1.0, 0.1, 0.1])], "query_id long, embedding array<double>"
    )
    out = similarity.mmr_rerank(vdf, qdf, k=10, n_candidates=3, lam=0.5).collect()
    assert sorted(r.vec_id for r in out) == [0, 1, 2]
    assert sorted(r.mmr_rank for r in out) == [1, 2, 3]


def test_dbscan_planted_cluster_roles(spark):
    """A planted dense blob becomes one cluster of cores (+ a border
    hanging off it); an isolated far point is noise; cluster id is
    the min member id."""
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    vecs = (
        # dense blob: 4 near-identical directions -> all core at min_pts=3
        [(i, unit(0.001 * i)) for i in range(4)]
        # border: close enough to blob members to pair, but too few
        # neighbors of its own would make it border only if below
        # min_pts; at 0.35 rad it pairs with the blob edge only
        + [(10, unit(0.45))]
        # noise: orthogonal
        + [(20, [0.0, 0.0, 1.0, 0.0])]
    )
    vdf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = similarity.dbscan_clusters(
        vdf, dim=4, threshold=0.95, min_pts=3, n_bands=4, planes_per_band=4
    )
    rows = {r.vec_id: r for r in out.collect()}
    out.unpersist_base()
    blob = [rows[i] for i in range(4)]
    assert all(r.role == "core" for r in blob)
    assert {r.cluster_id for r in blob} == {0}  # min member id
    assert rows[20].role == "noise" and rows[20].cluster_id is None


def test_dbscan_border_attaches_to_one_core(spark):
    """A point reaching only the EDGE of a spread-out core chain has
    too few neighbors to be core itself -> border, inheriting the
    chain's (min-id) cluster."""
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    # chain 0..3 at 0.05-rad spacing: every pair within 0.15 rad, so
    # each has 3 neighbors (+self = 4 = min_pts) -> all core.
    # vec 10 at 0.36 rad reaches only vec 3 (gap 0.21 <= 0.22) while
    # vec 2 is 0.26 away -> 1 neighbor -> border.
    eps = math.cos(0.22)
    vecs = [(i, unit(0.05 * i)) for i in range(4)] + [
        (10, unit(0.36)),
        (20, [0.0, 0.0, 1.0, 0.0]),
    ]
    vdf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = similarity.dbscan_clusters(
        vdf, dim=4, threshold=round(eps, 4), min_pts=4, n_bands=4, planes_per_band=4
    )
    rows = {r.vec_id: r for r in out.collect()}
    out.unpersist_base()
    assert all(rows[i].role == "core" and rows[i].cluster_id == 0 for i in range(4))
    assert rows[10].role == "border" and rows[10].cluster_id == 0
    assert rows[20].role == "noise"


# --- hybrid retrieval: token-Jaccard channel + RRF fusion -------------------


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_jaccard_topk_known_answer(spark):
    docs = _docs_df(
        spark,
        [
            (0, "apple banana cherry"),
            (1, "cherry banana apple apple"),  # same SET -> jaccard 1.0
            (2, "apple banana date"),  # shared 2, union 4 -> 0.5
            (3, "fig grape"),  # disjoint -> absent
            (4, "apple"),  # shared 1, union 3 -> 0.333333
        ],
    )
    out = similarity.token_jaccard_topk(docs, query_ids=[0], k=10)
    rows = out.collect()
    out.unpersist_base()
    got = {(r.doc_id): (r.jaccard, r.rank) for r in rows}
    assert 3 not in got  # zero-overlap docs never join, never rank
    # tie at 1.0 between the query itself and the same-set doc -> id asc
    assert got[0] == (1.0, 1) and got[1] == (1.0, 2)
    assert got[2] == (0.5, 3)
    assert got[4] == (0.333333, 4)


def test_token_jaccard_max_df_cull(spark):
    # "the" is in all 4 docs; with max_df=3 it is culled from BOTH the
    # query and candidate sets, so jaccard is computed over signal
    # tokens only and the all-boilerplate doc drops out entirely.
    docs = _docs_df(
        spark,
        [
            (0, "the apple banana"),
            (1, "the apple banana"),
            (2, "the apple"),
            (3, "the"),
        ],
    )
    out = similarity.token_jaccard_topk(docs, query_ids=[0], k=10, max_df=3)
    rows = out.collect()
    out.unpersist_base()
    got = {r.doc_id: r.jaccard for r in rows}
    assert got == {0: 1.0, 1: 1.0, 2: 0.5}  # doc 3 has no surviving tokens


def test_token_jaccard_max_df_pct_boundary(spark):
    # df*100 <= pct*n_docs is an EXACT integer test: a token in 4 of 5
    # docs survives pct=80 (400 <= 400) and drops at pct=79.
    docs = _docs_df(
        spark,
        [
            (0, "common alpha"),
            (1, "common alpha"),
            (2, "common beta"),
            (3, "common beta"),
            (4, "solo"),
        ],
    )
    keep = similarity.token_jaccard_topk(docs, query_ids=[0], k=10, max_df_pct=80)
    got_keep = {r.doc_id: r.jaccard for r in keep.collect()}
    keep.unpersist_base()
    # "common" kept: doc0 vs doc2 share {common} of union 3 -> 0.333333
    assert got_keep[2] == 0.333333
    cull = similarity.token_jaccard_topk(docs, query_ids=[0], k=10, max_df_pct=79)
    got_cull = {r.doc_id: r.jaccard for r in cull.collect()}
    cull.unpersist_base()
    # "common" culled: only {alpha} survives for doc0 -> doc2 disjoint
    assert 2 not in got_cull and got_cull == {0: 1.0, 1: 1.0}


def test_token_jaccard_rejects_both_culls(spark):
    docs = _docs_df(spark, [(0, "a b")])
    with pytest.raises(ValueError, match="not both"):
        similarity.token_jaccard_topk(docs, query_ids=[0], max_df=1, max_df_pct=50)


def _rank_df(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank int")


def test_rrf_fuse_known_answer(spark):
    # q1: doc 11 is ranked by BOTH channels -> 1/61 + 1/62 beats every
    # single-channel doc; doc absent from a channel contributes 0.0.
    a = _rank_df(spark, [(1, 10, 1), (1, 11, 2)])
    b = _rank_df(spark, [(1, 11, 1), (1, 12, 2)])
    out = similarity.rrf_fuse([a, b], k_const=60, topk=10).collect()
    got = [(r.doc_id, r.rrf_score, r.fused_rank) for r in out]
    s_both = round(1.0 / 62.0 + 1.0 / 61.0, 6)
    s_r1 = round(1.0 / 61.0, 6)
    s_r2 = round(1.0 / 62.0, 6)
    assert got == [(11, s_both, 1), (10, s_r1, 2), (12, s_r2, 3)]


def test_rrf_fuse_tie_breaks_by_id(spark):
    # symmetric ranks -> identical fused scores -> id asc wins
    a = _rank_df(spark, [(2, 20, 1), (2, 21, 2)])
    b = _rank_df(spark, [(2, 21, 1), (2, 20, 2)])
    out = similarity.rrf_fuse([a, b], k_const=60, topk=10).collect()
    assert [(r.doc_id, r.fused_rank) for r in out] == [(20, 1), (21, 2)]


def test_rrf_fuse_topk_and_channel_count(spark):
    a = _rank_df(spark, [(1, i, i + 1) for i in range(5)])
    b = _rank_df(spark, [(1, i + 3, i + 1) for i in range(5)])
    out = similarity.rrf_fuse([a, b], k_const=60, topk=2).collect()
    assert len(out) == 2 and [r.fused_rank for r in out] == [1, 2]
    with pytest.raises(ValueError, match=">= 2"):
        similarity.rrf_fuse([a])


# --------------------------------------------------------------------------
# hard-negative mining
# --------------------------------------------------------------------------


def test_hard_negatives_excludes_same_label_and_ranks_by_cosine(spark):
    """4 near-identical vectors: q(label 0), n1/n2 (label 1, n1
    closer), s (label 0, closest of all — must be EXCLUDED)."""
    from osprey_spark.operators.similarity import hard_negatives

    import pyspark.sql.functions as F

    rows = [
        (0, 0, [1.0, 0.0, 0.0, 0.0]),
        (1, 0, [0.999, 0.01, 0.0, 0.0]),   # same label: excluded
        (2, 1, [0.9, 0.1, 0.0, 0.0]),      # hard negative (closer)
        (3, 1, [0.5, 0.5, 0.0, 0.0]),      # softer negative
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    # n_planes=1 on 4 dims puts everything in <=2 buckets; use a plane
    # count low enough that these similar vectors co-bucket
    out = hard_negatives(
        df, dim=4, k=5, n_planes=1, query_pred=F.col("vec_id") == 0
    ).collect()
    ids = [r["neg_id"] for r in out]
    assert 1 not in ids
    assert ids == sorted(
        ids,
        key=lambda i: -[r["cosine"] for r in out if r["neg_id"] == i][0],
    )
    if set(ids) >= {2, 3}:  # co-bucketed
        r2 = [r for r in out if r["neg_id"] == 2][0]
        r3 = [r for r in out if r["neg_id"] == 3][0]
        assert r2["rank"] < r3["rank"]
        assert r2["query_label"] == 0 and r2["neg_label"] == 1


def test_hard_negatives_k_bounds_and_validation(spark):
    from osprey_spark.operators.similarity import hard_negatives

    import pytest as _pt

    rows = [(i, i % 2, [1.0, float(i) / 100, 0.0, 0.0]) for i in range(20)]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    out = hard_negatives(df, dim=4, k=3, n_planes=1)
    from collections import Counter

    per_q = Counter(r["query_id"] for r in out.collect())
    assert all(c <= 3 for c in per_q.values())
    with _pt.raises(ValueError):
        hard_negatives(df, dim=4, k=0)

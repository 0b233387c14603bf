"""Graph centrality over interaction graphs — the abuse-network
signal (fraud rings share resources: payment instruments, devices,
media attachments; a high-centrality resource node ties accounts
together). The reference has no graph operator (its closest analogue
is per-entity label propagation through the bulk-label sink,
ref: osprey_worker/src/osprey/worker/sinks/sink/bulk_label_sink.py);
rebuilt Spark-first as joins + hash aggregates, the same edges-only
working-set discipline as dedup's connected components.

INTEGER-EXACT PageRank: ranks live in integer micro-units and every
per-edge contribution is the integer floor ``(rank * damping_pct) DIV
(100 * deg)`` — sums of longs are partition-order independent, so N
rounds are bit-reproducible under any partitioning and the DuckDB
oracle replays every round verbatim (the kmeans/BPE unrolled-CTE
discipline). No float enters the result at any point.

Scale shape: one distinct-pair aggregate builds the edge list, each
round is ONE equi-join (ranks ⋈ edges on src) + ONE hash aggregate
(sum by dst) — no driver-side node state, no collect; the edge frame
persists across rounds behind an ``unpersist_base`` handle. Fixed
round count = fixed plan depth (no fixpoint probes), so the whole
computation is a single lazy action.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Rank scale: 1 starting rank = 1e12 units. Contributions are
# rank*85 <= ~1e15 per node — far inside long range even after
# summing thousands of in-edges.
RANK_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    rounds: int = 5,
    damping_pct: int = 85,
    scale: int = RANK_SCALE,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge list.

    ``edges`` must have string columns (src, dst); pass both
    directions for an undirected graph. Every node must appear as a
    src at least once (symmetric edge lists guarantee it) — there is
    deliberately no dangling-node redistribution, matching the
    oracle. Returns (node, rank) with rank in integer units of
    1/scale.
    """
    if not (0 < damping_pct < 100):
        raise ValueError("damping_pct must be in (1, 99)")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e = edges.join(deg, "src").persist()
    teleport = round((100 - damping_pct) / 100 * scale)
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(int(scale)).cast("long").alias("rank")
    )
    for _ in range(rounds):
        contrib: Column = F.expr(f"(rank * {damping_pct}) DIV (100 * deg)")
        ranks = (
            e.join(ranks, e.src == ranks.node)
            .select(F.col("dst").alias("n2"), contrib.alias("c"))
            .groupBy("n2")
            .agg(F.sum("c").alias("in_sum"))
            .select(
                F.col("n2").alias("node"),
                (F.lit(int(teleport)) + F.col("in_sum")).cast("long").alias("rank"),
            )
        )
    ranks.unpersist_base = lambda: e.unpersist(blocking=True)
    return ranks


def khop_distance(edges: DataFrame, seeds: DataFrame, k: int) -> DataFrame:
    """Guilt-by-association expansion: minimum hop distance (≤ k) from
    a SEED set over a directed edge list — the fraud-ring member list
    a bulk-label pipeline would feed (ref: the reference labels only
    the entities a query returns, bulk_label_sink.py; ring expansion
    there requires manual re-query per hop).

    ``edges``: (src, dst) strings (symmetric for undirected);
    ``seeds``: (node) strings. Returns (node, hops) for every node
    within k hops, hops = exact shortest distance (0 for seeds).

    Scale shape: k rounds of ONE equi-join (reached ⋈ edges) + ONE
    min-aggregate — the connected-components discipline with a fixed
    round count, so the whole expansion is a single lazy action over
    an edges-only working set; no driver-side frontier, no collect.
    All-integer hops → bit-reproducible under any partitioning."""
    if k < 1:
        raise ValueError("k must be >= 1")
    e = edges.persist()
    dist = seeds.select("node", F.lit(0).cast("int").alias("hops"))
    for _ in range(k):
        step = (
            e.join(dist, e.src == dist.node)
            .select(F.col("dst").alias("node"), (F.col("hops") + 1).alias("hops"))
        )
        dist = (
            dist.unionByName(step)
            .groupBy("node")
            .agg(F.min("hops").cast("int").alias("hops"))
        )
    dist.unpersist_base = lambda: e.unpersist(blocking=True)
    return dist


def cooccurrence(
    pairs: DataFrame,
    cap: int = 20,
    min_count: int = 2,
    user_col: str = "user",
    item_col: str = "item",
    seed: str = "co1",
) -> DataFrame:
    """Item-item co-occurrence mining over distinct (user, item)
    observations — the association step behind shared-resource ring
    detection (two payment instruments used by many of the same
    accounts) and item-similarity recommenders.

    The scale hazard of the naive bipartite projection is PER-USER
    FAN-OUT: a power user touching 10^5 items emits C(10^5, 2) ≈
    5·10^9 pairs on their own. ``cap`` bounds it the standard way —
    each user contributes at most ``cap`` items, chosen as the cap
    smallest seeded md5 draws so the subsample is an unbiased,
    engine-replayable uniform pick (ranking by item id would bias the
    projection toward low ids). Per-user pair fan-out is then ≤
    C(cap, 2), and total work is linear in users.

    Plan shape: one row_number window on the user shuffle (only
    (user, item, hash) triples move), a self-equi-join on user with
    the ``a < b`` canonical ordering, one hash aggregate on the item
    pair. Returns (item_a, item_b, n_users) for pairs with n_users >=
    ``min_count``.
    """
    if cap < 2:
        raise ValueError("cap must be >= 2")
    draw = F.md5(
        F.concat(
            F.lit(f"{seed}:"),
            F.col(user_col).cast("string"),
            F.lit(":"),
            F.col(item_col).cast("string"),
        )
    )
    w = Window.partitionBy(user_col).orderBy(draw, item_col)
    capped = (
        pairs.select(user_col, item_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(cap))
        .select(user_col, item_col)
    )
    a = capped.select(F.col(user_col).alias("_u"), F.col(item_col).alias("item_a"))
    b = capped.select(F.col(user_col).alias("_u"), F.col(item_col).alias("item_b"))
    return (
        a.join(b, "_u")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .filter(F.col("n_users") >= int(min_count))
    )


def triangle_count(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Per-node triangle participation over an undirected graph →
    ``(node, n_triangles)`` (triangles touching the node; the global
    triangle count is ``sum / 3``). The clique-density signal behind
    ring detection: colluding accounts sharing resources pairwise
    close many triangles, organic sharing closes few.

    Scale shape — the naive wedge join explodes by degree² on hub
    nodes ("the curse of the last reducer", Suri & Vassilvitskii
    2011). Standard mitigation implemented here: ORIENT each edge
    from its lower-(degree, id) endpoint to the higher one. The
    orientation is acyclic and every triangle has exactly one node
    whose two triangle-mates are both out-neighbors, so counting
    wedges only at out-neighbor pairs counts each triangle exactly
    once — and out-degree is bounded by O(√m), so wedge fan-out per
    node is O(m) total instead of Σdeg². Three equi-joins + two hash
    aggregates, all integer, no window over row scale.
    """
    e = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # e is referenced by deg (twice), the orientation join and the
        # wedge-closure join — unpersisted, Catalyst would replicate
        # the whole upstream edge-building subtree into every branch
        # (measured 66 scans / 198 windows of the bipartite projection
        # at sf0.01). Release via result.unpersist_base().
        .persist()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        e.join(deg.select(F.col("n").alias("a"), F.col("d").alias("_da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("_db")), "b")
    )
    lower_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    d = ed.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    d1 = d.select(F.col("src").alias("_w"), F.col("dst").alias("_x"))
    d2 = d.select(F.col("src").alias("_w"), F.col("dst").alias("_y"))
    wedges = d1.join(d2, "_w").filter(F.col("_x") < F.col("_y"))
    closed = wedges.join(
        e.select(F.col("a").alias("_x"), F.col("b").alias("_y")),
        ["_x", "_y"],
    )
    # one explode, not three unions — a union would re-run the wedge
    # join per branch
    nodes = closed.select(
        F.explode(F.array(F.col("_w"), F.col("_x"), F.col("_y"))).alias("node")
    )
    out = nodes.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    out.unpersist_base = lambda: e.unpersist(blocking=True)
    return out


def _checkpointed(sc, df):
    """localCheckpoint ``df`` eagerly and return (df, new_rdd_ids) so
    the caller can free exactly the blocks this round pinned — the
    iterative-round lineage-truncation discipline shared by kcore and
    lpa (each round references the previous frame more than once, so
    raw lineage would replicate the upstream subtree exponentially)."""
    jmap = sc._jsc.getPersistentRDDs()
    before = set(jmap.keySet().toArray())
    out = df.localCheckpoint(eager=True)
    after = sc._jsc.getPersistentRDDs()
    new_ids = [i for i in after.keySet().toArray() if i not in before]
    return out, new_ids


def _free(sc, ids):
    jmap = sc._jsc.getPersistentRDDs()
    for i in ids:
        r = jmap.get(i)
        if r is not None:
            r.unpersist(True)


def kcore(
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 50,
) -> DataFrame:
    """k-core decomposition by synchronous iterative peeling: the
    maximal subgraph in which every node keeps degree >= k — the
    standard densest-region filter (Seidman 1983) that strips the
    long tail of casual co-occurrence before ring/community analysis
    (a fraud clique survives a 3-core; the background bipartite noise
    does not).

    ``edges`` must be a symmetric (src, dst) string edge list (both
    directions present, no self loops), the same contract as
    :func:`pagerank`. Each round removes EVERY node whose current
    degree is below ``k`` simultaneously, then re-restricts the edge
    list — synchronous peeling, so the result is the unique k-core
    regardless of partitioning, and a fixpoint replay with MORE
    rounds is a no-op (the property the unrolled DuckDB oracle relies
    on).

    Scale shape: per round ONE hash-aggregate degree count (map-side
    partials) + TWO left-semi equi-joins restricting src and dst to
    surviving nodes — edges-only working set, no driver-side node
    state; the fixpoint test is a limit(1).count() probe and rounds
    are localCheckpoint-truncated (each round references the previous
    frame three times, so raw lineage would grow exponentially — the
    dedup_groups discipline). Rounds are bounded by the peeling depth
    (degeneracy ordering), not graph size; ``max_rounds`` exhaustion
    warns about the unconverged fixpoint like dedup_groups.

    Output: (node, deg) for every k-core member with its in-core
    degree — all integers, hash-exact in any engine.
    """
    if k < 1:
        raise ValueError("kcore: k must be >= 1")
    sc = edges.sparkSession.sparkContext
    cur, cur_ids = _checkpointed(sc, edges.select("src", "dst"))
    converged = False
    for _ in range(max_rounds):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        weak = deg.filter(F.col("deg") < k)
        if weak.limit(1).count() == 0:
            converged = True
            break
        alive = deg.filter(F.col("deg") >= k).select("src")
        nxt = cur.join(alive, "src", "left_semi").join(
            alive.select(F.col("src").alias("dst")), "dst", "left_semi"
        )
        nxt, nxt_ids = _checkpointed(sc, nxt)
        _free(sc, cur_ids)
        cur, cur_ids = nxt, nxt_ids
    if not converged:
        import warnings

        warnings.warn(
            f"kcore: fixpoint not reached after {max_rounds} rounds — "
            "result is the partially peeled graph, not the k-core",
            RuntimeWarning,
            stacklevel=2,
        )
    out = (
        cur.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("src").alias("node"), F.col("deg").cast("long").alias("deg"))
    )
    out.unpersist_base = lambda: _free(sc, cur_ids)
    return out


def lpa(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007) — the near-linear community finder that
    separates DENSELY linked regions, which neither connected
    components (any path merges) nor k-core (a global density filter,
    no partition) gives. The ring-analysis read: a fraud clique and
    the organic cluster it touches through one bridge edge stay
    distinct communities.

    ``edges``: symmetric (src, dst) string edge list, the
    pagerank/kcore contract. Every node starts labeled with its own
    id; each round EVERY node simultaneously adopts the most frequent
    label among its neighbors plus one self-vote (the self-vote damps
    the classic bipartite two-coloring oscillation), ties broken by
    MIN label — synchronous update + total-order tie-break makes
    round ``r`` a pure function of round ``r-1``, so the result is
    deterministic under any partitioning and the DuckDB oracle
    replays the exact same ``rounds`` verbatim (no fixpoint claim
    needed: even an oscillating graph matches, both engines stop at
    the same round).

    Scale shape per round: ONE equi-join (labels ⋈ edges on src — a
    neighbor's label arrives at dst), one union with the self-votes,
    TWO hash aggregates (vote count by (node, label), then the argmax
    as ``min(struct(-count, label))`` — no window over row scale).
    Labels frames are localCheckpoint-truncated per round (each round
    references the previous labels twice — join + self-vote union —
    so raw lineage would replicate the upstream subtree 2^rounds
    times); release the final pin via ``out.unpersist_base()``.

    Output: (node, community) — community is the winning seed node id.
    """
    if rounds < 1:
        raise ValueError("lpa: rounds must be >= 1")
    sc = edges.sparkSession.sparkContext
    e = edges.select("src", "dst").persist()
    labels = e.select("src").distinct().select(
        F.col("src").alias("node"), F.col("src").alias("lbl")
    )
    lbl_ids: list = []
    for _ in range(int(rounds)):
        votes = (
            e.join(labels, e.src == labels.node)
            .select(F.col("dst").alias("n2"), F.col("lbl"))
            .unionByName(labels.select(F.col("node").alias("n2"), F.col("lbl")))
        )
        nxt = (
            votes.groupBy("n2", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("n2")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("lbl").alias("l"))
                ).alias("m")
            )
            .select(F.col("n2").alias("node"), F.col("m.l").alias("lbl"))
        )
        nxt, nxt_ids = _checkpointed(sc, nxt)
        _free(sc, lbl_ids)
        labels, lbl_ids = nxt, nxt_ids
    out = labels.select("node", F.col("lbl").alias("community"))
    out.unpersist_base = lambda: (
        e.unpersist(blocking=True),
        _free(sc, lbl_ids),
    )
    return out


def lpa_oracle_sql(edges_sql: str, rounds: int = 4) -> str:
    """DuckDB replay of :func:`lpa`: the synchronous rounds statically
    unrolled into MATERIALIZED label CTEs — one vote union + one
    grouped row_number argmax per round, count desc / label asc, the
    exact tie-break the Spark side encodes as min(struct(-c, lbl))."""
    parts = [f"WITH e AS MATERIALIZED ({edges_sql})"]
    parts.append(
        "lbl_0 AS MATERIALIZED (SELECT src AS node, src AS lbl FROM e GROUP BY src)"
    )
    prev = "lbl_0"
    for r in range(1, int(rounds) + 1):
        parts.append(
            f"lbl_{r} AS MATERIALIZED (\n"
            f"  SELECT node, lbl FROM (\n"
            f"    SELECT n2 AS node, lbl,\n"
            f"      row_number() OVER (PARTITION BY n2 ORDER BY count(*) DESC, lbl) AS rn\n"
            f"    FROM (\n"
            f"      SELECT e.dst AS n2, l.lbl FROM e JOIN {prev} l ON l.node = e.src\n"
            f"      UNION ALL SELECT node, lbl FROM {prev}\n"
            f"    ) GROUP BY n2, lbl\n"
            f"  ) WHERE rn = 1)"
        )
        prev = f"lbl_{r}"
    body = ",\n".join(parts)
    return f"{body}\nSELECT node, lbl AS community FROM {prev}\n"


def kcore_oracle_sql(edges_sql: str, k: int = 3, rounds: int = 10) -> str:
    """DuckDB replay of :func:`kcore`: the peeling loop statically
    unrolled to ``rounds`` MATERIALIZED alive-set CTEs — valid
    because synchronous peeling is idempotent at the fixpoint, so
    any ``rounds`` >= the data's true peeling depth yields exactly
    the k-core (the Spark side converges by probe; callers pick
    ``rounds`` above the observed depth)."""
    parts = [f"WITH e AS MATERIALIZED ({edges_sql})"]
    parts.append(
        "alive_0 AS MATERIALIZED (SELECT src AS node FROM e GROUP BY src)"
    )
    prev = "alive_0"
    for r in range(1, int(rounds) + 1):
        parts.append(
            f"alive_{r} AS MATERIALIZED (\n"
            f"  SELECT src AS node FROM e\n"
            f"  WHERE src IN (SELECT node FROM {prev})\n"
            f"    AND dst IN (SELECT node FROM {prev})\n"
            f"  GROUP BY src HAVING count(*) >= {int(k)})"
        )
        prev = f"alive_{r}"
    body = ",\n".join(parts)
    return f"""{body}
SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
FROM e
WHERE src IN (SELECT node FROM {prev}) AND dst IN (SELECT node FROM {prev})
GROUP BY src
"""


def eigencentrality(
    edges: DataFrame, rounds: int = 6, scale: int = RANK_SCALE
) -> DataFrame:
    """Integer-exact eigenvector centrality (Bonacich 1972) by power
    iteration with max-renormalization — the centrality the family
    still lacked: degree counts neighbors, PageRank divides influence
    by out-degree (a hub's vote is diluted), but eigenvector
    centrality lets a hub amplify every neighbor — "important because
    connected to the important" with no vote splitting, which is
    exactly the fraud-ring reading (an account touching one mega-hub
    resource scores high even with degree 1).

    ``edges`` (src, dst) string columns, both directions for
    undirected graphs. Per round: ONE edges⋈scores equi-join + ONE
    dst-keyed integer-sum aggregate + ONE self-vote join (the
    iteration runs on A + I — a bare power iteration OSCILLATES on
    bipartite graphs like a star, the same two-coloring failure
    LPA's self-vote damps; the shift moves the spectrum positive and
    leaves the eigenvector unchanged), then renormalize by the
    round's max via a 1-row broadcast —
    ``r' = ((r + Σ_in) · scale) DIV max`` — the multiply routed
    through DECIMAL(38) (DuckDB: HUGEINT) since in_sum·scale
    overflows BIGINT for any hub. Every score is a bounded exact
    LONG (no float anywhere, the pagerank discipline),
    partitioning-independent, and the DuckDB oracle statically
    unrolls the same rounds. Fixed round count, no convergence claim
    (the LPA replay discipline); the max node pins at ``scale``.

    Returns (node, score) with integer scores.
    """
    if rounds < 1:
        raise ValueError("eigencentrality: rounds must be >= 1")
    sc = edges.sparkSession.sparkContext
    nodes = edges.select("src").distinct()
    e = edges.persist()
    scores = nodes.select(
        F.col("src").alias("node"), F.lit(int(scale)).cast("long").alias("score")
    )
    freed: list = []
    for _ in range(rounds):
        # each round references `sums` twice (the max and the join);
        # without truncation the lineage subtree doubles per round and
        # Catalyst planning goes exponential (the kcore/lpa lesson) —
        # localCheckpoint keeps every round O(1) plan nodes
        nbr = (
            e.join(scores, e.src == scores.node)
            .select(F.col("dst").alias("n2"), F.col("score").alias("c"))
            .groupBy("n2")
            .agg(F.sum("c").cast("long").alias("nbr_sum"))
        )
        sums, ids = _checkpointed(
            sc,
            scores.join(nbr, scores.node == nbr.n2, "left").select(
                scores.node.alias("n2"),
                (F.col("score") + F.coalesce(F.col("nbr_sum"), F.lit(0)))
                .cast("long")
                .alias("in_sum"),
            ),
        )
        freed.extend(ids)
        mx = sums.agg(F.max("in_sum").alias("_mx"))
        # in_sum*scale exceeds BIGINT for any hub of degree > 1 —
        # route the renorm through DECIMAL(38) (DuckDB mirrors with
        # HUGEINT); both floor on positives, result fits a long since
        # in_sum <= mx
        scores = sums.join(F.broadcast(mx)).select(
            F.col("n2").alias("node"),
            F.expr(
                f"CAST((CAST(in_sum AS DECIMAL(38,0)) * {int(scale)})"
                " DIV CAST(_mx AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("score"),
        )

    def _release() -> None:
        e.unpersist(blocking=True)
        _free(sc, freed)

    scores.unpersist_base = _release
    return scores


def eigencentrality_oracle_sql(
    edges_sql: str, rounds: int = 6, scale: int = RANK_SCALE
) -> str:
    """DuckDB replay of :func:`eigencentrality`: one MATERIALIZED CTE
    per round, the max entering via a cross join of the 1-row CTE
    (the pca_power scalar-subquery lesson). Integer floor division
    matches Spark's DIV exactly."""
    parts = [f"ecedges AS MATERIALIZED ({edges_sql})"]
    parts.append(
        "ecr0 AS MATERIALIZED (SELECT DISTINCT src AS node,"
        f" CAST({int(scale)} AS BIGINT) AS score FROM ecedges)"
    )
    prev = "ecr0"
    for t in range(1, int(rounds) + 1):
        parts.append(
            f"""ecn{t} AS (
  SELECT e.dst AS node, CAST(sum(r.score) AS BIGINT) AS nbr_sum
  FROM ecedges e JOIN {prev} r ON e.src = r.node GROUP BY e.dst
),
ecs{t} AS MATERIALIZED (
  SELECT r.node, CAST(r.score + coalesce(n.nbr_sum, 0) AS BIGINT) AS in_sum
  FROM {prev} r LEFT JOIN ecn{t} n USING (node)
),
ecm{t} AS (SELECT max(in_sum) AS mx FROM ecs{t}),
ecr{t} AS MATERIALIZED (
  SELECT node,
    CAST((CAST(in_sum AS HUGEINT) * {int(scale)}) // mx AS BIGINT) AS score
  FROM ecs{t}, ecm{t}
)"""
        )
        prev = f"ecr{t}"
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT node, score FROM {prev}"
    )


# --------------------------------------------------------------------------
# link prediction over the shared-resource bipartite projection
# --------------------------------------------------------------------------

RA_SCALE = 10**12


def link_prediction(
    pairs: DataFrame,
    cap: int = 20,
    min_cn: int = 2,
    user_col: str = "user",
    item_col: str = "item",
    seed: str = "lp1",
    scale: int = RA_SCALE,
) -> DataFrame:
    """User-user link prediction through shared resources — the
    "which accounts are about to be (or secretly already are)
    connected?" scorer (Liben-Nowell & Kleinberg 2003). Three
    classical indices per candidate pair, each with a fraud reading:

    - ``cn`` (common neighbors): raw count of shared resources — the
      ring-evidence mass.
    - ``jaccard``: cn normalized by the union of the two accounts'
      resource sets — high when two accounts' footprints are mostly
      the SAME footprint (sockpuppets), low for two busy accounts
      that merely brush once.
    - ``ra`` (resource allocation, Zhou-Lü-Zhang 2009): Σ 1/deg(w)
      over shared resources w — a resource touched by only these two
      accounts contributes 1/2; a resource half the internet touches
      contributes ~0. The index that makes RARE shared instruments
      (one payment card, two accounts) scream while popular media
      stays silent. Chosen over Adamic-Adar's 1/ln(deg) because 1/deg
      is RATIONAL: each contribution quantizes exactly to
      ``scale DIV deg(w)`` in BIGINT, so the per-pair sum is
      partition-order independent and the DuckDB replay is
      hash-exact (no transcendental, no float accumulation — the
      pagerank discipline; ln-based AA would hit the JVM-vs-libm
      1-ulp divergence this codebase pins in round(…,6) elsewhere).

    ``pairs`` must be DISTINCT (user, item) observations. The scale
    hazard is PER-ITEM fan-out: one hub resource with 10^5 users
    emits C(10^5,2) ≈ 5·10^9 candidate pairs alone. ``cap`` bounds
    it the cooccurrence way — each item keeps at most ``cap`` users,
    the cap smallest seeded-md5 draws (unbiased, engine-replayable);
    degrees and indices are computed on the capped frame so the
    algebra stays internally consistent (jaccard ≤ 1 always). Hub
    resources contribute ~0 to RA anyway (1/deg), so the subsample
    loses only what the index already discounts.

    Plan shape: one row_number window on the item shuffle, a
    self-equi-join on item with ``a < b`` canonicalization, one hash
    aggregate per pair (cn + RA units, map-side partials), two
    broadcast-size degree joins. Returns
    ``(user_a, user_b, cn, deg_a, deg_b, jaccard, ra)`` for pairs
    with cn ≥ ``min_cn``; jaccard/ra are exact-integer-derived
    doubles rounded to 6.
    """
    if cap < 2:
        raise ValueError("link_prediction: cap must be >= 2")
    if min_cn < 1:
        raise ValueError("link_prediction: min_cn must be >= 1")
    draw = F.md5(
        F.concat(
            F.lit(f"{seed}:"),
            F.col(item_col).cast("string"),
            F.lit(":"),
            F.col(user_col).cast("string"),
        )
    )
    w = Window.partitionBy(item_col).orderBy(draw, user_col)
    capped = (
        pairs.select(user_col, item_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(cap))
        .select(user_col, item_col)
        # referenced by item-degree, user-degree and both join sides —
        # without persist Catalyst replays the window per branch
        .persist()
    )
    item_deg = capped.groupBy(item_col).agg(
        F.count(F.lit(1)).cast("long").alias("_dw")
    )
    user_deg = capped.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("_du")
    )
    ra_unit = F.expr(f"CAST({int(scale)} AS BIGINT) DIV _dw")
    wi = capped.join(item_deg, item_col).filter(F.col("_dw") >= 2)
    a = wi.select(
        F.col(item_col).alias("_i"),
        F.col(user_col).alias("user_a"),
        ra_unit.alias("_ra"),
    )
    b = wi.select(
        F.col(item_col).alias("_i"), F.col(user_col).alias("user_b")
    )
    co = (
        a.join(b, "_i")
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cn"),
            F.sum("_ra").cast("long").alias("_ra_units"),
        )
        .filter(F.col("cn") >= int(min_cn))
    )
    out = (
        co.join(
            user_deg.select(
                F.col(user_col).alias("user_a"), F.col("_du").alias("deg_a")
            ),
            "user_a",
        )
        .join(
            user_deg.select(
                F.col(user_col).alias("user_b"), F.col("_du").alias("deg_b")
            ),
            "user_b",
        )
        .select(
            "user_a",
            "user_b",
            "cn",
            "deg_a",
            "deg_b",
            F.round(
                F.col("cn").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("cn")).cast("double"),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("_ra_units").cast("double") / F.lit(float(scale)), 6
            ).alias("ra"),
        )
    )
    out.unpersist_base = lambda: capped.unpersist(blocking=True)
    return out


def link_prediction_sql(
    pairs_table: str,
    cap: int = 20,
    min_cn: int = 2,
    seed: str = "lp1",
    scale: int = RA_SCALE,
) -> str:
    """DuckDB replay of :func:`link_prediction`. ``pairs_table`` must
    expose DISTINCT (u, item) VARCHAR rows. Same capped frame (md5
    rank per item), same BIGINT RA quantization (`//` == Spark `DIV`
    on positives), same two fixed divisions."""
    return f"""lpcap AS (
  SELECT u, item FROM (
    SELECT u, item,
      row_number() OVER (
        PARTITION BY item ORDER BY md5('{seed}:' || item || ':' || u), u
      ) AS rn
    FROM {pairs_table}
  ) WHERE rn <= {int(cap)}
),
lpideg AS (
  SELECT item, CAST(count(*) AS BIGINT) AS dw FROM lpcap GROUP BY item
),
lpudeg AS (
  SELECT u, CAST(count(*) AS BIGINT) AS du FROM lpcap GROUP BY u
),
lpwi AS (
  SELECT c.item, c.u, CAST({int(scale)} AS BIGINT) // d.dw AS ra_u
  FROM lpcap c JOIN lpideg d ON c.item = d.item WHERE d.dw >= 2
),
lpco AS (
  SELECT a.u AS user_a, b.u AS user_b,
    CAST(count(*) AS BIGINT) AS cn,
    CAST(sum(a.ra_u) AS BIGINT) AS ra_units
  FROM lpwi a JOIN lpwi b ON a.item = b.item AND a.u < b.u
  GROUP BY 1, 2 HAVING count(*) >= {int(min_cn)}
)
SELECT user_a, user_b, cn, da.du AS deg_a, db.du AS deg_b,
  round(CAST(cn AS DOUBLE) / CAST(da.du + db.du - cn AS DOUBLE), 6) AS jaccard,
  round(CAST(ra_units AS DOUBLE) / {float(scale)!r}, 6) AS ra
FROM lpco
JOIN lpudeg da ON lpco.user_a = da.u
JOIN lpudeg db ON lpco.user_b = db.u"""


def assortativity(
    edges: DataFrame, a_col: str = "src", b_col: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient (Newman, PRL 2002) — ONE
    number answering "do hubs connect to hubs?": social graphs run
    positive (celebrities follow celebrities), infrastructure and
    FRAUD topologies run negative (many throwaway degree-1 accounts
    all wired to one shared hub resource — the star motif). A sudden
    drop in assortativity on the interaction graph is a
    structure-level alarm no per-node threshold sees.

    ``edges`` is a DIRECTED list; pass both directions for an
    undirected graph (then out-degree == in-degree per node and the
    formula reduces to Newman's undirected r). r is the Pearson
    correlation of (out-deg(src), in-deg(dst)) over edges — the
    out/in directed formulation, so a genuinely directed list keeps
    EVERY edge (a dst that never appears as src contributes its
    in-degree instead of being dropped at the join; ADVICE r3): with
    M edges and per-edge degrees x, y —
    ``r = (M·Σxy − Σx·Σy) / sqrt((M·Σx² − (Σx)²)·(M·Σy² − (Σy)²))``.

    Exact-integer discipline: all six moments are BIGINT sums of
    BIGINT products in one hash-free global aggregate (map-side
    partials), and r is a fixed parenthesization of double casts —
    sqrt is IEEE-correctly-rounded in both engines, so the replay is
    hash-exact. Long-sum headroom: Σx² ≤ M·dmax²; at extreme hub
    degrees route the moments through DECIMAL(38,0) (the
    eigencentrality trade). Output: one row ``(m_edges, r)``; r NULL
    for degenerate (constant-degree) graphs.
    """
    e = edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("_d"))
    indeg = e.groupBy("dst").agg(F.count(F.lit(1)).cast("long").alias("_d"))
    ed = e.join(
        outdeg.select(F.col("src").alias("src"), F.col("_d").alias("_x")),
        "src",
    ).join(
        indeg.select(F.col("dst").alias("dst"), F.col("_d").alias("_y")),
        "dst",
    )
    m = ed.agg(
        F.count(F.lit(1)).cast("long").alias("m_edges"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("long").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("long").alias("_syy"),
    )
    md = F.col("m_edges").cast("double")
    num = md * F.col("_sxy").cast("double") - F.col("_sx").cast(
        "double"
    ) * F.col("_sy").cast("double")
    vx = md * F.col("_sxx").cast("double") - F.col("_sx").cast(
        "double"
    ) * F.col("_sx").cast("double")
    vy = md * F.col("_syy").cast("double") - F.col("_sy").cast(
        "double"
    ) * F.col("_sy").cast("double")
    r = F.when((vx > 0) & (vy > 0), num / F.sqrt(vx * vy))
    return m.select("m_edges", F.round(r, 6).alias("r"))


def assortativity_sql(edges_table: str) -> str:
    """DuckDB replay of :func:`assortativity` over a directed
    (src, dst) table — same six BIGINT moments (x = out-degree of
    src, y = in-degree of dst), same fixed-order double algebra."""
    return f"""asodeg AS (
  SELECT src AS n, CAST(count(*) AS BIGINT) AS d FROM {edges_table} GROUP BY src
),
asideg AS (
  SELECT dst AS n, CAST(count(*) AS BIGINT) AS d FROM {edges_table} GROUP BY dst
),
asmom AS (
  SELECT CAST(count(*) AS BIGINT) AS m_edges,
    CAST(sum(dx.d) AS BIGINT) AS sx, CAST(sum(dy.d) AS BIGINT) AS sy,
    CAST(sum(dx.d * dy.d) AS BIGINT) AS sxy,
    CAST(sum(dx.d * dx.d) AS BIGINT) AS sxx,
    CAST(sum(dy.d * dy.d) AS BIGINT) AS syy
  FROM {edges_table} e
  JOIN asodeg dx ON e.src = dx.n
  JOIN asideg dy ON e.dst = dy.n
)
SELECT m_edges,
  round(CASE WHEN (CAST(m_edges AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
              AND (CAST(m_edges AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        THEN (CAST(m_edges AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(m_edges AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(m_edges AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        END, 6) AS r
FROM asmom"""


def multi_source_distances(
    edges: DataFrame, seeds: DataFrame, k: int = 4
) -> DataFrame:
    """Per-seed BFS distances: ``(node, seed, d)`` for every node
    within ``k`` hops of each seed — the shared kernel behind
    sampled distance-based centralities (harmonic/closeness à la
    Eppstein-Wang: a bounded seed SAMPLE stands in for all-pairs,
    which no 100-TB graph can afford). ``seeds`` is a bounded frame
    (column ``seed``); the working frame is nodes × seeds, k fixed
    rounds of join + min-aggregate, all integer hops — the
    ring-expansion shape with a seed column carried through."""
    # NOTE: deliberately NOT persisted — the edge re-scan per round is
    # cheap (column-pruned parquet), while an InMemoryRelation here
    # blocks AQE partition coalescing and turns every round into
    # full-width tiny-task stages (measured 3.6s -> 24.1s at sf0.01
    # under 200 shuffle partitions). At cluster scale with expensive
    # edge derivations, persist a pre-coalesced copy instead.
    e = edges.select(F.col("src").alias("_n"), F.col("dst").alias("_m"))
    dist = seeds.select(
        F.col("seed").alias("_node"), F.col("seed"), F.lit(0).cast("int").alias("_d")
    )
    for _ in range(int(k)):
        grown = dist.join(e, dist._node == e._n).select(
            F.col("_m").alias("_node"), "seed", (F.col("_d") + 1).alias("_d")
        )
        dist = (
            dist.unionByName(grown)
            .groupBy("_node", "seed")
            .agg(F.min("_d").cast("int").alias("_d"))
        )
        # k stays small (<=4): the doubled-lineage-per-round growth is
        # 2^k leaf copies, inside the documented safe band — no
        # localCheckpoint needed, the whole expansion stays one lazy
        # action (the khop_distance discipline)
    return dist.select(
        F.col("_node").alias("node"), "seed", F.col("_d").alias("d")
    )


def harmonic_centrality_sample(
    edges: DataFrame, seeds: DataFrame, k: int = 4, quantum: int = 12
) -> DataFrame:
    """Seed-sampled harmonic centrality: ``score_q = Σ_seeds Q/d``
    over reached seeds (d ≥ 1), with Q=12 so every 1/d for d ≤ 4 is
    an EXACT integer (12, 6, 4, 3) — no float accumulation, the
    integer-exact iterative-op discipline. Output one row per node
    with its integer score (higher = closer to more seeds)."""
    dist = multi_source_distances(edges, seeds, k=k)
    q = int(quantum)
    out = (
        dist.filter(F.col("d") > 0)
        .groupBy("node")
        .agg(
            F.sum(F.expr(f"CAST({q} AS BIGINT) DIV d")).cast("long").alias("score_q"),
            F.count(F.lit(1)).cast("long").alias("seeds_reached"),
        )
    )
    return out

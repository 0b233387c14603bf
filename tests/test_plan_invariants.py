"""Plan-shape regression tests: the invariants we audit with
``explain("formatted")`` become CI assertions over the whole driver
query registry, so a future edit that silently reintroduces a
cartesian product, drops a pushed-down filter, or demotes a broadcast
join fails here at sf0.001 instead of surfacing as a 100 TB incident.

Every assertion reads the *optimized physical* plan only — nothing is
executed — so the module stays fast even though it covers all queries.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

QUERY_NAMES = sorted(entrymod.queries().keys())

# Queries allowed to contain a nested-loop join: brute_force_topk and
# the IVF centroid ranking broadcast a bounded small side (queries /
# codebook) by design — the cross product IS the documented plan, with
# the small side capped (Q≈10 rows, codebook 64 rows). tfidf/bm25/
# dsir_weights join 1-row broadcast corpus-stat frames (no join key by
# construction). embedding_pq_topk and kmeans_clusters inherit the
# bounded-codebook class but stay equi-join-only, so they are NOT here.
_CROSS_OK = {
    "embedding_topk",
    "embedding_ivf_topk",
    "tfidf",
    "bm25",
    "dsir_weights",
    "collocations",  # 1-row grand-total bigram-count frame broadcast (no join key)
    # round-4 members of the same 1-row-keyless-broadcast class:
    "assoc_rules",  # 1-row distinct-user total
    "chi2_independence",  # 1-row (n, n_rows, n_cols) contingency totals
    "cusum_drift",  # 1-row warmup (mu_q, k_q, h_q) reference params
    "kruskal_wallis",  # 1-row tie-moment frame joined onto the group moments
    "rfm_segments",  # 1-row activity-frontier (global max ts)
    "lm_nll",  # 1-row vocab-size frame broadcast into the scorer
    "nb_classifier",  # 1-row (totals, V, prior) scalar frame broadcast
    "tpch_q22",  # 1-row scalar-subquery threshold broadcast (no join key)
    "tpch_q11",  # 1-row corpus-total threshold broadcast (no join key)
    "skew_profile",  # 1-row global-stats frame broadcast onto the heavy list
    "zorder_stats",  # 1-row min/max-ranges frame broadcast onto the scan
    "kmv_set_ops",  # 1-row sketch frame x 1-row exact frame broadcast
    "decay_score",  # 1-row global now-bucket frame broadcast onto the scan
    "curriculum_buckets",  # 1-row quantile-boundaries frame broadcast onto the scan
    "retrieval_eval",  # wraps brute_force_topk: the bounded Q-row broadcast product
    "mmr_rerank",  # wraps brute_force_topk: the bounded Q-row broadcast product
    "token_jaccard_topk",  # 1-row corpus-count frame broadcast for the max_df_pct cull
    "rrf_hybrid",  # wraps brute_force_topk + token_jaccard_topk (both classes above)
    "classifier_eval",  # 1-row confusion frame x 1-row rank-stat frame broadcast
    "survival_km",  # 1-row global-max-ts frame broadcast for the censoring test
    "top_paths",  # 1-row total-conversations frame broadcast for the share
    "eigencentrality",  # 1-row per-round max frame broadcast for the renorm
    "hazard_na",  # 1-row global-max-ts frame broadcast for the censoring test
    "seq_patterns",  # 1-row total-conversations frame broadcast for the share
    "distinctive_terms",  # 1-row pooled-totals frame broadcast into the prior
    "did_lift",  # 1-row span-midpoint frame broadcast for the period split
    "markov_stationary",  # 1-row total-mass frame broadcast for the share
    "burrows_delta",  # bounded top-words frame broadcast grid (A x W dense z-space)
    "rolling_active",  # 1-row max-day frame broadcast for the window clip
    "markov_attribution",  # 1-row full-chain P(conv) frame broadcast onto the arms
}

# Queries expected to broadcast at least one join side (small dim /
# snapshot / bucket-count table); a SortMergeJoin regression here means
# a broadcast hint or size estimate broke.
_EXPECT_BROADCAST = {
    "tpch_q3",
    "tpch_q5",
    "tpch_q18",
    "tpch_q10",
    "tpch_q19",
    "tpch_q7",
    "tpch_q15",
    "tpch_q17",
    "tpch_q21",
    "tpch_q2",
    "tpch_q8",
    "tpch_q9",
    "tpch_q16",
    "tpch_q20",
    "has_label_roundtrip",
    "decontaminate",
    "corpus_curate",
    "embedding_topk",
    "shuffle_order",
    "range_join",
}


def _physical_plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if hasattr(df, "unpersist_base"):
        df.unpersist_base()
    return plan


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_no_cartesian_product(spark, name):
    plan = _physical_plan(spark, name)
    if name in _CROSS_OK:
        pytest.skip("bounded broadcast cross product is the documented plan")
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join in plan"


@pytest.mark.parametrize("name", sorted(_EXPECT_BROADCAST))
def test_expected_broadcast_join(spark, name):
    plan = _physical_plan(spark, name)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"{name}: expected a broadcast join in the plan"
    )


def test_tpch_q3_filter_pushed_to_scan(spark):
    """`c_mktsegment = 'BUILDING'` must reach the parquet scan."""
    plan = _physical_plan(spark, "tpch_q3")
    assert "PushedFilters:" in plan
    assert "c_mktsegment" in plan.split("PushedFilters:", 1)[1][:500] or (
        "IsNotNull(c_mktsegment)" in plan
    )


def test_rule_eval_prunes_event_payload(spark):
    """The flagship ruleset reads typed turn columns; the events scan
    must not read the full width (column pruning through the compiled
    projection pipeline)."""
    plan = _physical_plan(spark, "rule_eval")
    scan = plan[plan.index("Scan parquet") :]
    read_schema = scan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    # `value` is never referenced by the flagship features/oracle
    assert "value" not in read_schema, f"unpruned events scan: {read_schema}"


def test_sampling_filter_precedes_feature_projection(spark):
    """Dropped events must never evaluate a feature: the md5-roll
    filter sits BELOW the feature projections in the physical tree
    (deeper node = printed later = executed first), so features like
    __f_HasHello are only computed for surviving rows."""
    plan = _physical_plan(spark, "sampling")
    filter_lines = [
        ln for ln in plan.splitlines() if "Filter" in ln and "md5" in ln
    ]
    assert filter_lines, "no md5 sampling-roll Filter in the plan"
    assert plan.index(filter_lines[0]) > plan.index("__f_HasHello")


def test_vocab_build_uses_take_ordered(spark):
    """Top-K must stay tree-reduced; a global row_number window over
    the full vocabulary would single-task every distinct token."""
    plan = _physical_plan(spark, "vocab_build")
    assert "TakeOrderedAndProject" in plan


def test_shuffle_order_has_no_single_partition_exchange(spark):
    """The permutation is prefix-grouped: the only SinglePartition
    exchange allowed is the 16-row offsets aggregate, never the keyed
    data. We assert the data-side window partitions by _pfx."""
    plan = _physical_plan(spark, "shuffle_order")
    assert "_pfx" in plan
    # offsets frame is broadcast, not shuffled wide
    assert "BroadcastHashJoin" in plan

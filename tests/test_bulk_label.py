"""Bulk label pipeline (ref: worker/sinks/sink/bulk_label_sink.py:29-60).

Covers: entity enumeration + exclusion, the HLL-margin guardrail with
the excluded-entities retry semantics, and read-your-writes — bulk
mutations must be visible through the same latest_labels snapshot
HasLabel consumes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osprey_spark.plans import bulk_label
from osprey_spark.streaming.state import latest_labels


@pytest.fixture()
def results(spark):
    rows = [(f"conv_{i % 10}", i, "x" if i % 2 else None) for i in range(100)]
    return spark.createDataFrame(rows, "conv_id string, n long, flag string")


def test_collect_entities_excludes_and_caps(spark, results):
    ents = bulk_label.collect_entities(
        results, "conv_id", limit=5, excluded_entities=["conv_0"]
    )
    # exclusion applies after the TopN cap, as in the reference
    # (bulk_label_sink.py:241-244 filters the collected result set)
    got = sorted(r.entity_id for r in ents.collect())
    assert got == ["conv_1", "conv_2", "conv_3", "conv_4"]


def test_no_limit_skips_driver_side_ranking(spark, results):
    """no_limit=True must NOT compile to TakeOrderedAndProject
    (orderBy().limit(20M) merges per-partition top-20M heaps on the
    driver — round-2 VERDICT #2): taking everything needs no ranking,
    just a distributed distinct-project."""
    ents = bulk_label.collect_entities(
        results, "conv_id", no_limit=True, excluded_entities=["conv_0"]
    )
    plan = ents._sc._jvm.PythonSQLUtils.explainString(
        ents._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" not in plan
    got = sorted(r.entity_id for r in ents.collect())
    assert got == [f"conv_{i}" for i in range(1, 10)]
    # the limited path keeps its ranking semantics
    capped = bulk_label.collect_entities(results, "conv_id", limit=3)
    assert capped.count() == 3


def test_guardrail_margin_and_excluded_retry():
    bulk_label.check_entity_count(100, 95)  # within 10%
    bulk_label.check_entity_count(100, None)  # no estimate -> skip
    bulk_label.check_entity_count(100, 0)  # non-positive -> skip
    with pytest.raises(bulk_label.BulkLabelGuardrailError):
        bulk_label.check_entity_count(50, 100)
    # expected 100, 45 excluded -> adjusted 55, actual 50 within 10%
    bulk_label.check_entity_count(50, 100, n_excluded=45)
    with pytest.raises(bulk_label.BulkLabelGuardrailError):
        bulk_label.check_entity_count(10, 100, n_excluded=45)


def test_bulk_mutations_visible_to_latest_labels(spark, results):
    muts = bulk_label.bulk_label_mutations(
        results,
        dimension="conv_id",
        entity_type="ConvId",
        label="bulk_flagged",
        where=F.col("flag").isNotNull(),
        limit=3,
        expected_total=3,
    )
    rows = muts.collect()
    assert len(rows) == 3
    assert all(r.reason == bulk_label.BULK_LABEL_REASON for r in rows)
    snap = latest_labels(muts.drop("reason"))
    got = {(r.entity_id, r.label, r.status) for r in snap.collect()}
    assert all(lbl == "bulk_flagged" and st == "added" for _, lbl, st in got)
    assert len(got) == 3


def test_bulk_mutations_expires_after(spark, results):
    muts = bulk_label.bulk_label_mutations(
        results,
        dimension="conv_id",
        entity_type="ConvId",
        label="tmp",
        mutation_ts="2024-07-01 00:00:00",
        expires_after=3600.0,
        limit=1,
    ).collect()
    assert muts[0].expires_at_unix == 1719792000 + 3600

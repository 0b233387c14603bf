"""Bulk label pipeline: TopN query → entity enumeration → bulk label
mutations, guarded by an entity-count margin check.

ref: worker/sinks/sink/bulk_label_sink.py:29-60 (BulkLabelSink) — the
reference claims a BulkLabelTask, runs a Druid TopN to enumerate
entities for a dimension, verifies the actual count against the
HLL-estimated expected count (10% margin), then applies a label
mutation per entity with reason '_ManuallyBulkLabeled'. Here the
whole task is one declarative plan: the TopN is a hash aggregate over
the results table, the guardrail is an aggregate (never a collect of
entity ids to the driver), and the mutations are a DataFrame unioned
into the label changelog — so `HasLabel` sees them through the same
`latest_labels` snapshot as streaming effects.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import analytics

BULK_LABEL_REASON = "_ManuallyBulkLabeled"
# ref: bulk_label_sink.py:36 — 10% wiggle over the HLL estimate
EXPECTED_ENTITY_MARGIN_OF_ERROR = 0.1
BULK_LABEL_DEFAULT_LIMIT = 100_000
# ref: bulk_label_sink.py:46 — the no-limit TopN cap
BULK_LABEL_NO_LIMIT_SIZE = 20_000_000


class BulkLabelGuardrailError(Exception):
    """Actual entity count deviates from the expected count by more
    than the allowed margin (ref: bulk_label_sink.py:277-290
    UnretryableTaskException)."""


def collect_entities(
    df: DataFrame,
    dimension: str,
    where: Optional[Column] = None,
    limit: int = BULK_LABEL_DEFAULT_LIMIT,
    no_limit: bool = False,
    excluded_entities: Sequence[str] = (),
) -> DataFrame:
    """Entity enumeration via TopN (ref: bulk_label_sink.py:204-264
    _collect_entity_ids): distinct non-null dimension values ranked by
    frequency, minus the exclusion list. Returns one `entity_id`
    string column."""
    if no_limit:
        # Taking EVERY entity needs no ranking: orderBy().limit(20M)
        # compiles to TakeOrderedAndProject, which merges per-partition
        # top-20M heaps ON THE DRIVER — the one part of the reference
        # task (it builds a 20M-entry python list,
        # ref: bulk_label_sink.py:45-51) that cannot survive scale.
        # A distinct-project is one hash aggregate, fully distributed;
        # the no-limit cap becomes a guardrail count, not a sort.
        src = df.filter(where) if where is not None else df
        ents = (
            src.filter(F.col(dimension).isNotNull())
            .select(F.col(dimension).cast("string").alias("entity_id"))
            .distinct()
        )
    else:
        cand = analytics.topn(df, dimension, limit=limit, where=where)
        ents = cand.filter(F.col("dim").isNotNull()).select(
            F.col("dim").cast("string").alias("entity_id")
        )
    if excluded_entities:
        ents = ents.filter(~F.col("entity_id").isin(list(excluded_entities)))
    return ents


def check_entity_count(
    actual: int,
    expected: Optional[int],
    n_excluded: int = 0,
    margin: float = EXPECTED_ENTITY_MARGIN_OF_ERROR,
) -> None:
    """The HLL guardrail (ref: bulk_label_sink.py:277-304): skip when
    no estimate; on failure with exclusions, retry against
    (expected - excluded) before giving up — the reference assumes
    good intent on the caller."""
    if not expected or expected <= 0:
        return
    err = abs((expected - actual) / expected)
    if err <= margin:
        return
    if n_excluded > 0:
        adjusted = expected - n_excluded
        if adjusted > 0 and abs((adjusted - actual) / adjusted) <= margin:
            return
    raise BulkLabelGuardrailError(
        f"Expected {expected} entities, got {actual} (margin of error: {round(err * 100)}%)"
    )


def bulk_label_mutations(
    df: DataFrame,
    dimension: str,
    entity_type: str,
    label: str,
    status: str = "added",
    mutation_ts="2024-07-01 00:00:00",
    where: Optional[Column] = None,
    limit: int = BULK_LABEL_DEFAULT_LIMIT,
    no_limit: bool = False,
    excluded_entities: Sequence[str] = (),
    expected_total: Optional[int] = None,
    expires_after: Optional[float] = None,
) -> DataFrame:
    """End-to-end bulk label task → label-changelog rows with the
    schema of `streaming.state` changelogs (entity_type, entity_id,
    label, status, expires_at_unix, mutation_ts) plus a `reason`
    column. Union the result into the label changelog to make the
    labels visible to HasLabel.

    The guardrail runs as one count() aggregate; entity ids
    themselves never leave the executors (the reference materializes
    a sorted python list — at 20M entities that is the part that
    cannot survive scale, so this plan deliberately diverges)."""
    ents = collect_entities(df, dimension, where, limit, no_limit, excluded_entities)
    if expected_total is not None:
        check_entity_count(ents.count(), expected_total, len(excluded_entities))
    ts = F.lit(mutation_ts).cast("timestamp")
    expires = (
        (ts.cast("double") + F.lit(float(expires_after))).cast("long")
        if expires_after
        else F.lit(0).cast("long")
    )
    return ents.select(
        F.lit(entity_type).alias("entity_type"),
        F.col("entity_id"),
        F.lit(label).alias("label"),
        F.lit(status).alias("status"),
        expires.alias("expires_at_unix"),
        ts.alias("mutation_ts"),
        F.lit(BULK_LABEL_REASON).alias("reason"),
    )

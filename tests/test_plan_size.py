"""Optimized-plan SIZE regression guards for the HOF-heaviest queries.

The expensive-array-intermediate discipline (bind any reused array
expression through a single-element-array lambda so Catalyst's
CollapseProject cannot re-inline it once per ``element_at``) fixed
88s→1.4s on textrank_turns and 180s→11s on changepoints in round 3,
but was enforced only by comments. These bounds pin it: removing a
let-binding re-inlines the array expression per consumer and the
optimized plan string grows by orders of magnitude (the measured
plans sit at 3–23k chars; the bounds below allow ~4× headroom for
benign edits before failing).

Analysis-only: nothing executes, so the whole module runs in seconds.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

# measured sizes (round 4): textrank 5.6k, changepoints 7.7k,
# rouge_l 7.8k, seq_patterns 3.1k, topic_segments 3.7k,
# holt_forecast 4.2k, burrows_delta 22.3k
BOUNDS = {
    "textrank_turns": 25_000,
    "changepoints": 35_000,
    "rouge_l": 35_000,
    "seq_patterns": 15_000,
    "topic_segments": 16_000,
    "holt_forecast": 20_000,
    "burrows_delta": 90_000,
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available"
)


@pytest.mark.parametrize("name", sorted(BOUNDS))
def test_optimized_plan_stays_collapsed(spark, name):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < BOUNDS[name], (
        f"{name}: optimized plan grew to {len(plan)} chars "
        f"(bound {BOUNDS[name]}) — a let-binding was probably removed "
        "and CollapseProject re-inlined an expensive array intermediate"
    )

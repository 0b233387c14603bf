"""UniMax allocation (Chung et al. 2023): the window-function closed
form in q_unimax_mixing must equal the paper's SEQUENTIAL greedy
(ascending by size; cap each language at E epochs or give it the
uniform share of the remaining budget) — verified by replaying the
greedy in pure Python over the same per-language token counts."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from osprey_spark.entrypoint import _UNIMAX_BUDGET, _UNIMAX_EPOCH_CAP

_TOKENS_SQL = r"""
SELECT lang,
       sum(len(list_filter(regexp_split_to_array(lower(text), '[\W_]+'),
                           t -> t <> ''))) AS n_tokens
FROM read_parquet(?) GROUP BY 1
"""


def _greedy(counts: dict[str, int], budget: int, epoch_cap: int) -> dict[str, float]:
    """The paper's sequential allocator, verbatim."""
    remaining = float(budget)
    left = len(counts)
    alloc: dict[str, float] = {}
    for lang, c in sorted(counts.items(), key=lambda kv: (kv[1], kv[0])):
        share = remaining / left
        a = min(float(epoch_cap * c), share)
        alloc[lang] = a
        remaining -= a
        left -= 1
    return alloc


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_unimax_closed_form_equals_sequential_greedy(spark, sf):
    sf_dir = f"/root/testdata/{sf}"
    counts = dict(
        duckdb.connect()
        .execute(_TOKENS_SQL, [f"{sf_dir}/documents.parquet"])
        .fetchall()
    )
    want = _greedy(counts, _UNIMAX_BUDGET, _UNIMAX_EPOCH_CAP)
    got = {
        r["lang"]: r["alloc_tokens"]
        for r in entrymod.queries()["unimax_mixing"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for lang in want:
        assert got[lang] == pytest.approx(round(want[lang], 2), abs=0.011), lang
    # budget fully spent (nothing capped-away unless everything capped)
    if any(
        _UNIMAX_EPOCH_CAP * counts[lang] > want[lang] + 1e-9 for lang in counts
    ):
        assert sum(want.values()) == pytest.approx(_UNIMAX_BUDGET)

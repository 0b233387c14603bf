"""Conversation-transcript curation operators.

The north-star payload is multi-turn conversation / agent transcripts
(conv_id, turn_idx, role, text, tool, ts). Beyond the rule/CEP engine,
a training-data pipeline over transcripts needs transcript-shaped
curation signals: an agent that repeats itself turn after turn
(degenerate loops), and boilerplate turns (canned responses repeated
across thousands of conversations — the C4 "line appears 3+ times in
the corpus" filter, Raffel et al. 2020, applied at turn granularity,
which IS the line granularity of a transcript corpus).

Both operators are single-pass hash-aggregate / window shapes with no
corpus-sized shuffles beyond their grouping keys, and both produce
bit-reproducible floats (single integer divisions, position-ordered
fold for the mean) so the DuckDB oracles replay them hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize_col


def turn_repetition(
    turns: DataFrame,
    threshold: float = 0.5,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Per-conversation consecutive-turn Jaccard repetition.

    For every adjacent turn pair within a conversation, the Jaccard
    similarity of the turns' DISTINCT token sets; a conversation-level
    rollup of pair count, pairs at/above ``threshold`` (the degenerate
    agent-loop signal), and the mean consecutive similarity.

    Float determinism: each pair's Jaccard is ONE integer/integer
    division (|a∩b| and |a∪b| are exact counts), and the mean folds
    the pair list ordered by ``turn_idx``, so float addition order is
    fixed under any partitioning. Pairs where both turns tokenize to
    nothing are defined as identical (j = 1.0).

    Plan at 100 TB: one window (conv-sized partitions, never
    corpus-sized) + one conv-keyed hash aggregate with map-side
    partials — the same shuffle key the rest of the transcript
    pipeline already uses.
    """
    toks = turns.select(
        conv_col,
        idx_col,
        F.array_distinct(tokenize_col(F.col(text_col))).alias("_ts"),
    )
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    prev = F.lag("_ts").over(w)
    inter = F.size(F.array_intersect(F.col("_ts"), prev))
    uni = F.size("_ts") + F.size(prev) - inter
    j = F.when(uni == 0, F.lit(1.0)).otherwise(
        inter.cast("double") / uni.cast("double")
    )
    pairs = toks.select(
        conv_col, idx_col, j.alias("_j")
    ).filter(F.col("_j").isNotNull())
    return (
        pairs.groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum((F.col("_j") >= F.lit(threshold)).cast("long"))
            .cast("long")
            .alias("n_repetitive"),
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(idx_col).alias("i"), F.col("_j").alias("j")))
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["j"],
                )
                / F.count(F.lit(1)),
                6,
            ).alias("mean_jaccard"),
        )
        .orderBy(conv_col)
    )


def boilerplate_turns(
    turns: DataFrame,
    min_convs: int = 3,
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style boilerplate filter at turn granularity: a turn text
    that appears in >= ``min_convs`` DISTINCT conversations is
    boilerplate (canned responses, templated tool output), and each
    conversation reports how much of it is boilerplate.

    Counting distinct conversations rather than raw occurrences keeps
    intra-conversation loops out of this signal (``turn_repetition``
    owns those).

    Plan at 100 TB: (text, conv) distinct is a two-phase hash
    aggregate with map-side partials (hot texts pre-aggregate per
    partition before the shuffle — the skew story), the flag table
    joins back text-keyed, then one conv-keyed rollup.
    ``boilerplate_frac`` is one integer/integer division —
    bit-reproducible.
    """
    flagged = (
        turns.select(text_col, conv_col)
        .distinct()
        .groupBy(text_col)
        .agg(F.count(F.lit(1)).alias("_nc"))
        .filter(F.col("_nc") >= min_convs)
        .select(text_col, F.lit(True).alias("_bp"))
    )
    return (
        turns.join(flagged, text_col, "left")
        .groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum(F.coalesce(F.col("_bp"), F.lit(False)).cast("long"))
            .cast("long")
            .alias("n_boilerplate"),
        )
        .withColumn(
            "boilerplate_frac",
            F.round(
                F.col("n_boilerplate").cast("double") / F.col("n_turns").cast("double"), 6
            ),
        )
        .orderBy(conv_col)
    )

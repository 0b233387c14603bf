"""Corpus-scale multi-phrase watchlist matching.

The trust-and-safety watchlist problem at sizes where the easy answers
stop working: ``RegexListContains`` compiles the list into one regex —
fine for 100 phrases, hopeless for 10^5+ (pattern size, compile time,
and the whole list rides every executor's regex engine). The scalable
shape is the INVERTED-INDEX join, Aho-Corasick's role re-expressed
relationally:

1. tokenize each phrase; its FIRST token is the index key;
2. posexplode document tokens — each (token, pos) row carries the
   next ``max_len`` tokens as a narrow window (so verification never
   needs a second join back to the document);
3. equi-join token == phrase first token (Catalyst picks broadcast
   for small lists, shuffle-hash beyond — both correct, the join key
   is the decision point a hand-rolled matcher doesn't get for free);
4. verify the candidate: the window's ``phrase_len`` prefix equals
   the phrase's token array — exact, no false positives.

Fan-out is total-tokens rows of (doc_id, pos, token, small window) —
linear in corpus size, narrow, and map-side prunable: common-word
first tokens are the skew hazard, so phrase lists should lead with
their rarest token when possible (documented, not enforced — the
reference's blocklists are short phrases where this is moot).

Output: one row per matched document —
``(doc_id, n_hits, n_phrases, first_pos)`` (total occurrences,
distinct phrases, earliest 0-based token position).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watchlist_hits(
    docs: DataFrame,
    phrases: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 5,
) -> DataFrame:
    toks = [p.split(" ") for p in phrases]
    if not toks or any(not t or len(t) > max_len for t in toks):
        raise ValueError(
            f"phrases must be 1..{max_len} space-separated tokens"
        )
    spark = docs.sparkSession
    pdf = spark.createDataFrame(
        [(i, t[0], t, len(t)) for i, t in enumerate(toks)],
        "phrase_id int, first string, ptoks array<string>, plen int",
    )
    dtoks = F.split(F.col(text_col), " ")
    exploded = docs.select(
        F.col(id_col),
        F.posexplode(dtoks).alias("pos", "tok"),
        dtoks.alias("_all"),
    ).select(
        id_col,
        "pos",
        "tok",
        # narrow verification window: next max_len tokens from pos
        F.slice(F.col("_all"), F.col("pos") + 1, int(max_len)).alias("_win"),
    )
    cand = exploded.join(pdf, exploded["tok"] == pdf["first"])
    hits = cand.filter(
        F.slice(F.col("_win"), 1, F.col("plen")) == F.col("ptoks")
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.countDistinct("phrase_id").cast("long").alias("n_phrases"),
            F.min("pos").cast("long").alias("first_pos"),
        )
    )


def watchlist_hits_sql(
    table: str,
    phrases: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle: lateral unnest + the identical prefix compare."""
    vals = ",\n    ".join(
        f"({i}, {_sq(p.split(' ')[0])}, {_lst(p.split(' '))}, {len(p.split(' '))})"
        for i, p in enumerate(phrases)
    )
    return f"""
WITH ph(phrase_id, first, ptoks, plen) AS (
  VALUES
    {vals}
),
d AS (
  SELECT {id_col}, string_split({text_col}, ' ') AS alltoks
  FROM {table}
),
tok AS (
  SELECT {id_col}, alltoks[CAST(p + 1 AS INT)] AS tok, p AS pos, alltoks
  FROM d, unnest(range(0, len(alltoks))) AS r(p)
),
hits AS (
  SELECT t.{id_col}, t.pos, ph.phrase_id
  FROM tok t JOIN ph ON t.tok = ph.first
  WHERE t.alltoks[CAST(t.pos + 1 AS INT) : CAST(t.pos + ph.plen AS INT)] = ph.ptoks
)
SELECT {id_col},
  CAST(count(*) AS BIGINT) AS n_hits,
  CAST(count(DISTINCT phrase_id) AS BIGINT) AS n_phrases,
  CAST(min(pos) AS BIGINT) AS first_pos
FROM hits GROUP BY {id_col}
"""


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _lst(toks: Sequence[str]) -> str:
    return "[" + ", ".join(_sq(t) for t in toks) + "]"

"""User-journey / market-analysis operators (round-4 additions).

Association rules (support/confidence/lift over per-user baskets),
RFM segmentation (recency-frequency-monetary quintiles), and funnel
conversion timing (exact median seconds to convert per cohort) — the
standard growth-analytics trio a transcripts/events warehouse serves
daily.

Scale shapes: the basket alphabet (event types) is bounded, so every
frame after the first distinct aggregate is alphabet- or
key-cardinality class; RFM's quintile windows run over the USER frame
(orders below the event stream — the gini_activity class), with
``ntile`` made engine-deterministic by a total order (metric,
user_id); funnel medians use the exact two-middle-row selection over
bounded cohorts.

Engine-exactness: monetary amounts quantize to cents via ``floor``
(both engines' floor is IEEE-exact; never CAST a double — Spark
truncates where DuckDB rounds), lift/confidence round to 6 BEFORE any
ordering they tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assoc_rules(
    events: DataFrame,
    user_col: str = "user_id",
    item_col: str = "event_type",
    min_support: int = 2,
) -> DataFrame:
    """Directional association rules a→b over per-user item baskets.

    ``support`` = users holding both items, ``confidence`` =
    support / users(a), ``lift`` = n_users · support /
    (users(a) · users(b)). One distinct aggregate collapses the event
    stream to (user, item); the pair self-join fans out at most
    |alphabet|−1 per basket row; everything after is alphabet².
    """
    baskets = events.select(
        F.col(user_col).alias("_u"), F.col(item_col).alias("_i")
    ).distinct()
    item_counts = baskets.groupBy("_i").agg(
        F.count(F.lit(1)).cast("long").alias("_ci")
    )
    n_users = baskets.select("_u").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    a = baskets.select(F.col("_u"), F.col("_i").alias("antecedent"))
    b = baskets.select(F.col("_u"), F.col("_i").alias("consequent"))
    pairs = (
        a.join(b, "_u")
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("long").alias("support_users"))
        .filter(F.col("support_users") >= int(min_support))
    )
    out = (
        pairs.join(
            F.broadcast(item_counts.select(F.col("_i").alias("antecedent"), F.col("_ci").alias("_ca"))),
            "antecedent",
        )
        .join(
            F.broadcast(item_counts.select(F.col("_i").alias("consequent"), F.col("_ci").alias("_cb"))),
            "consequent",
        )
        .join(F.broadcast(n_users))
    )
    conf = F.round(
        F.col("support_users").cast("double") / F.col("_ca").cast("double"), 6
    )
    lift = F.round(
        (F.col("_n").cast("double") * F.col("support_users").cast("double"))
        / (F.col("_ca").cast("double") * F.col("_cb").cast("double")),
        6,
    )
    return (
        out.select(
            "antecedent",
            "consequent",
            "support_users",
            conf.alias("confidence"),
            lift.alias("lift"),
        )
        .orderBy(F.desc("lift"), "antecedent", "consequent")
    )


def assoc_rules_sql(events_table: str, user_col="user_id", item_col="event_type", min_support=2) -> str:
    return f"""arb AS (
  SELECT DISTINCT {user_col} AS u, {item_col} AS i FROM {events_table}
),
arc AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM arb GROUP BY i),
arn AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n FROM arb),
arp AS (
  SELECT a.i AS antecedent, b.i AS consequent,
         CAST(count(*) AS BIGINT) AS support_users
  FROM arb a JOIN arb b ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2 HAVING count(*) >= {int(min_support)}
)
SELECT antecedent, consequent, support_users,
  round(CAST(support_users AS DOUBLE) / CAST(ca.ci AS DOUBLE), 6) AS confidence,
  round(CAST(arn.n AS DOUBLE) * CAST(support_users AS DOUBLE)
        / (CAST(ca.ci AS DOUBLE) * CAST(cb.ci AS DOUBLE)), 6) AS lift
FROM arp
JOIN arc ca ON arp.antecedent = ca.i
JOIN arc cb ON arp.consequent = cb.i
CROSS JOIN arn
ORDER BY lift DESC, antecedent, consequent"""


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """RFM quintile segmentation: per user, recency (days since last
    event vs the corpus frontier, integer DIV), frequency (event
    count), monetary (cents via floor); quintiles by deterministic
    ``ntile(5)`` over (metric, user) total orders; output one row per
    (r, f, m) segment with its user count.
    """
    from .timeutil import epoch_long

    per_user = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.max(epoch_long(F.col(ts_col))).cast("long").alias("_last"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(F.floor(F.col(value_col) * 100).cast("long"))
        .cast("long")
        .alias("mon_cents"),
    )
    frontier = per_user.agg(F.max("_last").alias("_front"))
    scored = per_user.join(F.broadcast(frontier)).select(
        "_u",
        ((F.col("_front") - F.col("_last")) / F.lit(86400))
        .cast("long")
        .alias("rec_days"),
        "freq",
        "mon_cents",
    )
    # smaller recency = better; ntile ascending on each metric with a
    # user tie-break makes bucket assignment a pure total-order fact
    w_r = Window.orderBy(F.desc("rec_days"), "_u")  # 5 = most recent
    w_f = Window.orderBy("freq", "_u")
    w_m = Window.orderBy("mon_cents", "_u")
    seg = scored.select(
        F.ntile(5).over(w_r).alias("r_score"),
        F.ntile(5).over(w_f).alias("f_score"),
        F.ntile(5).over(w_m).alias("m_score"),
    )
    return (
        seg.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("r_score", "f_score", "m_score")
    )


def rfm_segments_sql(events_table: str) -> str:
    return f"""rfu AS (
  SELECT user_id AS u,
    CAST(max(floor(epoch(ts))) AS BIGINT) AS last_e,
    CAST(count(*) AS BIGINT) AS freq,
    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS mon_cents
  FROM {events_table} GROUP BY user_id
),
rff AS (SELECT CAST(max(last_e) AS BIGINT) AS front FROM rfu),
rfs AS (
  SELECT u, CAST((front - last_e) // 86400 AS BIGINT) AS rec_days,
         freq, mon_cents
  FROM rfu CROSS JOIN rff
),
rfq AS (
  SELECT ntile(5) OVER (ORDER BY rec_days DESC, u) AS r_score,
         ntile(5) OVER (ORDER BY freq, u) AS f_score,
         ntile(5) OVER (ORDER BY mon_cents, u) AS m_score
  FROM rfs
)
SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_users
FROM rfq GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""


def funnel_timing(
    events: DataFrame,
    step_a: str = "click",
    step_b: str = "purchase",
    n_cohorts: int = 10,
) -> DataFrame:
    """Time-to-convert: per cohort (user_id % n), users entering the
    funnel (any step-A event), users converting (a step-B event at or
    after their first step-A), and the EXACT median seconds from first
    A to first qualifying B — the two-middle-row median discipline
    (no approx percentile, no engine-divergent interpolation).
    """
    from .timeutil import epoch_long

    sec = epoch_long(F.col("ts"))
    firsts = (
        events.filter(F.col("event_type").isin(step_a, step_b))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == step_a, sec))
            .cast("long")
            .alias("_ta"),
            F.min(F.when(F.col("event_type") == step_b, sec))
            .cast("long")
            .alias("_tb_any"),
        )
        .filter(F.col("_ta").isNotNull())
    )
    # first B at/after first A: recompute against the bound, exact
    entered = firsts.select(
        "user_id", "_ta", (F.col("user_id") % n_cohorts).cast("long").alias("cohort")
    )
    b_events = events.filter(F.col("event_type") == step_b).select(
        "user_id", sec.alias("_tb")
    )
    conv = (
        entered.join(b_events, "user_id", "left")
        .filter(F.col("_tb").isNotNull() & (F.col("_tb") >= F.col("_ta")))
        .groupBy("user_id", "cohort")
        .agg((F.min("_tb") - F.min("_ta")).cast("long").alias("delta_s"))
    )
    n_entered = entered.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_entered")
    )
    wc = Window.partitionBy("cohort").orderBy("delta_s", "user_id")
    ranked = conv.select(
        "cohort",
        "delta_s",
        F.row_number().over(wc).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("cohort")).alias("_c"),
    )
    med = (
        ranked.filter(
            (F.col("_rn") == F.expr("(_c + 1) DIV 2"))
            | (F.col("_rn") == F.expr("_c DIV 2 + 1"))
        )
        .groupBy("cohort")
        .agg(
            F.max("_c").cast("long").alias("n_converted"),
            (F.sum("delta_s") / F.count(F.lit(1))).alias("median_delta_s"),
        )
    )
    return (
        n_entered.join(med, "cohort", "left")
        .select(
            "cohort",
            "n_entered",
            F.coalesce("n_converted", F.lit(0)).cast("long").alias("n_converted"),
            F.round("median_delta_s", 6).alias("median_delta_s"),
        )
        .orderBy("cohort")
    )


def funnel_timing_sql(
    events_table: str, step_a="click", step_b="purchase", n_cohorts=10
) -> str:
    return f"""ftf AS (
  SELECT user_id,
    CAST(min(CASE WHEN event_type = '{step_a}' THEN floor(epoch(ts)) END) AS BIGINT) AS ta
  FROM {events_table}
  WHERE event_type IN ('{step_a}', '{step_b}')
  GROUP BY user_id
  HAVING min(CASE WHEN event_type = '{step_a}' THEN floor(epoch(ts)) END) IS NOT NULL
),
fte AS (
  SELECT user_id, ta, CAST(user_id % {int(n_cohorts)} AS BIGINT) AS cohort FROM ftf
),
ftc AS (
  SELECT e.user_id, e.cohort,
         CAST(min(CAST(floor(epoch(b.ts)) AS BIGINT)) - min(e.ta) AS BIGINT) AS delta_s
  FROM fte e
  JOIN {events_table} b
    ON b.user_id = e.user_id AND b.event_type = '{step_b}'
   AND CAST(floor(epoch(b.ts)) AS BIGINT) >= e.ta
  GROUP BY e.user_id, e.cohort
),
ftn AS (
  SELECT cohort, CAST(count(*) AS BIGINT) AS n_entered FROM fte GROUP BY cohort
),
ftr AS (
  SELECT cohort, delta_s,
         row_number() OVER (PARTITION BY cohort ORDER BY delta_s, user_id) AS rn,
         count(*) OVER (PARTITION BY cohort) AS c
  FROM ftc
),
ftm AS (
  SELECT cohort, CAST(max(c) AS BIGINT) AS n_converted,
         CAST(sum(delta_s) AS DOUBLE) / count(*) AS median_delta_s
  FROM ftr
  WHERE rn = (c + 1) // 2 OR rn = c // 2 + 1
  GROUP BY cohort
)
SELECT ftn.cohort, n_entered,
  CAST(coalesce(n_converted, 0) AS BIGINT) AS n_converted,
  round(median_delta_s, 6) AS median_delta_s
FROM ftn LEFT JOIN ftm ON ftn.cohort = ftm.cohort
ORDER BY ftn.cohort"""

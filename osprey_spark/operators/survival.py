"""Survival analysis over conversation lifetimes.

Kaplan-Meier product-limit estimation (Kaplan & Meier, JASA 1958) —
the right-censoring-aware answer to "how long do conversations
live?" that a naive duration histogram gets wrong: conversations
still active at the observation horizon have not *ended*, and
counting them as short-lived biases every percentile downward. KM
treats them as censored — they contribute to the at-risk set up to
their observed duration and then drop out without counting as a
death.

Reference framing: osprey's analytics stack answers retention-style
questions with raw event counts (ref: osprey_ui timeseries views);
the product-limit curve is the principled lifetime statistic a
safety/ops team layers on the same turn stream ("after the new rule
shipped, did conversations start dying earlier?").

Engine shape (100 TB-minded):
- ONE hash aggregate collapses the turn stream to a per-conversation
  (duration, last-activity) row — map-side partials, the conv_stats
  shuffle key.
- A 1-row global-max frame broadcasts back for the censoring test
  (the decay_score allowlisted class) — no second pass, no collect.
- Durations bucket to ``bucket_s`` (the hist_quantiles discipline),
  so the distinct-time frame is bounded by the observation span,
  never the corpus: the window cumsum and the product fold run over
  at most (max duration / bucket) rows.
- The survival curve is one left fold over the bucket-sorted factor
  array on a SINGLE bounded row (the textrank boundedness class);
  each factor is exactly ``(n_i - d_i)/n_i`` — one integer/integer
  double division — and the running product is a fixed-order chain,
  so the DuckDB replay (per-row prefix fold over a cumulative-list
  window; prefix values of a left fold ARE the left fold's
  intermediate accumulators) is hash-exact.

Conventions pinned by tests:
- A conversation is an EVENT (ended) iff its last activity is at
  least ``horizon_s`` seconds before the global max timestamp;
  otherwise CENSORED (still alive at the horizon).
- Deaths and same-bucket censored rows both count as at-risk in
  their own bucket (censoring-after-events, the standard KM tie
  convention).
- Censor-only buckets appear in the output with factor 1 (survival
  unchanged) rather than being dropped — the curve is read directly
  off the frame without gap-filling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .timeutil import epoch_long


def km_survival(
    turns: DataFrame,
    horizon_s: int = 86400,
    bucket_s: int = 3600,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Kaplan-Meier survival curve over per-conversation lifetimes.

    Output: one row per observed duration bucket —
    ``(t_bucket, n_risk, d_events, c_censored, survival)`` with
    ``survival`` the product-limit estimate S(t) rounded to 6.
    """
    if int(bucket_s) < 1:
        raise ValueError("km_survival: bucket_s must be >= 1")
    if int(horizon_s) < 0:
        raise ValueError("km_survival: horizon_s must be >= 0")
    ts = F.col(ts_col)
    life = turns.groupBy(conv_col).agg(
        (epoch_long(F.max(ts)) - epoch_long(F.min(ts))).alias("_dur"),
        epoch_long(F.max(ts)).alias("_last"),
    )
    glob = turns.agg(epoch_long(F.max(ts)).alias("_gmax"))
    marked = life.join(F.broadcast(glob)).select(
        F.floor(F.col("_dur").cast("double") / F.lit(float(bucket_s)))
        .cast("long")
        .alias("_t"),
        (F.col("_last") <= F.col("_gmax") - F.lit(int(horizon_s)))
        .cast("long")
        .alias("_e"),
    )
    groups = marked.groupBy("_t").agg(
        F.sum("_e").cast("long").alias("_d"),
        F.sum(F.lit(1) - F.col("_e")).cast("long").alias("_c"),
    )
    # bounded frame (<= span/bucket rows): the single-partition window
    # is by design, same as classifier_eval's distinct-score ranks
    w_cum = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("_t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sz = F.col("_d") + F.col("_c")
    staged = groups.select(
        "_t",
        "_d",
        "_c",
        (F.sum(sz).over(w_all) - (F.sum(sz).over(w_cum) - sz))
        .cast("long")
        .alias("_n"),
    )
    packed = staged.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("_t").alias("t"),
                    F.col("_d").alias("d"),
                    F.col("_c").alias("c"),
                    F.col("_n").alias("n"),
                )
            )
        ).alias("_arr")
    )

    def _step(acc: Column, x: Column) -> Column:
        return F.concat(
            acc,
            F.array(
                F.element_at(acc, F.size(acc))
                * ((x["n"] - x["d"]).cast("double") / x["n"].cast("double"))
            ),
        )

    fold = F.aggregate(F.col("_arr"), F.array(F.lit(1.0)), _step)

    # the fold feeds ONE generator via the single-element-array
    # let-binding (the burst_spans re-inline lesson); _arr itself is a
    # real aggregate output column, evaluated once by construction
    def _rows_of(sf: Column) -> Column:
        return F.zip_with(
            F.col("_arr"),
            F.slice(sf, 2, F.size(F.col("_arr"))),
            lambda e, s: F.struct(
                e["t"].alias("t"),
                e["d"].alias("d"),
                e["c"].alias("c"),
                e["n"].alias("n"),
                s.alias("surv"),
            ),
        )

    rows = F.explode(F.element_at(F.transform(F.array(fold), _rows_of), 1))
    return (
        packed.select(rows.alias("_r"))
        .select(
            F.col("_r.t").alias("t_bucket"),
            F.col("_r.n").alias("n_risk"),
            F.col("_r.d").alias("d_events"),
            F.col("_r.c").alias("c_censored"),
            F.round(F.col("_r.surv"), 6).alias("survival"),
        )
        .orderBy("t_bucket")
    )


def km_survival_sql(
    table: str, horizon_s: int = 86400, bucket_s: int = 3600
) -> str:
    """DuckDB replay of :func:`km_survival`. The survival value for
    bucket i is the left fold of factors 1..i — computed per row via
    a cumulative-list window + ``list_reduce`` with a prepended
    ``[1.0]`` seed (the same-type-accumulator constraint: factors
    ride as single-element DOUBLE[] so acc and element types match).
    The prefix values of Spark's single packed left fold are exactly
    these per-row folds, so every double matches bit-for-bit."""
    bs = repr(float(bucket_s))
    return f"""life AS (
  SELECT conv_id,
    CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS dur,
    CAST(floor(epoch(max(ts))) AS BIGINT) AS last_s
  FROM {table} GROUP BY conv_id
),
kmarked AS (
  SELECT CAST(floor(CAST(dur AS DOUBLE) / CAST({bs} AS DOUBLE)) AS BIGINT) AS t,
    CASE WHEN last_s <= (SELECT max(last_s) FROM life) - {int(horizon_s)}
         THEN 1 ELSE 0 END AS e
  FROM life
),
kgrp AS (
  SELECT t, CAST(sum(e) AS BIGINT) AS d, CAST(sum(1 - e) AS BIGINT) AS c
  FROM kmarked GROUP BY t
),
kstaged AS (
  SELECT t, d, c,
    CAST(sum(d + c) OVER ()
         - (sum(d + c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - (d + c)) AS BIGINT) AS n
  FROM kgrp
),
kcum AS (
  SELECT t, d, c, n,
    list([CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE)])
      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fl
  FROM kstaged
)
SELECT t_bucket, n_risk, d_events, c_censored, round(lr[len(lr)], 6) AS survival
FROM (
  SELECT t AS t_bucket, n AS n_risk, d AS d_events, c AS c_censored,
    list_reduce(list_prepend(CAST([1.0] AS DOUBLE[]), fl),
                (a, x) -> list_append(a, a[len(a)] * x[1])) AS lr
  FROM kcum
)"""


def nelson_aalen(
    turns: DataFrame,
    horizon_s: int = 86400,
    bucket_s: int = 3600,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator (Nelson 1972, Aalen
    1978) over the same censored per-conversation lifetime frame as
    :func:`km_survival` — the additive dual of the product-limit
    curve: ``H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ``. Where KM answers "what fraction
    survives past t?", the hazard increments answer "how hard does
    the clock kill at t?" — a bump in dH after a rule ships is the
    direct 'conversations now die at hour 3' readout, and H is the
    better-behaved estimate in small at-risk tails (no factor ever
    hits 0). Also emits the Fleming-Harrington survival
    ``S̃(t) = exp(−H(t))`` for side-by-side comparison with KM.

    Same censoring conventions as KM (event iff last activity ≥
    ``horizon_s`` before the global max; same-bucket censored rows
    count as at-risk). Same engine shape: one conv-keyed hash
    aggregate, a 1-row broadcast horizon, a bounded distinct-bucket
    frame, and the cumulative sum runs as ONE packed left fold over
    the bucket-sorted array (each addend is a single integer/integer
    double division; prefix values of a left fold are its
    intermediate accumulators, so the DuckDB ``list_reduce`` replay
    is hash-exact — a windowed double SUM would NOT be, the engines
    associate window aggregation differently).

    Output per observed bucket: ``(t_bucket, n_risk, d_events,
    c_censored, cum_hazard, fh_survival)``, doubles rounded to 6
    (which also absorbs the JVM-vs-libm exp() 1-ulp divergence).
    """
    if int(bucket_s) < 1:
        raise ValueError("nelson_aalen: bucket_s must be >= 1")
    if int(horizon_s) < 0:
        raise ValueError("nelson_aalen: horizon_s must be >= 0")
    ts = F.col(ts_col)
    life = turns.groupBy(conv_col).agg(
        (epoch_long(F.max(ts)) - epoch_long(F.min(ts))).alias("_dur"),
        epoch_long(F.max(ts)).alias("_last"),
    )
    glob = turns.agg(epoch_long(F.max(ts)).alias("_gmax"))
    marked = life.join(F.broadcast(glob)).select(
        F.floor(F.col("_dur").cast("double") / F.lit(float(bucket_s)))
        .cast("long")
        .alias("_t"),
        (F.col("_last") <= F.col("_gmax") - F.lit(int(horizon_s)))
        .cast("long")
        .alias("_e"),
    )
    groups = marked.groupBy("_t").agg(
        F.sum("_e").cast("long").alias("_d"),
        F.sum(F.lit(1) - F.col("_e")).cast("long").alias("_c"),
    )
    w_cum = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("_t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sz = F.col("_d") + F.col("_c")
    staged = groups.select(
        "_t",
        "_d",
        "_c",
        (F.sum(sz).over(w_all) - (F.sum(sz).over(w_cum) - sz))
        .cast("long")
        .alias("_n"),
    )
    packed = staged.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("_t").alias("t"),
                    F.col("_d").alias("d"),
                    F.col("_c").alias("c"),
                    F.col("_n").alias("n"),
                )
            )
        ).alias("_arr")
    )

    def _step(acc: Column, x: Column) -> Column:
        return F.concat(
            acc,
            F.array(
                F.element_at(acc, F.size(acc))
                + x["d"].cast("double") / x["n"].cast("double")
            ),
        )

    fold = F.aggregate(F.col("_arr"), F.array(F.lit(0.0)), _step)

    # single-element-array let-binding (the km_survival/burst_spans
    # re-inline discipline): the fold is evaluated once, not per row
    def _rows_of(sf: Column) -> Column:
        return F.zip_with(
            F.col("_arr"),
            F.slice(sf, 2, F.size(F.col("_arr"))),
            lambda e, h: F.struct(
                e["t"].alias("t"),
                e["d"].alias("d"),
                e["c"].alias("c"),
                e["n"].alias("n"),
                h.alias("haz"),
            ),
        )

    rows = F.explode(F.element_at(F.transform(F.array(fold), _rows_of), 1))
    return (
        packed.select(rows.alias("_r"))
        .select(
            F.col("_r.t").alias("t_bucket"),
            F.col("_r.n").alias("n_risk"),
            F.col("_r.d").alias("d_events"),
            F.col("_r.c").alias("c_censored"),
            F.round(F.col("_r.haz"), 6).alias("cum_hazard"),
            F.round(F.exp(-F.col("_r.haz")), 6).alias("fh_survival"),
        )
        .orderBy("t_bucket")
    )


def nelson_aalen_sql(
    table: str, horizon_s: int = 86400, bucket_s: int = 3600
) -> str:
    """DuckDB replay of :func:`nelson_aalen` — same frame as the KM
    oracle, additive ``list_reduce`` fold (flat DOUBLE[] accumulator,
    seeded [0.0] CAST to DOUBLE[] — the DECIMAL-literal gotcha)."""
    bs = repr(float(bucket_s))
    return f"""nlife AS (
  SELECT conv_id,
    CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS dur,
    CAST(floor(epoch(max(ts))) AS BIGINT) AS last_s
  FROM {table} GROUP BY conv_id
),
nmarked AS (
  SELECT CAST(floor(CAST(dur AS DOUBLE) / CAST({bs} AS DOUBLE)) AS BIGINT) AS t,
    CASE WHEN last_s <= (SELECT max(last_s) FROM nlife) - {int(horizon_s)}
         THEN 1 ELSE 0 END AS e
  FROM nlife
),
ngrp AS (
  SELECT t, CAST(sum(e) AS BIGINT) AS d, CAST(sum(1 - e) AS BIGINT) AS c
  FROM nmarked GROUP BY t
),
nstaged AS (
  SELECT t, d, c,
    CAST(sum(d + c) OVER ()
         - (sum(d + c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - (d + c)) AS BIGINT) AS n
  FROM ngrp
),
ncum AS (
  SELECT t, d, c, n,
    list([CAST(d AS DOUBLE) / CAST(n AS DOUBLE)])
      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fl
  FROM nstaged
)
SELECT t_bucket, n_risk, d_events, c_censored,
  round(lr[len(lr)], 6) AS cum_hazard,
  round(exp(-lr[len(lr)]), 6) AS fh_survival
FROM (
  SELECT t AS t_bucket, n AS n_risk, d AS d_events, c AS c_censored,
    list_reduce(list_prepend(CAST([0.0] AS DOUBLE[]), fl),
                (a, x) -> list_append(a, a[len(a)] + x[1])) AS lr
  FROM ncum
)"""

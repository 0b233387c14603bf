"""Time-series forecasting over keyed event-count series — the
observability layer's "is this metric where it should be" question.
The anomaly family so far is distributional or structural:
``rate_anomaly`` (point z), ``mad_outliers`` (robust z),
``burst_spans`` (rate runs), ``changepoints`` (level shifts). This
module adds the FORECAST-RESIDUAL signal: Holt's linear-trend double
exponential smoothing (Holt 1957 / Winters 1960 lineage) with an EWMA
absolute-deviation band — a steadily GROWING metric never alarms (the
trend term absorbs it), while the same value after a flat history
does. The reference has no forecasting; rebuilt Spark-first in the
bounded-per-key-series fold style of burst_spans.

Scale shape: one hash aggregate finds each key's hour bounds, the
dense grid materializes as ``explode(sequence(...))`` capped at
``max_points`` trailing hours (span is horizon-bounded, never
row-bounded), zero-fill is a LEFT equi-join back to the sparse counts
on the same (key, hour) shuffle key, and the whole smoothing pass is
ONE pure-JVM fold per key row. No UDFs, no driver state.

Engine-exactness: counts are exact integers; α/β/γ default to exact
binary fractions (0.5 / 0.25 / 0.25) so every smoothing update is a
reproducible IEEE op; the fold accumulator is ONE FLAT array<double>
``[level, trend, ewma_absdev] || (forecast, resid, flag)*`` mirrored
verbatim by the DuckDB list_reduce replay (the burst_spans discipline
— DuckDB 1.0 resets list-typed STRUCT fields between reduce
iterations, bare lists carry), and every expensive intermediate is
let-bound through single-element-array transforms so the optimizer
cannot re-inline it per element (the textrank/changepoints lesson).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def holt_forecast(
    counts: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
    k: float = 4.0,
    warmup: int = 8,
    max_points: int = 2048,
    key_col: str = "key",
    hour_col: str = "hour",
    cnt_col: str = "cnt",
) -> DataFrame:
    """One-step-ahead Holt forecasts + anomaly flags per (key, hour).

    ``counts``: sparse (key, hour, cnt) — hour an integer bucket
    index, cnt a non-negative integer. Missing hours are ZERO-FILLED
    over each key's [min, max] hour span (an absent hour is a real
    observation of 0, and skipping it would silently stretch time);
    only the trailing ``max_points`` hours are modeled.

    Per step t >= 2: forecast ``f = l + b`` (state BEFORE seeing x_t),
    residual ``r = x_t − f``, flag = 1 iff ``|r| > k·a`` AND at least
    ``warmup`` steps were already emitted (the EWMA deviation ``a``
    starts at 0, so unwarmed flags would fire on any nonzero
    residual); then ``l' = α·x + (1−α)(l+b)``,
    ``b' = β(l'−l) + (1−β)b``, ``a' = γ|r| + (1−γ)a``. Step 1 only
    seeds ``l = x_1, b = a = 0``.

    Returns (key, hour, actual, forecast, resid, anomaly) for steps
    2..n, forecast/resid rounded to 6, anomaly an int flag.
    """
    if not (0 < alpha < 1 and 0 <= beta < 1 and 0 < gamma < 1):
        raise ValueError("holt_forecast: alpha/gamma in (0,1), beta in [0,1)")
    if warmup < 1 or max_points < 4:
        raise ValueError("holt_forecast: warmup >= 1 and max_points >= 4 required")
    sparse = counts.select(
        F.col(key_col).alias("_k"),
        F.col(hour_col).cast("long").alias("_h"),
        F.col(cnt_col).cast("long").alias("_x"),
    )
    bounds = sparse.groupBy("_k").agg(
        F.min("_h").alias("_mn"), F.max("_h").alias("_mx")
    )
    grid = bounds.select(
        "_k",
        F.explode(
            F.sequence(
                F.greatest(F.col("_mn"), F.col("_mx") - F.lit(int(max_points) - 1)),
                F.col("_mx"),
            )
        ).alias("_h"),
    )
    dense = grid.join(sparse, ["_k", "_h"], "left").select(
        "_k", "_h", F.coalesce(F.col("_x"), F.lit(0)).cast("long").alias("_x")
    )
    series = dense.groupBy("_k").agg(
        F.sort_array(F.collect_list(F.struct("_h", "_x"))).alias("_c")
    )
    staged = series.select(
        "_k",
        F.transform(F.col("_c"), lambda c: c["_h"]).alias("_hs"),
        F.transform(F.col("_c"), lambda c: c["_x"]).alias("_xs"),
        F.size(F.col("_c")).alias("_n"),
    ).filter(F.col("_n") >= 2)

    a_, b_, g_, k_ = (float(alpha), float(beta), float(gamma), float(k))

    def _fold(xs: Column) -> Column:
        def step(A: Column, x: Column) -> Column:
            xd = x.cast("double")
            l, b, a = F.element_at(A, 1), F.element_at(A, 2), F.element_at(A, 3)
            f = l + b
            r = xd - f
            emitted = ((F.size(A) - 3) / 3).cast("int")
            flag = F.when(
                (F.abs(r) > F.lit(k_) * a) & (emitted >= int(warmup)),
                F.lit(1.0),
            ).otherwise(F.lit(0.0))
            newl = F.lit(a_) * xd + F.lit(1.0 - a_) * (l + b)
            newb = (
                F.lit(b_) * ((F.lit(a_) * xd + F.lit(1.0 - a_) * (l + b)) - l)
                + F.lit(1.0 - b_) * b
            )
            newa = F.lit(g_) * F.abs(r) + F.lit(1.0 - g_) * a
            return F.when(
                F.size(A) == 0,
                F.array(xd, F.lit(0.0), F.lit(0.0)),
            ).otherwise(
                F.concat(
                    F.array(newl, newb, newa),
                    F.slice(A, 4, F.size(A) - 3),
                    F.array(f, r, flag),
                )
            )

        return F.aggregate(xs, F.array().cast("array<double>"), step)

    # the fold result feeds 3·(n−1) element_at lookups — let-bind it
    # (and hs/xs) through nested single-element-array transforms so
    # nothing re-inlines the smoothing pass per lookup
    def _rows_of(s: Column) -> Column:
        def _with_acc(acc: Column) -> Column:
            return F.transform(
                F.sequence(F.lit(1), F.size(s["xs"]) - 1),
                lambda i: F.struct(
                    F.element_at(s["hs"], (i + 1).cast("int")).alias("hour"),
                    F.element_at(s["xs"], (i + 1).cast("int")).alias("actual"),
                    F.round(
                        F.element_at(acc, (3 * i + 1).cast("int")), 6
                    ).alias("forecast"),
                    F.round(
                        F.element_at(acc, (3 * i + 2).cast("int")), 6
                    ).alias("resid"),
                    F.element_at(acc, (3 * i + 3).cast("int"))
                    .cast("int")
                    .alias("anomaly"),
                ),
            )

        return F.element_at(
            F.transform(F.array(_fold(s["xs"])), _with_acc), 1
        )

    rows = F.element_at(
        F.transform(
            F.array(F.struct(F.col("_hs").alias("hs"), F.col("_xs").alias("xs"))),
            _rows_of,
        ),
        1,
    )
    return staged.select("_k", F.explode(rows).alias("_r")).select(
        F.col("_k").alias(key_col),
        F.col("_r.hour").cast("long").alias("hour"),
        F.col("_r.actual").cast("long").alias("actual"),
        F.col("_r.forecast").alias("forecast"),
        F.col("_r.resid").alias("resid"),
        F.col("_r.anomaly").alias("anomaly"),
    )


def holt_forecast_sql(
    sparse_sql: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
    k: float = 4.0,
    warmup: int = 8,
    max_points: int = 2048,
) -> str:
    """DuckDB replay of :func:`holt_forecast`. ``sparse_sql`` must
    select (k, h, x). Same dense-grid zero-fill, same flat DOUBLE[]
    accumulator layout, same update order and parenthesization; the
    emission offset arithmetic is identical index math on both sides.
    Emission indices: after the fold, entry 3i+1..3i+3 (1-based) holds
    step i+1's (forecast, resid, flag)."""
    al, be, ga, kk = (
        repr(float(alpha)),
        repr(float(beta)),
        repr(float(gamma)),
        repr(float(k)),
    )
    one_m_al, one_m_be, one_m_ga = (
        repr(1.0 - float(alpha)),
        repr(1.0 - float(beta)),
        repr(1.0 - float(gamma)),
    )
    newl = f"({al} * X[1] + {one_m_al} * (A[1] + A[2]))"
    return f"""
sparse AS ({sparse_sql}),
fbounds AS (
  SELECT k, min(h) AS mn, max(h) AS mx FROM sparse GROUP BY k
),
fgrid AS (
  SELECT k, unnest(range(greatest(mn, mx - {int(max_points)} + 1), mx + 1)) AS h
  FROM fbounds
),
fdense AS (
  SELECT g.k, g.h, CAST(coalesce(s.x, 0) AS BIGINT) AS x
  FROM fgrid g LEFT JOIN sparse s ON s.k = g.k AND s.h = g.h
),
fseries AS (
  SELECT k, list(h ORDER BY h) AS hs, list(x ORDER BY h) AS xs
  FROM fdense GROUP BY k HAVING count(*) >= 2
),
ffolded AS (
  SELECT k, hs, xs,
    list_reduce(
      list_prepend(CAST([] AS DOUBLE[]),
        list_transform(xs, x -> CAST([x] AS DOUBLE[]))),
      (A, X) -> CASE WHEN len(A) = 0
        THEN [X[1], CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)]
        ELSE [
          {newl},
          {be} * ({newl} - A[1]) + {one_m_be} * A[2],
          {ga} * abs(X[1] - (A[1] + A[2])) + {one_m_ga} * A[3]
        ]
        || A[4:len(A)]
        || [
          A[1] + A[2],
          X[1] - (A[1] + A[2]),
          CASE WHEN abs(X[1] - (A[1] + A[2])) > {kk} * A[3]
                AND (len(A) - 3) // 3 >= {int(warmup)}
               THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
        ]
      END
    ) AS acc
  FROM fseries
)
SELECT k, CAST(hs[CAST(i + 1 AS INT)] AS BIGINT) AS hour,
  CAST(xs[CAST(i + 1 AS INT)] AS BIGINT) AS actual,
  round(acc[CAST(3 * i + 1 AS INT)], 6) AS forecast,
  round(acc[CAST(3 * i + 2 AS INT)], 6) AS resid,
  CAST(acc[CAST(3 * i + 3 AS INT)] AS INT) AS anomaly
FROM ffolded, unnest(range(1, len(xs))) AS t(i)
"""


def acf_hourly(
    turns: DataFrame, max_lag: int = 36, ts_col: str = "ts"
) -> DataFrame:
    """Autocorrelation function of the global hourly event-count
    series at lags 1..``max_lag`` — the periodicity detector the
    temporal-anomaly family lacked: daily seasonality shows as a
    lag-24 peak, weekly as lag-168, and a rate baseline that ignores
    a strong ACF peak will alarm every morning at 9am. (Kleinberg
    bursts find RUNS, changepoints find LEVEL SHIFTS, Holt absorbs
    TREND — none of them sees PERIOD.)

    The series zero-fills over the observed span (an absent hour is
    an observation of 0 — the holt_forecast convention), so its
    length is bounded by the observation span in hours, never the
    corpus: ONE hour-keyed hash aggregate collapses 10^12 turns to
    that bounded series, which then rides a single row through
    pure-JVM HOF algebra (the textrank boundedness class).

    Exact-integer discipline: per-lag cross products ``C_k``, prefix
    sums and the global first/second moments are BIGINT; the centered
    numerator/denominator expand algebraically so the only doubles
    are the mean ``m = S/n`` and one fixed-parenthesization
    combination per lag:
    ``acf_k = ((C_k − m·(A_k+B_k)) + (n−k)·m²) / (Q − m·S)``.
    Long-sum headroom: C_k ≲ n·max(x)² — at extreme per-hour volumes
    pre-scale counts (the hist_quantiles trade), documented.

    Output: one row per lag ``(lag, n_obs, acf)`` with
    ``n_obs = n − lag`` pairs; lags with fewer than 2 pairs (or a
    zero-variance series) are omitted.
    """
    if int(max_lag) < 1:
        raise ValueError("acf_hourly: max_lag must be >= 1")
    hour = F.floor(
        F.col(ts_col).cast("timestamp").cast("double") / F.lit(3600.0)
    ).cast("long")
    cnts = turns.groupBy(hour.alias("_h")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    staged = cnts.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_h"), F.col("_c")))
        ).alias("_m"),
        F.min("_h").alias("_lo"),
        F.max("_h").alias("_hi"),
    )
    xs_expr = F.transform(
        F.sequence(F.col("_lo"), F.col("_hi")),
        lambda h: F.coalesce(F.element_at(F.col("_m"), h), F.lit(0).cast("long")),
    )

    L = int(max_lag)

    def _body(xs: Column, ps: Column) -> Column:
        n = F.size(xs)
        # ps is seeded with a leading 0: ps[i + 1] = sum of first i
        s_tot = F.element_at(ps, n + 1)
        q_tot = F.aggregate(
            xs, F.lit(0).cast("long"), lambda a, v: a + v * v
        )
        m = s_tot.cast("double") / n.cast("double")
        den = q_tot.cast("double") - m * s_tot.cast("double")

        def _lag(k: Column) -> Column:
            nk = (n - k).cast("int")
            ck = F.aggregate(
                F.zip_with(
                    F.slice(xs, 1, nk),
                    F.slice(xs, (k + 1).cast("int"), nk),
                    lambda a, b: a * b,
                ),
                F.lit(0).cast("long"),
                lambda a, v: a + v,
            )
            ak = F.element_at(ps, nk + 1)
            bk = s_tot - F.element_at(ps, (k + 1).cast("int"))
            num = (ck.cast("double") - m * (ak + bk).cast("double")) + (
                nk.cast("double") * (m * m)
            )
            return F.struct(
                k.cast("int").alias("lag"),
                nk.cast("long").alias("n_obs"),
                F.round(num / den, 6).alias("acf"),
            )

        kmax = F.least(F.lit(L), n - 2)
        seq = F.when(
            (n >= 3) & (den > 0.0) & (kmax >= 1),
            F.sequence(F.lit(1).cast("long"), kmax.cast("long")),
        ).otherwise(F.array().cast("array<long>"))
        return F.transform(seq, _lag)

    # nested single-element-array let-binding: xs and its prefix-sum
    # array each evaluate ONCE (the changepoints re-inline lesson)
    def _ps_of(xs: Column) -> Column:
        # seeded with [0] so element_at(acc, size) is always valid
        return F.aggregate(
            xs,
            F.array(F.lit(0).cast("long")),
            lambda acc, v: F.concat(
                acc, F.array(F.element_at(acc, F.size(acc)) + v)
            ),
        )

    rows = F.element_at(
        F.transform(
            F.array(xs_expr),
            lambda xs: F.element_at(
                F.transform(F.array(_ps_of(xs)), lambda ps: _body(xs, ps)), 1
            ),
        ),
        1,
    )
    return (
        staged.select(F.explode(rows).alias("_r"))
        .select("_r.lag", "_r.n_obs", "_r.acf")
        .orderBy("lag")
    )


def acf_hourly_sql(table: str, max_lag: int = 36) -> str:
    """DuckDB replay of :func:`acf_hourly`: the zero-filled series
    builds by a range LEFT join, per-lag integer sums by list
    comprehensions over the one-row series, and the double
    combination mirrors the Spark parenthesization verbatim."""
    L = int(max_lag)
    return f"""
ahrs AS (
  SELECT CAST(floor(epoch(ts) / 3600.0) AS BIGINT) AS h, count(*) AS c
  FROM {table} GROUP BY 1
),
aspan AS (SELECT min(h) AS lo, max(h) AS hi FROM ahrs),
axs AS (
  SELECT list(CAST(coalesce(a.c, 0) AS BIGINT) ORDER BY g.h) AS x
  FROM (SELECT unnest(range((SELECT lo FROM aspan), (SELECT hi FROM aspan) + 1)) AS h) g
  LEFT JOIN ahrs a ON g.h = a.h
),
astat AS (
  SELECT x, len(x) AS n,
    CAST(list_sum(x) AS BIGINT) AS s,
    CAST(list_sum(list_transform(x, v -> v * v)) AS BIGINT) AS q
  FROM axs
),
alags AS (
  SELECT x, n, s, q,
    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
    CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(s AS DOUBLE) AS den,
    unnest(CASE WHEN n >= 3 AND
        CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(s AS DOUBLE) > 0.0
        AND least({L}, n - 2) >= 1
      THEN range(1, least({L}, n - 2) + 1) ELSE CAST([] AS BIGINT[]) END) AS k
  FROM astat
)
SELECT CAST(k AS INT) AS lag, CAST(n - k AS BIGINT) AS n_obs,
  round((
    (CAST(CAST(list_sum(list_transform(range(1, n - k + 1), i -> x[CAST(i AS INT)] * x[CAST(i + k AS INT)])) AS BIGINT) AS DOUBLE)
     - m * CAST(CAST(list_sum(x[1 : CAST(n - k AS INT)]) AS BIGINT)
                + (s - CAST(list_sum(x[1 : CAST(k AS INT)]) AS BIGINT)) AS DOUBLE))
    + (CAST(n - k AS DOUBLE) * (m * m))
  ) / den, 6) AS acf
FROM alags
"""


def ccf_hourly(
    turns: DataFrame,
    left_filter: Column,
    right_filter: Column,
    max_lag: int = 12,
    ts_col: str = "ts",
) -> DataFrame:
    """Cross-correlation between two hourly event-count series at
    lags −``max_lag``..+``max_lag`` — the LEAD-LAG question
    :func:`acf_hourly` cannot answer: does tool activity follow user
    activity, do errors lead complaint spikes, by how many hours? A
    positive-lag peak means the LEFT series leads (right follows
    ``lag`` hours later); the argmax lag is the pipeline delay.

    Both series zero-fill over the SHARED observed span (union of
    both series' active hours), so alignment is positional and exact.
    Same engine shape as acf_hourly: ONE hour-keyed hash aggregate
    with two conditional count columns collapses the corpus to a
    span-bounded pair of series on a single row; per-lag sums are
    exact BIGINT (cross products, prefix sums via [0]-seeded folds),
    and the only doubles are the two means and one fixed
    parenthesization per lag:
    ``ccf_k = ((C_k − mx·By_k − my·Ax_k) + (n−|k|)·mx·my)
    / sqrt((Qx − mx·Sx) · (Qy − my·Sy))``
    — the normalization uses full-series variances (the standard CCF
    convention), one IEEE sqrt on bit-identical operands.

    Output: one row per lag ``(lag, n_obs, ccf)``; degenerate
    (zero-variance either side, or span too short) yields no rows.
    """
    if int(max_lag) < 1:
        raise ValueError("ccf_hourly: max_lag must be >= 1")
    hour = F.floor(
        F.col(ts_col).cast("timestamp").cast("double") / F.lit(3600.0)
    ).cast("long")
    cnts = turns.groupBy(hour.alias("_h")).agg(
        F.sum(F.when(left_filter, 1).otherwise(0)).cast("long").alias("_cx"),
        F.sum(F.when(right_filter, 1).otherwise(0)).cast("long").alias("_cy"),
    )
    staged = cnts.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_h"), F.struct("_cx", "_cy")))
        ).alias("_m"),
        F.min("_h").alias("_lo"),
        F.max("_h").alias("_hi"),
    )
    xs_expr = F.transform(
        F.sequence(F.col("_lo"), F.col("_hi")),
        lambda h: F.coalesce(
            F.element_at(F.col("_m"), h)["_cx"], F.lit(0).cast("long")
        ),
    )
    ys_expr = F.transform(
        F.sequence(F.col("_lo"), F.col("_hi")),
        lambda h: F.coalesce(
            F.element_at(F.col("_m"), h)["_cy"], F.lit(0).cast("long")
        ),
    )

    L = int(max_lag)

    def _ps_of(arr: Column) -> Column:
        return F.aggregate(
            arr,
            F.array(F.lit(0).cast("long")),
            lambda acc, v: F.concat(
                acc, F.array(F.element_at(acc, F.size(acc)) + v)
            ),
        )

    def _body(xs: Column, ys: Column, psx: Column, psy: Column) -> Column:
        n = F.size(xs)
        sx = F.element_at(psx, n + 1)
        sy = F.element_at(psy, n + 1)
        qx = F.aggregate(xs, F.lit(0).cast("long"), lambda a, v: a + v * v)
        qy = F.aggregate(ys, F.lit(0).cast("long"), lambda a, v: a + v * v)
        mx = sx.cast("double") / n.cast("double")
        my = sy.cast("double") / n.cast("double")
        denx = qx.cast("double") - mx * sx.cast("double")
        deny = qy.cast("double") - my * sy.cast("double")
        den = F.sqrt(denx * deny)

        def _lag(k: Column) -> Column:
            # lag k: pair x_t with y_{t+k}; negative k pairs x_{t-k}
            # with y_t, i.e. the x slice starts at 1-k
            ka = F.abs(k).cast("int")
            nk = (n - ka).cast("int")
            xoff = F.when(k >= 0, F.lit(1)).otherwise(1 - k).cast("int")
            yoff = F.when(k >= 0, k + 1).otherwise(F.lit(1)).cast("int")
            ck = F.aggregate(
                F.zip_with(
                    F.slice(xs, xoff, nk),
                    F.slice(ys, yoff, nk),
                    lambda a, b: a * b,
                ),
                F.lit(0).cast("long"),
                lambda a, v: a + v,
            )
            # window sum over [off, off+nk-1] with ps[i+1] = prefix(i):
            # prefix(off+nk-1) - prefix(off-1) = ps[off+nk] - ps[off]
            ax = F.element_at(psx, xoff + nk) - F.element_at(psx, xoff)
            by = F.element_at(psy, yoff + nk) - F.element_at(psy, yoff)
            num = (
                ck.cast("double") - mx * by.cast("double") - my * ax.cast("double")
            ) + (nk.cast("double") * (mx * my))
            return F.struct(
                k.cast("int").alias("lag"),
                nk.cast("long").alias("n_obs"),
                F.round(num / den, 6).alias("ccf"),
            )

        kmax = F.least(F.lit(L), n - 2)
        seq = F.when(
            (n >= 3) & (denx > 0.0) & (deny > 0.0) & (kmax >= 1),
            F.sequence(-kmax.cast("long"), kmax.cast("long")),
        ).otherwise(F.array().cast("array<long>"))
        return F.transform(seq, _lag)

    rows = F.element_at(
        F.transform(
            F.array(xs_expr),
            lambda xs: F.element_at(
                F.transform(
                    F.array(ys_expr),
                    lambda ys: F.element_at(
                        F.transform(
                            F.array(_ps_of(xs)),
                            lambda psx: F.element_at(
                                F.transform(
                                    F.array(_ps_of(ys)),
                                    lambda psy: _body(xs, ys, psx, psy),
                                ),
                                1,
                            ),
                        ),
                        1,
                    ),
                ),
                1,
            ),
        ),
        1,
    )
    return (
        staged.select(F.explode(rows).alias("_r"))
        .select("_r.lag", "_r.n_obs", "_r.ccf")
        .orderBy("lag")
    )


def ccf_hourly_sql(
    table: str, left_pred: str, right_pred: str, max_lag: int = 12
) -> str:
    """DuckDB replay of :func:`ccf_hourly`. ``left_pred`` /
    ``right_pred`` are SQL boolean expressions over ``table``'s
    columns. Integer sums may take any path (they are exact); the
    double combination mirrors the Spark parenthesization verbatim."""
    L = int(max_lag)
    return f"""
chrs AS (
  SELECT CAST(floor(epoch(ts) / 3600.0) AS BIGINT) AS h,
    CAST(sum(CASE WHEN {left_pred} THEN 1 ELSE 0 END) AS BIGINT) AS cx,
    CAST(sum(CASE WHEN {right_pred} THEN 1 ELSE 0 END) AS BIGINT) AS cy
  FROM {table} GROUP BY 1
),
cspan AS (SELECT min(h) AS lo, max(h) AS hi FROM chrs),
cxs AS (
  SELECT list(CAST(coalesce(a.cx, 0) AS BIGINT) ORDER BY g.h) AS x,
         list(CAST(coalesce(a.cy, 0) AS BIGINT) ORDER BY g.h) AS y
  FROM (SELECT unnest(range((SELECT lo FROM cspan), (SELECT hi FROM cspan) + 1)) AS h) g
  LEFT JOIN chrs a ON g.h = a.h
),
cstat AS (
  SELECT x, y, len(x) AS n,
    CAST(list_sum(x) AS BIGINT) AS sx, CAST(list_sum(y) AS BIGINT) AS sy,
    CAST(list_sum(list_transform(x, v -> v * v)) AS BIGINT) AS qx,
    CAST(list_sum(list_transform(y, v -> v * v)) AS BIGINT) AS qy
  FROM cxs
),
cmeans AS (
  SELECT x, y, n, sx, sy,
    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
    CAST(qx AS DOUBLE) - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(sx AS DOUBLE) AS denx,
    CAST(qy AS DOUBLE) - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(sy AS DOUBLE) AS deny
  FROM cstat
),
clag AS (
  SELECT x, y, n, mx, my, denx, deny,
    unnest(CASE WHEN n >= 3 AND denx > 0.0 AND deny > 0.0 AND least({L}, n - 2) >= 1
      THEN range(-least({L}, n - 2), least({L}, n - 2) + 1)
      ELSE CAST([] AS BIGINT[]) END) AS k
  FROM cmeans
),
coff AS (
  SELECT *, n - abs(k) AS nk,
    CASE WHEN k >= 0 THEN 1 ELSE 1 - k END AS xoff,
    CASE WHEN k >= 0 THEN k + 1 ELSE 1 END AS yoff
  FROM clag
),
csums AS (
  SELECT k, nk, mx, my, denx, deny,
    CAST(list_sum(list_transform(range(0, nk),
      i -> x[CAST(xoff + i AS INT)] * y[CAST(yoff + i AS INT)])) AS BIGINT) AS ck,
    CAST(list_sum(x[CAST(xoff AS INT) : CAST(xoff + nk - 1 AS INT)]) AS BIGINT) AS ax,
    CAST(list_sum(y[CAST(yoff AS INT) : CAST(yoff + nk - 1 AS INT)]) AS BIGINT) AS by
  FROM coff
)
SELECT CAST(k AS INT) AS lag, CAST(nk AS BIGINT) AS n_obs,
  round(((CAST(ck AS DOUBLE) - mx * CAST(by AS DOUBLE) - my * CAST(ax AS DOUBLE))
         + (CAST(nk AS DOUBLE) * (mx * my))) / sqrt(denx * deny), 6) AS ccf
FROM csums
"""


def theil_sen(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    bucket_s: int = 3600,
    min_points: int = 3,
    cap: int = 128,
    seed: str = "ts1",
) -> DataFrame:
    """Theil-Sen robust trend (Theil 1950, Sen 1968) per key over its
    per-bucket event-count series: the MEDIAN of all pairwise slopes
    (cⱼ−cᵢ)/(bⱼ−bᵢ) — the trend line one outlier burst cannot drag
    (29.3% breakdown point), where an OLS slope moves with every
    spike. The 'is this account actually ramping up, or did it have
    one bad hour?' discriminator, complementing Holt (which smooths)
    and the MAD z (which flags single points).

    Series support: OBSERVED buckets only (the ACF/Fano discipline —
    empty hours never materialize; the estimate is the trend of
    activity WHEN ACTIVE, documented semantics). Pair fan-out is the
    scale hazard: n observed buckets emit C(n,2) pairs, so ``cap``
    bounds each key to the cap smallest seeded-md5 bucket draws
    (unbiased, engine-replayable — the cooccurrence subsample):
    ≤ C(cap,2) pairs per key, linear in keys overall.

    Exactness: each slope is ONE IEEE double division of integer
    differences (bit-identical across engines); the median picks the
    two middle rows of the (slope, b1, b2)-ordered pair frame via
    row_number and averages them as (s_lo + s_hi)/2 — odd n_pairs
    makes the rows coincide so the halving is exact, and the
    selection sum only ever adds exact-zero products (x + 0.0 == x),
    so the statistic is partition-order independent and the DuckDB
    replay is hash-exact.

    Plan shape: one (key, bucket) hash aggregate, one cap window on
    the key shuffle, one key-equi self-join (b1 < b2), one ranking
    window + one partition-count window over the per-key pair frame,
    one final key aggregate. Output: ``(key, n_points, n_pairs,
    slope)`` (events/bucket, rounded 6) for keys with ≥
    ``min_points`` observed buckets, ordered by key.
    """
    if int(bucket_s) < 1:
        raise ValueError("theil_sen: bucket_s must be >= 1")
    if int(min_points) < 2:
        raise ValueError("theil_sen: min_points must be >= 2")
    if int(cap) < int(min_points):
        raise ValueError("theil_sen: cap must be >= min_points")
    b = F.floor(
        F.col(ts_col).cast("timestamp").cast("double") / F.lit(float(bucket_s))
    ).cast("long")
    per = df.groupBy(F.col(key_col).alias("_k"), b.alias("_b")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    draw = F.md5(
        F.concat(
            F.lit(f"{seed}:"),
            F.col("_k").cast("string"),
            F.lit(":"),
            F.col("_b").cast("string"),
        )
    )
    w_cap = Window.partitionBy("_k").orderBy(draw, "_b")
    capped = (
        per.withColumn("_rn", F.row_number().over(w_cap))
        .filter(F.col("_rn") <= int(cap))
        .select("_k", "_b", "_c")
    )
    a = capped.select("_k", F.col("_b").alias("_b1"), F.col("_c").alias("_c1"))
    bb = capped.select("_k", F.col("_b").alias("_b2"), F.col("_c").alias("_c2"))
    pairs = (
        a.join(bb, "_k")
        .filter(F.col("_b1") < F.col("_b2"))
        .select(
            "_k",
            "_b1",
            "_b2",
            (
                (F.col("_c2") - F.col("_c1")).cast("double")
                / (F.col("_b2") - F.col("_b1")).cast("double")
            ).alias("_s"),
        )
    )
    w_rank = Window.partitionBy("_k").orderBy("_s", "_b1", "_b2")
    w_all = Window.partitionBy("_k")
    ranked = pairs.select(
        "_k",
        "_s",
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("_np"),
    )
    lo = F.expr("(_np + 1) div 2")
    hi = F.expr("(_np + 2) div 2")
    pick = (F.col("_rn") == lo).cast("int") + (F.col("_rn") == hi).cast("int")
    med = ranked.groupBy("_k").agg(
        F.max("_np").alias("n_pairs"),
        (F.sum(F.col("_s") * pick.cast("double")) / F.lit(2.0)).alias("_med"),
    )
    npts = capped.groupBy("_k").agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    return (
        npts.filter(F.col("n_points") >= int(min_points))
        .join(med, "_k")
        .select(
            F.col("_k").alias(key_col),
            "n_points",
            "n_pairs",
            F.round("_med", 6).alias("slope"),
        )
        .orderBy(key_col)
    )


def theil_sen_sql(
    table: str,
    key_col: str = "conv_id",
    bucket_s: int = 3600,
    min_points: int = 3,
    cap: int = 128,
    seed: str = "ts1",
) -> str:
    """DuckDB replay of :func:`theil_sen` — same capped frame, same
    IEEE slope divisions, same two-middle-row median selection."""
    bs = repr(float(bucket_s))
    return f"""tsper AS (
  SELECT {key_col} AS k,
    CAST(floor(epoch(ts) / CAST({bs} AS DOUBLE)) AS BIGINT) AS b,
    CAST(count(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2
),
tscap AS (
  SELECT k, b, c FROM (
    SELECT k, b, c,
      row_number() OVER (
        PARTITION BY k
        ORDER BY md5('{seed}:' || CAST(k AS VARCHAR) || ':' || CAST(b AS VARCHAR)), b
      ) AS rn
    FROM tsper
  ) WHERE rn <= {int(cap)}
),
tspairs AS (
  SELECT a.k, a.b AS b1, p.b AS b2,
    CAST(p.c - a.c AS DOUBLE) / CAST(p.b - a.b AS DOUBLE) AS s
  FROM tscap a JOIN tscap p ON a.k = p.k AND a.b < p.b
),
tsranked AS (
  SELECT k, s,
    row_number() OVER (PARTITION BY k ORDER BY s, b1, b2) AS rn,
    CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS np
  FROM tspairs
),
tsmed AS (
  SELECT k, CAST(max(np) AS BIGINT) AS n_pairs,
    sum(s * CAST((CAST(rn = (np + 1) // 2 AS INT)
                  + CAST(rn = (np + 2) // 2 AS INT)) AS DOUBLE)) / 2.0 AS med
  FROM tsranked GROUP BY k
),
tsnpts AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_points FROM tscap GROUP BY k
)
SELECT n.k AS {key_col}, n.n_points, m.n_pairs, round(m.med, 6) AS slope
FROM tsnpts n JOIN tsmed m ON n.k = m.k
WHERE n.n_points >= {int(min_points)}"""


def seasonal_profile(
    df: DataFrame,
    ts_col: str = "ts",
    bucket_s: int = 3600,
    period: int = 24,
    outlier_mult: float = 3.0,
) -> DataFrame:
    """Seasonal (time-of-day) traffic baseline with robust outliers:
    the corpus's per-phase MEDIAN load and the occurrences that blow
    past it — the 'is 3am traffic supposed to look like this?'
    readout that a global mean hides (one hot day drags a mean; the
    median doesn't budge) and per-key z-scores can't see (a
    coordinated burst is each key behaving modestly). Default phase
    = hour-of-day over hourly buckets.

    Shape: one (cycle, phase) hash aggregate over the event stream
    (map-side partials), then ALL statistics on the bounded
    phase-profile frame (≤ period × observed-cycles rows): the
    median picks the two middle rows per phase via row_number + a
    partition count (the theil_sen selection — nothing
    order-dependent floats), outliers compare each occurrence
    against ``outlier_mult ×`` the phase median. Output per phase:
    ``(phase, n_cycles, median_cnt, max_cnt, n_outliers)``.
    """
    if int(bucket_s) < 1:
        raise ValueError("seasonal_profile: bucket_s must be >= 1")
    if int(period) < 2:
        raise ValueError("seasonal_profile: period must be >= 2")
    sec = F.col(ts_col).cast("timestamp").cast("long")
    per = (
        df.select(sec.alias("__sp_sec"))
        .select(
            F.expr(f"(__sp_sec DIV {int(bucket_s)}) DIV {int(period)}").alias(
                "_cyc"
            ),
            F.expr(
                f"(__sp_sec DIV {int(bucket_s)}) % {int(period)}"
            ).alias("_ph"),
        )
        .groupBy("_cyc", "_ph")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    w_rank = Window.partitionBy("_ph").orderBy("_c", "_cyc")
    w_all = Window.partitionBy("_ph")
    ranked = per.select(
        "_ph",
        "_cyc",
        "_c",
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("_np"),
    )
    lo = F.expr("(_np + 1) div 2")
    hi = F.expr("(_np + 2) div 2")
    pick = (F.col("_rn") == lo).cast("int") + (F.col("_rn") == hi).cast("int")
    med = ranked.groupBy("_ph").agg(
        F.max("_np").alias("n_cycles"),
        (
            F.sum(F.col("_c").cast("double") * pick.cast("double")) / F.lit(2.0)
        ).alias("_med"),
        F.max("_c").cast("long").alias("max_cnt"),
    )
    joined = per.join(med, "_ph")
    out = joined.groupBy("_ph").agg(
        F.max("n_cycles").cast("long").alias("n_cycles"),
        F.max("_med").alias("_medv"),
        F.max("max_cnt").cast("long").alias("max_cnt"),
        F.sum(
            (
                F.col("_c").cast("double")
                > F.lit(float(outlier_mult)) * F.col("_med")
            ).cast("long")
        )
        .cast("long")
        .alias("n_outliers"),
    )
    return out.select(
        F.col("_ph").cast("long").alias("phase"),
        "n_cycles",
        F.round(F.col("_medv"), 6).alias("median_cnt"),
        "max_cnt",
        "n_outliers",
    ).orderBy("phase")


def seasonal_profile_sql(
    table: str,
    bucket_s: int = 3600,
    period: int = 24,
    outlier_mult: float = 3.0,
) -> str:
    """DuckDB replay of :func:`seasonal_profile`."""
    return f"""spper AS (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // {int(bucket_s)}) // {int(period)} AS cyc,
         (CAST(floor(epoch(ts)) AS BIGINT) // {int(bucket_s)}) % {int(period)} AS ph,
         CAST(count(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2
),
spranked AS (
  SELECT ph, cyc, c,
    row_number() OVER (PARTITION BY ph ORDER BY c, cyc) AS rn,
    CAST(count(*) OVER (PARTITION BY ph) AS BIGINT) AS np
  FROM spper
),
spmed AS (
  SELECT ph, CAST(max(np) AS BIGINT) AS n_cycles,
    sum(CAST(c AS DOUBLE) * CAST((CAST(rn = (np + 1) // 2 AS INT)
        + CAST(rn = (np + 2) // 2 AS INT)) AS DOUBLE)) / 2.0 AS med,
    CAST(max(c) AS BIGINT) AS max_cnt
  FROM spranked GROUP BY ph
)
SELECT p.ph AS phase,
  CAST(max(m.n_cycles) AS BIGINT) AS n_cycles,
  round(max(m.med), 6) AS median_cnt,
  CAST(max(m.max_cnt) AS BIGINT) AS max_cnt,
  CAST(sum(CAST(CAST(p.c AS DOUBLE) > {float(outlier_mult)!r} * m.med AS BIGINT)) AS BIGINT)
    AS n_outliers
FROM spper p JOIN spmed m ON p.ph = m.ph
GROUP BY p.ph ORDER BY phase"""


def cusum_drift(
    hourly: DataFrame,
    ts_col: str = "hour_ts",
    cnt_col: str = "cnt",
    warmup: int = 24,
    k_pct: int = 10,
    h_mult: int = 3,
) -> DataFrame:
    """One-sided positive CUSUM drift alarms over an hourly count
    series (Page 1954) — "the rate has SHIFTED", the sustained-drift
    complement to rate_anomaly's spike z-scores (a +15% drift never
    trips a 3-sigma spike test; CUSUM accumulates it).

    INTEGER-exact throughout: the reference level is the quantized
    warmup mean ``mu_q = (sum(first warmup hours) * 10^6) DIV warmup``,
    allowance ``k_q = mu_q * k_pct DIV 100``, threshold ``h_q = mu_q *
    h_mult``. The clamp fold ``s_i = max(0, s_{i-1} + x_i - mu - k)``
    is computed WITHOUT a sequential fold via the prefix-sum identity
    ``s_i = P_i - min(0, min_{j<=i} P_j)`` with ``P`` the plain
    cumulative sum of deviations — two window passes over the BOUNDED
    hour frame (the hist_quantiles frame class), no HOF state, same
    SQL in DuckDB.

    Output: alarm rows ``(hour_ts, cusum_q)`` where the statistic
    exceeds h_q, cusum_q in mu-quanta (BIGINT — exact, no doubles).
    """
    q = 10**6
    w_ord = Window.orderBy(ts_col)
    wu = hourly.orderBy(ts_col).limit(int(warmup)).agg(
        (F.sum(cnt_col) * q).cast("long").alias("_s"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    ).select(
        F.expr(f"_s DIV greatest(_n, 1)").alias("_mu_q")
    ).select(
        "_mu_q",
        F.expr(f"_mu_q * {int(k_pct)} DIV 100").alias("_k_q"),
        (F.col("_mu_q") * int(h_mult)).alias("_h_q"),
    )
    dev = hourly.join(F.broadcast(wu)).select(
        F.col(ts_col),
        (F.col(cnt_col).cast("long") * q - F.col("_mu_q") - F.col("_k_q"))
        .cast("long")
        .alias("_dx"),
        "_h_q",
    )
    cum = dev.select(
        ts_col,
        F.sum("_dx").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("_p"),
        "_h_q",
    )
    s = cum.select(
        ts_col,
        (
            F.col("_p")
            - F.least(
                F.lit(0).cast("long"),
                F.min("_p").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
        )
        .cast("long")
        .alias("cusum_q"),
        "_h_q",
    )
    return (
        s.filter(F.col("cusum_q") > F.col("_h_q"))
        .select(ts_col, "cusum_q")
        .orderBy(ts_col)
    )


def cusum_drift_sql(
    hourly_sql: str,
    ts_col: str = "hour_ts",
    cnt_col: str = "cnt",
    warmup: int = 24,
    k_pct: int = 10,
    h_mult: int = 3,
) -> str:
    """DuckDB replay of :func:`cusum_drift` over a subquery producing
    the hourly frame — same quantized reference, same prefix-sum
    identity."""
    q = 10**6
    return f"""cuh AS (SELECT {ts_col}, {cnt_col} FROM ({hourly_sql})),
cuwu AS (
  SELECT CAST(sum({cnt_col}) * {q} AS BIGINT) // greatest(count(*), 1) AS mu_q
  FROM (SELECT {cnt_col} FROM cuh ORDER BY {ts_col} LIMIT {int(warmup)})
),
cuk AS (
  SELECT mu_q, mu_q * {int(k_pct)} // 100 AS k_q,
         mu_q * {int(h_mult)} AS h_q
  FROM cuwu
),
cud AS (
  SELECT {ts_col},
    CAST(CAST({cnt_col} AS BIGINT) * {q} - mu_q - k_q AS BIGINT) AS dx, h_q
  FROM cuh CROSS JOIN cuk
),
cup AS (
  SELECT {ts_col},
    CAST(sum(dx) OVER (ORDER BY {ts_col} ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS p, h_q
  FROM cud
),
cus AS (
  SELECT {ts_col},
    CAST(p - least(CAST(0 AS BIGINT),
                   min(p) OVER (ORDER BY {ts_col} ROWS BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW)) AS BIGINT)
      AS cusum_q,
    h_q
  FROM cup
)
SELECT {ts_col}, cusum_q FROM cus WHERE cusum_q > h_q ORDER BY {ts_col}"""

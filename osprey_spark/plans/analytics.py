"""UI analytics operators over the execution-results table.

Reimplements the reference's ClickHouse query builders
(ref: osprey_worker/src/osprey/worker/ui_api/osprey/lib/clickhouse.py)
as Spark DataFrame plans. All are single-pass aggregations with
map-side partial aggregation; TopN+PoP is two filtered aggregations
over one scan joined on the (small) dimension domain — the join is
broadcast by AQE since TopN output is ≤ limit rows.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GRANULARITY_TRUNC = {
    # ref: clickhouse.py:158-167 granularity map
    "minute": "minute",
    "hour": "hour",
    "day": "day",
    "week": "week",
    "month": "month",
}


def topn(
    df: DataFrame,
    dim: str,
    limit: int = 10,
    where: Optional[Column] = None,
) -> DataFrame:
    """TopN for one period (ref: clickhouse.py:346-371).

    Deterministic tie-break by dimension value (the reference's
    ClickHouse ORDER BY count DESC leaves ties unspecified; we pin
    them for oracle comparison).
    """
    if where is not None:
        df = df.filter(where)
    return (
        df.groupBy(F.col(dim).alias("dim"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("dim"))
        .limit(limit)
    )


def topn_pop(
    df: DataFrame,
    dim: str,
    ts_col: str,
    period_start,
    period_end,
    limit: int = 10,
    where: Optional[Column] = None,
) -> DataFrame:
    """TopN with period-over-period comparison
    (ref: clickhouse.py:398-440): current period TopN, full-outer
    joined with the previous equal-length period's counts, diff +
    pct-change.

    One scan: both periods aggregated with conditional counts, so no
    second pass over the fact table; at 100 TB this is a single
    shuffle on `dim` instead of two scans + a join.
    """
    if where is not None:
        df = df.filter(where)
    ts = F.col(ts_col).cast("timestamp")
    cur = (ts >= F.lit(period_start)) & (ts < F.lit(period_end))
    span = F.lit(period_end).cast("timestamp").cast("double") - F.lit(period_start).cast(
        "timestamp"
    ).cast("double")
    prev_start = F.lit(period_start).cast("timestamp").cast("double") - span
    prev = (ts.cast("double") >= prev_start) & (ts < F.lit(period_start))
    agg = (
        df.filter(cur | prev)
        .groupBy(F.col(dim).alias("dim"))
        .agg(
            F.sum(F.when(cur, 1).otherwise(0)).alias("n_current"),
            F.sum(F.when(prev, 1).otherwise(0)).alias("n_previous"),
        )
        .filter(F.col("n_current") > 0)
        .withColumn("delta", F.col("n_current") - F.col("n_previous"))
        .withColumn(
            "pct_change",
            F.when(
                F.col("n_previous") > 0,
                F.round((F.col("n_current") - F.col("n_previous")) * 100.0 / F.col("n_previous"), 4),
            ),
        )
        .orderBy(F.desc("n_current"), F.asc("dim"))
        .limit(limit)
    )
    return agg


def timeseries(
    df: DataFrame,
    ts_col: str,
    granularity: str = "hour",
    agg_dim: Optional[str] = None,
    where: Optional[Column] = None,
) -> DataFrame:
    """Event counts per time bucket (ref: clickhouse.py:154-205),
    optionally per agg-dimension value (the `countIf` variant)."""
    if where is not None:
        df = df.filter(where)
    trunc = _GRANULARITY_TRUNC[granularity]
    bucket = F.date_trunc(trunc, F.col(ts_col).cast("timestamp")).alias("bucket")
    keys = [bucket] + ([F.col(agg_dim).alias("dim")] if agg_dim else [])
    out = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    return out.orderBy(*[c for c in ("bucket", "dim") if c in out.columns])


def paginated_scan(
    df: DataFrame,
    ts_col: str,
    cursor=None,
    limit: int = 100,
    columns: Optional[Sequence[str]] = None,
    where: Optional[Column] = None,
) -> DataFrame:
    """Time-ordered scan with cursor pagination
    (ref: clickhouse.py:208-255): newest-first, ``ts < cursor``
    predicate, LIMIT n. The predicate reaches the parquet/Iceberg
    scan as a pushed filter → partition pruning on ts-partitioned
    sinks."""
    if where is not None:
        df = df.filter(where)
    if cursor is not None:
        df = df.filter(F.col(ts_col) < F.lit(cursor))
    if columns:
        df = df.select(*columns)
    return df.orderBy(F.desc(ts_col)).limit(limit)


def count_distinct(df: DataFrame, dim: str, group_by: Optional[str] = None) -> DataFrame:
    """Exact distinct (oracle-comparable variant of clickhouse.py
    :258-274)."""
    keys = [F.col(group_by).alias("grp")] if group_by else []
    out = df.groupBy(*keys).agg(F.countDistinct(dim).alias("n_distinct"))
    return out.orderBy("grp") if group_by else out


def approx_distinct(df: DataFrame, dim: str, rsd: float = 0.05, group_by: Optional[str] = None) -> DataFrame:
    """``uniq(dim)`` (ref: clickhouse.py:258-274) →
    approx_count_distinct (HyperLogLog++). The scale path: one pass,
    no distinct shuffle."""
    keys = [F.col(group_by).alias("grp")] if group_by else []
    out = df.groupBy(*keys).agg(F.approx_count_distinct(dim, rsd).alias("n_approx"))
    return out.orderBy("grp") if group_by else out


MAX_CSV_ROWS = 100_000


def export_topn_csv(
    df: DataFrame,
    dim: str,
    path: str,
    limit: int = 10,
    where: Optional[Column] = None,
    pop_args: Optional[dict] = None,
) -> None:
    """CSV export of a TopN (ref: worker/ui_api/osprey/views/
    events.py:145-224 ``topn_query_csv``): plain TopN exports
    (dimension, current_count); with ``pop_args`` (ts_col/period_start/
    period_end) the PoP columns (previous_count, difference,
    percent_diff) are included, and the row cap mirrors the
    reference's MAX_CSV_ROWS. Single file with header — an ops export,
    not a data-lake write."""
    limit = min(limit, MAX_CSV_ROWS)
    if pop_args:
        out = topn_pop(df, dim, limit=limit, where=where, **pop_args).select(
            F.col("dim").alias(dim),
            F.col("n_current").alias("current_count"),
            F.col("n_previous").alias("previous_count"),
            F.col("delta").alias("difference"),
            F.col("pct_change").alias("percent_diff"),
        )
    else:
        out = topn(df, dim, limit=limit, where=where).select(
            F.col("dim").alias(dim), F.col("n").alias("current_count")
        )
    out.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def fetch_event(df: DataFrame, action_id: int, id_col: str = "__action_id") -> DataFrame:
    """Single stored execution result by action id
    (ref: worker/ui_api/osprey/views/events.py:227-239
    ``get_event_data``). The equality predicate pushes down to the
    scan; on an id-sorted/bucketed results table this is a
    partition-pruned point lookup."""
    return df.filter(F.col(id_col) == F.lit(int(action_id)))


def entity_filter(df: DataFrame, entity_columns: Sequence[str], entity_id) -> Column:
    """OR-fold equality over all feature columns of the entity's type
    (ref: clickhouse.py:25-44 + feature_name_to_entity_type_mapping)."""
    cond = F.lit(False)
    for c in entity_columns:
        cond = cond | F.col(c).cast("string").eqNullSafe(F.lit(str(entity_id)))
    return cond


def group_percentiles(
    df: DataFrame,
    value_col: str,
    group_by: Sequence[str],
    percentiles: Sequence[float] = (0.5, 0.9, 0.99),
    exact: bool = True,
) -> DataFrame:
    """Per-group value percentiles.

    ``exact=True`` uses Spark's exact ``percentile`` aggregate
    (interpolated, DuckDB ``quantile_cont`` semantics — the oracle
    path): per-group sorted state, fine when groups are bounded
    (event types, tenants). ``exact=False`` switches to
    ``approx_percentile`` (t-digest-style sketch, constant memory per
    group) — the 100 TB path for high-cardinality or skewed groups;
    same output shape, rank error <= 1/accuracy.

    Output: one row per group with ``p<pct>`` columns, rounded to 6
    decimals so IEEE last-ulp interpolation differences never surface
    in engine comparison.
    """
    aggs = []
    for p in percentiles:
        name = f"p{str(p).replace('0.', '').ljust(2, '0')}"
        if exact:
            c = F.percentile(F.col(value_col), F.lit(float(p)))
        else:
            c = F.approx_percentile(F.col(value_col), F.lit(float(p)), F.lit(10000))
        aggs.append(F.round(c, 6).alias(name))
    return df.groupBy(*group_by).agg(*aggs)


def skew_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    p: float = 0.99,
    top: int = 10,
) -> DataFrame:
    """Per-key distribution diagnostics — the measurement you run
    BEFORE choosing shuffle-partition counts, salting factors
    (``operators.joins.salted_join``) or AQE skew thresholds: heavy
    keys with their row share, plus corpus-level distinct-key count,
    mean/p-quantile/max rows per key and the max/mean ``skew_ratio``
    (1.0 = perfectly uniform; a 1000-executor job whose skew_ratio is
    40 has a straggler task 40x the average).

    Plan shape: ONE hash aggregate over the key (map-side partials),
    then everything operates on the key-cardinality frame — a 1-row
    global aggregate broadcast onto a TakeOrdered(top) heavy-key
    list. Rows never move twice; no driver collect.
    """
    keyed = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    stats = keyed.agg(
        F.sum("n").cast("long").alias("total_rows"),
        F.count(F.lit(1)).alias("distinct_keys"),
        F.max("n").alias("max_per_key"),
        F.percentile(F.col("n"), F.lit(float(p))).alias("_pq"),
    )
    heavy = keyed.orderBy(F.desc("n"), *key_cols).limit(int(top))
    return heavy.crossJoin(F.broadcast(stats)).select(
        *key_cols,
        "n",
        F.round(F.col("n") * 100.0 / F.col("total_rows"), 4).alias("share_pct"),
        "total_rows",
        "distinct_keys",
        "max_per_key",
        F.round(
            F.col("total_rows").cast("double") / F.col("distinct_keys"), 2
        ).alias("mean_per_key"),
        F.round("_pq", 2).alias("pq_per_key"),
        # max / (total/distinct) rather than max*distinct/total: no
        # long*long product to overflow at 10^12-row keys
        F.round(
            F.col("max_per_key")
            / (F.col("total_rows").cast("double") / F.col("distinct_keys")),
            2,
        ).alias("skew_ratio"),
    )


def funnel(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Ordered conversion funnel: how many users reached stage i
    having passed stages 0..i-1 IN EVENT-TIME ORDER (each stage's
    earliest qualifying timestamp >= the previous stage's, ties
    inclusive).

    Plan shape — ONE distributed job, no driver-side loop over
    stages: stage 0 aggregates to a (user, t0) frame; each later
    stage left-joins its events on the user key with the
    ``ts >= t_{i-1}`` qualifier and re-aggregates to (user, t0..ti).
    Every frame past the first is USER-cardinality, not
    event-cardinality, every join is an equi-join on the same key
    (one hash partitioning reused end-to-end under AQE), and
    non-converting users ride through as NULLs instead of being
    re-counted per stage. The final single-row conditional count
    unpivots to (stage, stage_idx, n_users).
    """
    uc = F.col(user_col)
    per_user = (
        df.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(F.col(ts_col)).alias("_t0"))
    )
    for i, stage in enumerate(stages[1:], start=1):
        si = df.filter(F.col(type_col) == stage).select(
            uc.alias("_u"), F.col(ts_col).alias("_sts")
        )
        carried = [F.max(f"_t{j}").alias(f"_t{j}") for j in range(i)]
        per_user = (
            per_user.join(
                si,
                (uc == F.col("_u"))
                & (F.col("_sts") >= F.col(f"_t{i - 1}")),
                "left",
            )
            .groupBy(user_col)
            .agg(*carried, F.min("_sts").alias(f"_t{i}"))
        )
    counts = per_user.agg(
        *[
            F.count(F.col(f"_t{i}")).alias(f"_n{i}")
            for i in range(len(stages))
        ]
    )
    pairs = ", ".join(f"'{s}', {i}, _n{i}" for i, s in enumerate(stages))
    return counts.selectExpr(
        f"stack({len(stages)}, {pairs}) AS (stage, stage_idx, n_users)"
    ).select(
        "stage", F.col("stage_idx").cast("int").alias("stage_idx"), F.col("n_users").cast("long").alias("n_users")
    )


def rollup_timeseries(
    df: DataFrame,
    ts_col: str,
    dims: Sequence[str],
    granularity: str = "day",
    user_col: Optional[str] = None,
) -> DataFrame:
    """Multi-granularity rollup in ONE scan: counts (and optional
    distinct users) at every prefix level of ``dims + [bucket]`` via
    GROUPING SETS — the hypertable-rollup shape (per-dim-per-day,
    per-dim, grand total from a single pass instead of one scan per
    level, the way the reference issues one ClickHouse query per
    granularity; ref: clickhouse.py:154-205).

    Plan at 100 TB: Catalyst's Expand replicates each input row once
    per grouping set BEFORE the hash aggregate, so map-side partials
    still collapse per set and the shuffle carries only group rows
    (levels x groups), never the corpus. ``grouping_id()`` tags each
    level; aggregates are exact integers so the output is
    oracle-hash-exact with no float-order concerns.
    """
    trunc = _GRANULARITY_TRUNC[granularity]
    bucket = F.date_format(
        F.date_trunc(trunc, F.col(ts_col).cast("timestamp")), "yyyy-MM-dd HH:mm:ss"
    ).alias("bucket")
    aggs = [F.count(F.lit(1)).alias("n_events"), F.grouping_id().alias("gid")]
    if user_col:
        aggs.insert(1, F.countDistinct(F.col(user_col)).alias("n_users"))
    out = (
        df.select(*[F.col(d) for d in dims], bucket, *( [F.col(user_col)] if user_col else [] ))
        .rollup(*dims, "bucket")
        .agg(*aggs)
    )
    order = [F.col("gid")] + [F.asc_nulls_first(c) for c in (*dims, "bucket")]
    return out.orderBy(*order).select(*dims, "bucket", *(
        ["n_events", "n_users"] if user_col else ["n_events"]
    ), F.col("gid").cast("long").alias("gid"))


def mad_outliers(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier detection by the modified z-score
    (Iglewicz & Hoaglin 1993): ``Mi = 0.6745 * (x - median) / MAD``
    with MAD the median absolute deviation — the outlier test that,
    unlike mean/stddev z-scores (``rate_anomaly``'s shape), does not
    let the outliers themselves inflate the spread estimate: a fraud
    burst that doubles the variance hides from a stddev gate but not
    from a median/MAD one (50% breakdown point).

    Plan, at 100 TB: TWO group-keyed exact-percentile hash aggregates
    (counts-map merge, memory bounded by distinct values per group —
    swap ``approx_percentile`` for continuous values) with the
    group-count-sized median/MAD frames BROADCAST back onto the scan;
    every row-scale pass is a pure projection, no row-keyed shuffle
    anywhere.

    Determinism: Spark ``percentile`` and DuckDB ``quantile_cont``
    compute the same interpolated quantile on the same doubles; the
    modified z is ONE fixed parenthesization over them, rounded to 6.
    MAD = 0 (over half the group identical) leaves ``modified_z``
    NULL and flags any row that deviates from the median at all —
    the documented degenerate-group convention.
    """
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull())
    med = base.groupBy(group_col).agg(
        F.percentile(v, F.lit(0.5)).alias("med")
    )
    absdev = base.join(F.broadcast(med), group_col).select(
        group_col, F.abs(v - F.col("med")).alias("_ad")
    )
    mad = absdev.groupBy(group_col).agg(
        F.percentile(F.col("_ad"), F.lit(0.5)).alias("mad")
    )
    stats = med.join(mad, group_col)
    mz = (F.lit(0.6745) * (v - F.col("med"))) / F.col("mad")
    flagged = F.when(
        F.col("mad") > 0.0, F.abs(mz) > F.lit(float(threshold))
    ).otherwise(v != F.col("med"))
    return (
        base.join(F.broadcast(stats), group_col)
        .select(
            "event_id",
            group_col,
            v.alias("value"),
            F.round(F.col("med"), 6).alias("med"),
            F.round(F.col("mad"), 6).alias("mad"),
            F.when(F.col("mad") > 0.0, F.round(mz, 6)).alias("modified_z"),
            flagged.alias("is_outlier"),
        )
        .filter(F.col("is_outlier"))
    )


def mad_outliers_sql(
    table: str,
    group_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 3.5,
) -> str:
    """DuckDB oracle for :func:`mad_outliers` (quantile_cont medians,
    identical modified-z parenthesization)."""
    return f"""
WITH base AS (
  SELECT event_id, {group_col}, CAST({value_col} AS DOUBLE) AS v
  FROM {table} WHERE {value_col} IS NOT NULL
),
med AS (
  SELECT {group_col}, quantile_cont(v, 0.5) AS med FROM base GROUP BY {group_col}
),
mad AS (
  SELECT b.{group_col}, quantile_cont(abs(b.v - m.med), 0.5) AS mad
  FROM base b JOIN med m USING ({group_col})
  GROUP BY b.{group_col}
),
scored AS (
  SELECT b.event_id, b.{group_col}, b.v,
    m.med, d.mad,
    (0.6745 * (b.v - m.med)) / d.mad AS mz
  FROM base b JOIN med m USING ({group_col}) JOIN mad d USING ({group_col})
)
SELECT event_id, {group_col}, v AS value,
  round(med, 6) AS med, round(mad, 6) AS mad,
  CASE WHEN mad > 0.0 THEN round(mz, 6) END AS modified_z,
  CASE WHEN mad > 0.0 THEN abs(mz) > {float(threshold)}
       ELSE v <> med END AS is_outlier
FROM scored
WHERE CASE WHEN mad > 0.0 THEN abs(mz) > {float(threshold)}
           ELSE v <> med END
"""


def attribution(
    turns,
    touch_types,
    touch_col: str = "touch",
    conv_flag_col: str = "is_conversion",
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    quant: int = 10**6,
):
    """Multi-touch conversion attribution — the classic journey
    question ("which touch gets credit for the purchase?") under the
    three standard models at once: first-touch, last-touch, and
    linear (every prior touch splits the conversion equally). The
    safety-ops reading is identical mechanics: which upstream signal
    preceded the flagged event, earliest, latest, or shared.

    ``touch_col`` is the touch TYPE (NULL on non-touch rows);
    ``conv_flag_col`` marks conversion rows; per conversion the
    lookback is every prior same-key touch (current row inclusive —
    a conversion row is never itself a touch). Conversions with no
    prior touch earn no credit under any model.

    Shape: ONE key-partitioned window pass (first/last
    ignore-nulls + one running count per touch type + the running
    total — all over the same window spec, one shuffle), then three
    small aggregates over conversion rows unioned with a model
    label. Linear credits quantize ``cnt_t/total`` to BIGINT
    micro-units per conversion before the cross-conversion sum (the
    calibration ECE discipline), so every model's credit column is
    exact-integer-derived and the DuckDB replay is hash-exact.

    Output: ``(model, touch, credit)`` rows, credit double (integer
    counts for first/last, fractional for linear), ordered by
    (model, touch).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    if not touch_types:
        raise ValueError("attribution: need at least one touch type")
    qf = float(quant)
    w = (
        W.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    touch = F.col(touch_col)
    staged = turns.select(
        F.col(conv_flag_col).alias("_isc"),
        F.first(touch, ignorenulls=True).over(w).alias("_ft"),
        F.last(touch, ignorenulls=True).over(w).alias("_lt"),
        F.sum(touch.isNotNull().cast("long")).over(w).alias("_tot"),
        *[
            F.sum((touch == F.lit(t)).cast("long"))
            .over(w)
            .alias(f"_c{i}")
            for i, t in enumerate(touch_types)
        ],
    ).filter(F.col("_isc") & (F.col("_tot") >= 1))
    first = (
        staged.groupBy(F.col("_ft").alias("touch"))
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        .select(
            F.lit("first_touch").alias("model"),
            "touch",
            F.col("_n").cast("double").alias("credit"),
        )
    )
    last = (
        staged.groupBy(F.col("_lt").alias("touch"))
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        .select(
            F.lit("last_touch").alias("model"),
            "touch",
            F.col("_n").cast("double").alias("credit"),
        )
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"), F.col(f"_c{i}").alias("c")
            )
            for i, t in enumerate(touch_types)
        ]
    )
    lin = (
        staged.select(F.col("_tot"), F.explode(entries).alias("_e"))
        .filter(F.col("_e.c") >= 1)
        .select(
            F.col("_e.t").alias("touch"),
            F.round(
                (F.col("_e.c").cast("double") / F.col("_tot").cast("double"))
                * F.lit(qf),
                0,
            )
            .cast("long")
            .alias("_q"),
        )
        .groupBy("touch")
        .agg(F.sum("_q").cast("long").alias("_sq"))
        .select(
            F.lit("linear").alias("model"),
            "touch",
            F.round(F.col("_sq").cast("double") / F.lit(qf), 6).alias("credit"),
        )
    )
    return first.unionByName(last).unionByName(lin).orderBy("model", "touch")


def attribution_sql(
    table: str,
    touch_types,
    touch_expr: str,
    conv_expr: str,
    quant: int = 10**6,
) -> str:
    """DuckDB replay of :func:`attribution`. ``touch_expr`` yields the
    touch type (NULL for non-touches), ``conv_expr`` a boolean."""
    qf = repr(float(quant))
    cnt_cols = ",\n    ".join(
        f"CAST(sum(CASE WHEN ({touch_expr}) = '{t}' THEN 1 ELSE 0 END) OVER w AS BIGINT) AS c{i}"
        for i, t in enumerate(touch_types)
    )
    lin_entries = ", ".join(
        f"{{'t': '{t}', 'c': c{i}}}" for i, t in enumerate(touch_types)
    )
    return f"""
atstaged AS (
  SELECT ({conv_expr}) AS isc,
    first_value({touch_expr} IGNORE NULLS) OVER w AS ft,
    last_value({touch_expr} IGNORE NULLS) OVER w AS lt,
    CAST(sum(CASE WHEN ({touch_expr}) IS NOT NULL THEN 1 ELSE 0 END) OVER w AS BIGINT) AS tot,
    {cnt_cols}
  FROM {table}
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
atconv AS (SELECT * FROM atstaged WHERE isc AND tot >= 1),
atlin AS (
  SELECT e.t AS touch,
    CAST(sum(CAST(round((CAST(e.c AS DOUBLE) / CAST(tot AS DOUBLE)) * {qf}, 0)
             AS BIGINT)) AS BIGINT) AS sq
  FROM atconv, unnest([{lin_entries}]) AS u(e)
  WHERE e.c >= 1 GROUP BY e.t
)
SELECT model, touch, credit FROM (
  SELECT 'first_touch' AS model, ft AS touch,
    CAST(count(*) AS DOUBLE) AS credit FROM atconv GROUP BY ft
  UNION ALL
  SELECT 'last_touch', lt, CAST(count(*) AS DOUBLE) FROM atconv GROUP BY lt
  UNION ALL
  SELECT 'linear', touch, round(CAST(sq AS DOUBLE) / {qf}, 6) FROM atlin
)
"""

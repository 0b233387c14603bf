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

from pyspark.sql import Column, DataFrame, Window
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


_MA_START, _MA_CONV, _MA_NULL = "__START__", "__CONV__", "__NULL__"


def _ma_transitions(
    df: DataFrame,
    channels: "Sequence[str]",
    key_col: str,
    order_col: str,
    touch_col: str,
    conv_col: str,
) -> DataFrame:
    """Per-journey first-order transition counts with START/CONV/NULL
    sentinels. A journey = one key's touch run up to (and including)
    a conversion; the conversion row ends its journey, the next touch
    opens a new one; journeys without a conversion terminate in NULL.
    Ordering is the integer ``order_col`` (unique per key) — no ties,
    fully deterministic."""
    st = df.filter(
        F.col(touch_col).isin(list(channels)) | F.col(conv_col)
    ).select(
        F.col(key_col).alias("_k"),
        F.col(order_col).alias("_o"),
        F.when(F.col(conv_col), F.lit(_MA_CONV))
        .otherwise(F.col(touch_col))
        .alias("_s"),
    )
    w_u = Window.partitionBy("_k").orderBy("_o")
    cflag = (F.col("_s") == _MA_CONV).cast("long")
    cum = F.sum(cflag).over(w_u.rowsBetween(Window.unboundedPreceding, 0))
    base = st.select("_k", "_o", "_s", (cum - cflag).alias("_j"))
    w_j = Window.partitionBy("_k", "_j").orderBy("_o")
    trans1 = base.select(
        F.coalesce(F.lag("_s").over(w_j), F.lit(_MA_START)).alias("src"),
        F.col("_s").alias("dst"),
    )
    w_jd = Window.partitionBy("_k", "_j").orderBy(F.desc("_o"))
    trans2 = (
        base.withColumn("_rn", F.row_number().over(w_jd))
        .filter((F.col("_rn") == 1) & (F.col("_s") != _MA_CONV))
        .select(F.col("_s").alias("src"), F.lit(_MA_NULL).alias("dst"))
    )
    return (
        trans1.unionByName(trans2)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _ma_absorb_py(counts: list, rounds: int, scale: int) -> dict:
    """Driver-side integer value iteration for P(absorb in CONV):
    python ints ARE arbitrary-precision, so the per-edge floored
    contribution ``(p(dst)·n) // R(src)`` replays DuckDB's HUGEINT
    (and the old in-cluster DECIMAL(38) DIV) bit-for-bit. ``counts``
    is the collected (src, dst, n) list — |alphabet|² rows, the
    IVF-codebook bounded-collect class."""
    from collections import defaultdict

    r: dict = defaultdict(int)
    for src, _dst, n in counts:
        r[src] += n
    p = {src: 0 for src in r}
    for _ in range(int(rounds)):
        nxt: dict = defaultdict(int)
        for src, dst, n in counts:
            if dst == _MA_CONV:
                dv = int(scale)
            elif dst == _MA_NULL:
                dv = 0
            else:
                dv = p.get(dst, 0)
            nxt[src] += (dv * n) // r[src]
        p = dict(nxt)
    return p


def _half_away(x: float, digits: int) -> float:
    """Round half away from zero — the Spark F.round / DuckDB round
    contract (python's round() is banker's and would diverge)."""
    import math

    q = 10.0 ** digits
    v = math.floor(abs(x) * q + 0.5) / q
    return -v if x < 0 else v


def markov_attribution(
    df: DataFrame,
    channels: "Sequence[str]",
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    touch_col: str = "touch",
    conv_col: str = "is_conversion",
    rounds: int = 12,
    scale: int = 10**12,
) -> DataFrame:
    """Markov-chain (removal-effect) attribution (Anderl et al. 2014)
    — the DATA-DRIVEN credit model completing the heuristic trio in
    :func:`attribution`: build the first-order journey chain
    (START → touches → CONV/NULL), compute the absorption probability
    of converting, then ask per channel 'how much does conversion
    drop if every path through this channel dead-ends?' —
    ``RE(c) = 1 − P(conv | c removed)/P(conv)``. Credit follows
    causal contribution through the OBSERVED paths, not position: a
    channel that only appears on already-doomed journeys earns ~0
    even in first position (test-pinned).

    Engine split, deliberately: the heavy part — turning 10^12
    events into journey transitions — is ONE distributed pass (two
    key windows + one hash aggregate); the chain itself is
    |alphabet|²-bounded REGARDLESS of corpus size, so it collects to
    the driver (the IVF-codebook bounded-collect class) and the
    1 + |channels| value iterations run in exact python ints —
    arbitrary precision, bit-identical to the DuckDB oracle's
    HUGEINT floors. A first cut iterated in-cluster instead: 36
    chained tiny-frame rounds cost 52 s of pure stage-scheduling
    latency for 25 rows of state; this shape is <2 s with identical
    output. Removal semantics (standard): transitions INTO the
    removed channel divert to NULL, its outgoing rows drop.

    Output per channel: ``(channel, p_conv, p_removed,
    removal_effect, share)`` — share over positive effects only
    (a negative RE is floor noise or a genuinely harmful channel;
    documented, excluded from the denominator). All doubles rounded
    6 half-away (the cross-engine contract).
    """
    if int(rounds) < 1:
        raise ValueError("markov_attribution: rounds must be >= 1")
    if not channels:
        raise ValueError("markov_attribution: channels must be non-empty")
    spark = df.sparkSession
    cnt_rows = [
        (r["src"], r["dst"], int(r["n"]))
        for r in _ma_transitions(
            df, channels, key_col, order_col, touch_col, conv_col
        ).collect()
    ]
    p_full = _ma_absorb_py(cnt_rows, rounds, scale).get(_MA_START, 0)
    staged = []
    for ch in channels:
        cc: dict = {}
        for src, dst, n in cnt_rows:
            if src == ch:
                continue
            d2 = _MA_NULL if dst == ch else dst
            cc[(src, d2)] = cc.get((src, d2), 0) + n
        cl = [(s, d, n) for (s, d), n in cc.items()]
        p_rem = _ma_absorb_py(cl, rounds, scale).get(_MA_START, 0)
        req = (
            int(_half_away((1.0 - p_rem / p_full) * 1e6, 0))
            if p_full >= 1
            else None
        )
        staged.append((ch, p_full, p_rem, req))
    tot = sum(max(req, 0) for _ch, _pc, _pr, req in staged if req is not None)
    out = []
    for ch, pc, pr, req in sorted(staged):
        out.append(
            (
                ch,
                _half_away(pc / float(scale), 6),
                _half_away(pr / float(scale), 6),
                _half_away(req / 1e6, 6) if req is not None else None,
                _half_away(max(req, 0) / tot, 6)
                if req is not None and tot >= 1
                else None,
            )
        )
    return spark.createDataFrame(
        out,
        "channel string, p_conv double, p_removed double,"
        " removal_effect double, share double",
    )


def markov_attribution_sql(
    table: str,
    channels: "Sequence[str]",
    touch_expr: str,
    conv_expr: str,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    rounds: int = 12,
    scale: int = 10**12,
) -> str:
    """DuckDB replay of :func:`markov_attribution` — same journey
    windows, same per-edge HUGEINT floors (== Spark's DECIMAL(38)
    DIV on positives), every absorption run statically unrolled into
    MATERIALIZED CTEs (the eigencentrality builder discipline)."""
    ch_in = ", ".join(f"'{c}'" for c in channels)
    parts = [
        f"""mast AS (
  SELECT {key_col} AS k, {order_col} AS o,
    CASE WHEN {conv_expr} THEN '{_MA_CONV}' ELSE {touch_expr} END AS s
  FROM {table}
  WHERE ({touch_expr}) IN ({ch_in}) OR ({conv_expr})
)""",
        f"""mabase AS (
  SELECT k, o, s,
    sum(CASE WHEN s = '{_MA_CONV}' THEN 1 ELSE 0 END)
      OVER (PARTITION BY k ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW)
    - CASE WHEN s = '{_MA_CONV}' THEN 1 ELSE 0 END AS j
  FROM mast
)""",
        f"""matr AS (
  SELECT coalesce(lag(s) OVER (PARTITION BY k, j ORDER BY o),
                  '{_MA_START}') AS src, s AS dst
  FROM mabase
  UNION ALL
  SELECT s, '{_MA_NULL}' FROM (
    SELECT s, row_number() OVER (PARTITION BY k, j ORDER BY o DESC) AS rn
    FROM mabase
  ) WHERE rn = 1 AND s <> '{_MA_CONV}'
)""",
        """macnt AS MATERIALIZED (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM matr GROUP BY 1, 2
)""",
    ]

    def absorb(tag: str, cnt: str) -> str:
        out = [
            f"""{tag}r AS MATERIALIZED (
  SELECT src, CAST(sum(n) AS BIGINT) AS r FROM {cnt} GROUP BY src
)""",
            f"""{tag}p0 AS MATERIALIZED (
  SELECT src AS state, CAST(0 AS BIGINT) AS p FROM {tag}r
)""",
        ]
        for t in range(1, int(rounds) + 1):
            out.append(
                f"""{tag}p{t} AS MATERIALIZED (
  SELECT c.src AS state,
    CAST(sum((CAST(CASE WHEN c.dst = '{_MA_CONV}' THEN {int(scale)}
              WHEN c.dst = '{_MA_NULL}' THEN 0
              ELSE coalesce(pp.p, 0) END AS HUGEINT) * c.n) // r.r)
         AS BIGINT) AS p
  FROM {cnt} c
  JOIN {tag}r r ON c.src = r.src
  LEFT JOIN {tag}p{t - 1} pp ON c.dst = pp.state
  GROUP BY c.src
)"""
            )
        return ",\n".join(out)

    parts.append(absorb("maf", "macnt"))
    arms = []
    for i, ch in enumerate(channels):
        parts.append(
            f"""macnt{i} AS MATERIALIZED (
  SELECT src, CASE WHEN dst = '{ch}' THEN '{_MA_NULL}' ELSE dst END AS dst,
    CAST(sum(n) AS BIGINT) AS n
  FROM macnt WHERE src <> '{ch}' GROUP BY 1, 2
)"""
        )
        parts.append(absorb(f"mac{i}", f"macnt{i}"))
        arms.append(
            f"SELECT '{ch}' AS channel, p AS pr FROM mac{i}p{int(rounds)}"
            f" WHERE state = '{_MA_START}'"
        )
    parts.append(
        f"""mafull AS (
  SELECT p AS pc FROM mafp{int(rounds)} WHERE state = '{_MA_START}'
)"""
    )
    parts.append("march AS (\n" + "\nUNION ALL ".join(arms) + "\n)")
    parts.append(
        """mastaged AS (
  SELECT channel, pc, pr,
    CASE WHEN pc >= 1 THEN CAST(round(
      (1.0 - CAST(pr AS DOUBLE) / CAST(pc AS DOUBLE)) * 1000000.0, 0)
      AS BIGINT) END AS req
  FROM march, mafull
)""",
    )
    parts.append(
        "matot AS (SELECT CAST(sum(greatest(req, 0)) AS BIGINT) AS tot"
        " FROM mastaged)"
    )
    sc = repr(float(scale))
    return (
        ",\n".join(parts)
        + f"""
SELECT channel,
  round(CAST(pc AS DOUBLE) / {sc}, 6) AS p_conv,
  round(CAST(pr AS DOUBLE) / {sc}, 6) AS p_removed,
  round(CAST(req AS DOUBLE) / 1000000.0, 6) AS removal_effect,
  round(CASE WHEN tot >= 1
        THEN CAST(greatest(req, 0) AS DOUBLE) / CAST(tot AS DOUBLE) END, 6)
    AS share
FROM mastaged, matot ORDER BY channel"""
    )

"""Distributed sketches as compositions of DataFrame ops.

Count-min sketch (Cormode & Muthukrishnan 2005) built with
DETERMINISTIC md5-derived hash rows, so the sketch — and every
estimate read from it — is exactly reproducible by an external SQL
engine: the DuckDB oracle rebuilds the identical (depth, bucket)
counter table and reads the identical estimates. That turns the usual
"approximate, can only rows-check" sketch into a hash-exact
correctness row, while keeping the real 100 TB property: the
aggregate state is ``width x depth`` counters per partition
(map-side partial), the shuffle carries at most
``width x depth x partitions`` partial rows, and estimates are
O(depth) lookups per queried key — the corpus never re-shuffles per
query.

The reference engine has no sketch operators (its approx layer is
Druid/ClickHouse-side); this is part of the survey's §2.6
training-pipeline/analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, d: int, width: int, seed: str) -> Column:
    """Row-``d`` bucket: first 8 md5 hex chars of ``seed:d:key`` mod
    width — 32 bits of the digest, replayed verbatim in the oracle."""
    h = F.md5(
        F.concat(F.lit(f"{seed}:{d}:"), key.cast("string")).cast("binary")
    )
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(width)).alias(
        f"__b{d}"
    )


def count_min_build(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cms",
) -> DataFrame:
    """Build the counter table: one row per (depth, bucket) with the
    total count of keys hashing there.

    Plan: ONE scan; each input row contributes ``depth`` (d, bucket)
    pairs via an inline array explode, then a single hash aggregate —
    partial aggregation caps per-partition state at width*depth
    counters, so the exchange is sketch-sized, not data-sized.
    """
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(key, d, width, seed).alias("bucket"))
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cms",
) -> DataFrame:
    """Read estimates for ``keys`` from a built sketch: each key joins
    its ``depth`` buckets and takes the min counter (the CMS upper
    bound; over-estimates only, never under). The sketch side is
    width*depth rows — broadcast-sized by construction — so the read
    is a broadcast equi-join however large the key list is."""
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(key, d, width, seed).alias("bucket"))
            for d in range(depth)
        ]
    )
    exploded = keys.select(key_col, F.explode(pairs).alias("p")).select(
        key_col, F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket")
    )
    return (
        exploded.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_n"))
    )


def duck_bucket_sql(
    key_expr: str, d: int, width: int = 1024, seed: str = "cms"
) -> str:
    """DuckDB expression replaying :func:`_bucket` for hash row ``d``
    — identical md5 prefix, identical modulus."""
    return (
        f"CAST(('0x' || substr(md5('{seed}:{d}:' || CAST({key_expr} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {width}"
    )


def count_min_sketch_cte(
    table: str,
    key_expr: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cms",
) -> str:
    """DuckDB CTE body defining ``cms(d, bucket, n)`` — the exact
    counter table :func:`count_min_build` produces."""
    arms = " UNION ALL ".join(
        f"SELECT {d} AS d, {duck_bucket_sql(key_expr, d, width, seed)} AS bucket FROM {table}"
        for d in range(depth)
    )
    return f"SELECT d, bucket, count(*) AS n FROM ({arms}) GROUP BY d, bucket"


# HyperLogLog constants for m=256 registers (Flajolet et al. 2007):
# alpha_m = 0.7213 / (1 + 1.079 / m); embedded pre-multiplied by m^2
# as ONE Python float literal so both engines divide by S with the
# identical constant (no multiply-order ambiguity).
_HLL_M = 256
_HLL_ALPHA_M2 = (0.7213 / (1.0 + 1.079 / _HLL_M)) * _HLL_M * _HLL_M


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    seed: str = "hll",
) -> DataFrame:
    """From-scratch HyperLogLog distinct-count per group — the
    deterministic, oracle-replayable counterpart of Spark's built-in
    ``approx_count_distinct`` (whose sketch internals an external
    engine cannot replay, leaving it rows-only checkable).

    Register assignment is md5-derived: 8 digest bits pick one of 256
    registers, the next 52 bits give the rank (leading-zero count + 1,
    computed EXACTLY via the binary-string length of the value — no
    floating log2 at the boundary). Registers are a (group, bucket)
    max aggregate with map-side partials — per-partition state is at
    most 256 rows per group, the true HLL property — and the harmonic
    sum folds in bucket order (each term is 2^-r, an exact double), so
    the estimate is bit-reproducible and the DuckDB oracle hash-exact.
    The standard small-range linear-counting correction applies when
    E <= 2.5m and empty registers remain.

    Output: ``group_cols..., n_exact, hll_estimate`` (the exact
    distinct rides along as the self-validating comparison column).
    """
    key = F.col(key_col)
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")).cast("binary"))
    v = F.conv(F.substring(h, 3, 13), 16, 10).cast("long")
    rho = (
        F.when(v == 0, F.lit(53))
        .otherwise(F.lit(53) - F.length(F.conv(F.substring(h, 3, 13), 16, 2)))
        .cast("int")
    )
    regs = (
        df.select(
            *group_cols,
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("_bkt"),
            rho.alias("_rho"),
        )
        .groupBy(*group_cols, "_bkt")
        .agg(F.max("_rho").alias("_r"))
    )
    per = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_np"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("_bkt").alias("b"), F.col("_r").alias("r")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + F.lit(1.0) / F.pow(F.lit(2.0), x["r"]),
        ).alias("_sp"),
    )
    vz = F.lit(_HLL_M) - F.col("_np")
    s = vz.cast("double") * F.lit(1.0) + F.col("_sp")
    eraw = F.lit(_HLL_ALPHA_M2) / s
    est = F.when(
        (eraw <= F.lit(2.5 * _HLL_M)) & (vz > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / vz.cast("double")),
    ).otherwise(eraw)
    ex = df.groupBy(*group_cols).agg(
        F.countDistinct(key).cast("long").alias("n_exact")
    )
    return (
        per.join(ex, group_cols)
        .select(*group_cols, "n_exact", F.round(est, 6).alias("hll_estimate"))
        .orderBy(*group_cols)
    )


def hll_oracle_sql(
    table: str,
    key_expr: str,
    group_col: str,
    seed: str = "hll",
) -> str:
    """DuckDB replay of :func:`hll_distinct`: identical md5 register
    assignment (``bin()`` string length for the exact rank), identical
    bucket-ordered harmonic fold, identical constants."""
    am2 = repr(_HLL_ALPHA_M2)
    return f"""
WITH h AS (
  SELECT {group_col}, md5('{seed}:' || CAST({key_expr} AS VARCHAR)) AS h FROM {table}
),
b AS (
  SELECT {group_col},
    CAST(('0x' || substr(h, 1, 2)) AS INT) AS bkt,
    CAST(('0x' || substr(h, 3, 13)) AS BIGINT) AS v
  FROM h
),
r AS (
  SELECT {group_col}, bkt,
    max(CASE WHEN v = 0 THEN 53 ELSE 53 - length(bin(v)) END) AS r
  FROM b GROUP BY 1, 2
),
agg AS (
  SELECT {group_col}, count(*) AS np,
    list_sum(list_transform(
      list(struct_pack(b := bkt, r := r) ORDER BY bkt),
      s -> 1.0 / power(2.0, s.r))) AS sp
  FROM r GROUP BY 1
),
e AS (
  SELECT {group_col}, np, {am2} / ((256 - np) * 1.0 + sp) AS eraw, 256 - np AS vz
  FROM agg
),
ex AS (SELECT {group_col}, count(DISTINCT {key_expr}) AS n_exact FROM {table} GROUP BY 1)
SELECT e.{group_col}, CAST(ex.n_exact AS BIGINT) AS n_exact,
  round(CASE WHEN eraw <= 640.0 AND vz > 0
             THEN 256.0 * ln(256.0 / vz) ELSE eraw END, 6) AS hll_estimate
FROM e JOIN ex USING ({group_col}) ORDER BY {group_col}
"""


# --------------------------------------------------------------------------
# log-binned histogram quantile sketch (HDR-histogram / DDSketch class)
# --------------------------------------------------------------------------
#
# The third canonical mergeable sketch next to HLL (max-merge) and CMS
# (sum-merge): a base-2 histogram with 4 linear sub-bins per octave.
# Merging histograms is integer vector addition, so partial aggregation
# caps per-partition state at <= 4*63 = 252 counters per group however
# many rows flow through — the property that lets p50/p95/p99 run over
# 100 TB as ONE map-side-combined aggregate, and lets the streaming
# form keep per-(window, dims) state independent of traffic.
#
# Everything is integer / power-of-two-exact arithmetic (the octave is
# the binary-string length of the value — no floating log2 at bin
# boundaries; divisions are by powers of two, exact in IEEE doubles for
# values < 2^49), so a SQL engine replays estimates bit-for-bit: the
# quantile read is hash-exact against the DuckDB oracle, not rows-only.
# Relative error of an estimate is bounded by the sub-bin width: the
# returned value is the LOWER EDGE of the bin holding the q-th value,
# within 25% of octave start at worst (values 1..3 are exact).
# NULL / non-positive values land in a dedicated underflow bin whose
# estimate is 0.


def hist_bin(v: Column) -> Column:
    """Bin id of a non-negative integer value: octave ``e-1`` from the
    binary-string length ``e`` (highest set bit, exact), linear sub-bin
    ``(v*4) / 2^(e-1) - 4`` in {0..3}; ``bin = (e-1)*4 + sub``.
    NULL / ``v <= 0`` map to the underflow bin -1."""
    e = F.length(F.bin(v))
    sub = (
        F.floor(
            (v * 4).cast("double") / F.pow(F.lit(2.0), (e - F.lit(1)).cast("double"))
        ).cast("long")
        - 4
    )
    return (
        F.when(v.isNull() | (v <= 0), F.lit(-1))
        .otherwise((e.cast("long") - 1) * 4 + sub)
        .cast("long")
    )


def hist_bin_lower(b: Column) -> Column:
    """Lower edge of bin ``b`` — the quantile estimate read from the
    sketch: ``(4 + sub) * 2^(e-1) / 4`` floored (exact power-of-two
    arithmetic); the underflow bin reads 0."""
    sub = F.pmod(b, F.lit(4))
    e1 = ((b - sub) / F.lit(4)).cast("long")
    raw = (sub + 4).cast("double") * F.pow(F.lit(2.0), e1.cast("double"))
    return (
        F.when(b < 0, F.lit(0)).otherwise(F.floor(raw / F.lit(4.0))).cast("long")
    )


def hist_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    q_pcts: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Per-group quantile estimates from the log-binned histogram.

    Plan: one scan -> hash aggregate to (group, bin) counts (map-side
    partials, <=252 bins per group), then window cumsum + threshold
    pick over the BIN frame only — the windows never touch row-scale
    data. Threshold is the integer ``ceil(q% * n / 100)`` computed as
    ``(q*n + 99) DIV 100`` so both engines agree without float rounding.

    Output: ``group_cols..., q_pct, est, n_rows`` (est = bin lower
    edge, a deterministic integer).
    """
    from pyspark.sql.window import Window

    v = F.col(value_col).cast("long")
    hist = (
        df.select(*group_cols, hist_bin(v).alias("_bin"))
        .groupBy(*group_cols, "_bin")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "_bin",
        F.sum("_cnt").over(w_cum).alias("_cum"),
        F.sum("_cnt").over(w_all).alias("_total"),
    )
    x = cum.select(
        *group_cols,
        "_bin",
        "_cum",
        "_total",
        F.explode(F.array(*[F.lit(int(q)) for q in q_pcts])).alias("q_pct"),
    ).filter(F.col("_cum") >= F.expr("(q_pct * _total + 99) DIV 100"))
    sel = x.groupBy(*group_cols, "q_pct").agg(
        F.min("_bin").alias("_qbin"), F.max("_total").alias("n_rows")
    )
    return sel.select(
        *group_cols,
        F.col("q_pct").cast("long").alias("q_pct"),
        hist_bin_lower(F.col("_qbin")).alias("est"),
        F.col("n_rows").cast("long").alias("n_rows"),
    ).orderBy(*group_cols, "q_pct")


def py_hist_bin(v) -> int:
    """Python replay of :func:`hist_bin` (streaming state fold +
    tests)."""
    if v is None or v <= 0:
        return -1
    e = int(v).bit_length()
    sub = (int(v) * 4) // (1 << (e - 1)) - 4
    return (e - 1) * 4 + sub


def py_hist_quantiles(counters: dict, q_pcts) -> list:
    """Python replay of the quantile read: ``[(q_pct, est, n)]`` from a
    {bin_id: count} table — identical threshold and lower-edge
    arithmetic to :func:`hist_quantiles` / the DuckDB oracle."""
    bins = sorted(counters)
    total = sum(counters.values())
    out = []
    for q in q_pcts:
        thr = (int(q) * total + 99) // 100
        cum = 0
        qbin = bins[-1] if bins else -1
        for b in bins:
            cum += counters[b]
            if cum >= thr:
                qbin = b
                break
        est = 0 if qbin < 0 else ((4 + (qbin % 4)) << (qbin // 4)) // 4
        out.append((int(q), est, total))
    return out


def hist_quantiles_sql(
    table: str,
    value_expr: str,
    group_col: str,
    q_pcts: tuple[int, ...] = (50, 90, 99),
    cte_prefix: str = "",
) -> str:
    """DuckDB replay of :func:`hist_quantiles` — identical bin ids
    (binary-string octave, integer sub-bin), identical integer ceil
    threshold, identical lower-edge estimates. Pass an existing
    ``WITH x AS (...)`` clause as ``cte_prefix`` to chain onto it."""
    qvals = ",".join(f"({int(q)})" for q in q_pcts)
    head = f"{cte_prefix}," if cte_prefix else "WITH"
    return f"""
{head} vals AS (SELECT {group_col} AS grp, CAST({value_expr} AS BIGINT) AS v FROM {table}),
b AS (
  SELECT grp,
    CASE WHEN v IS NULL OR v <= 0 THEN -1
         ELSE (length(bin(v)) - 1) * 4
            + CAST(floor((v * 4) / power(2, length(bin(v)) - 1)) AS BIGINT) - 4
    END AS bin_id
  FROM vals
),
hist AS (SELECT grp, bin_id, count(*) AS cnt FROM b GROUP BY 1, 2),
cum AS (
  SELECT grp, bin_id,
    SUM(cnt) OVER (PARTITION BY grp ORDER BY bin_id) AS cum,
    SUM(cnt) OVER (PARTITION BY grp) AS total
  FROM hist
),
q AS (SELECT * FROM (VALUES {qvals}) AS t(q_pct)),
sel AS (
  SELECT c.grp, q.q_pct, min(c.bin_id) AS qbin, max(c.total) AS n_rows
  FROM cum c CROSS JOIN q
  WHERE c.cum >= (q.q_pct * c.total + 99) // 100
  GROUP BY 1, 2
)
SELECT grp AS {group_col}, CAST(q_pct AS BIGINT) AS q_pct,
  CAST(CASE WHEN qbin < 0 THEN 0
       ELSE CAST(floor((qbin % 4 + 4) * power(2, (qbin - (qbin % 4)) / 4) / 4) AS BIGINT)
       END AS BIGINT) AS est,
  CAST(n_rows AS BIGINT) AS n_rows
FROM sel ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# KMV / theta sketch: distinct counting WITH set operations
# --------------------------------------------------------------------------
#
# The fourth mergeable sketch, and the one HLL cannot replace: K minimum
# values supports UNION and INTERSECTION estimates ("users active in
# BOTH windows / segments") because the k smallest hashes of A ∪ B are
# exactly the k smallest of (sketch_A ∪ sketch_B) — min-k merge, the
# same associative+commutative fold the weighted reservoir uses. All
# hashes are md5-derived 32-bit integers, every estimate is one
# explicitly-parenthesized double expression, so the DuckDB oracle is
# hash-exact.
#
# Scale shape: the sketch build is TWO hash aggregates — per
# (group, salt-bucket) min-k with bounded per-bucket state, then a
# merge of salt-bucket partials (<= n_salt * k values per group) —
# never a row-scale window or collect. That is the DataSketches theta
# UDAF fold expressed in DataFrame ops.

_KMV_DOM = 4294967296.0  # 2^32, the hash domain as a double


def _kmv_hash(key: Column, seed: str = "kmv") -> Column:
    """32-bit md5-derived hash of the key (first 8 hex digits)."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 256,
    seed: str = "kmv",
    n_salt: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest DISTINCT hash values,
    as one sorted array column ``kmv`` (size < k means the group's
    full distinct hash set — the exact regime).

    Two-level fold: (group, hash-salt-bucket) partial min-k bounds
    per-aggregate state at bucket-distinct cardinality (size
    ``n_salt`` to taste, same knob class as the state-op buckets),
    then the group-level merge sorts <= n_salt*k values. Both levels
    are ordinary hash aggregates with map-side partials.
    """
    h = _kmv_hash(F.col(key_col), seed)
    part = (
        df.select(*group_cols, h.alias("_h"))
        .withColumn("_salt", F.pmod(F.col("_h"), F.lit(int(n_salt))))
        .groupBy(*group_cols, "_salt")
        .agg(
            F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_part")
        )
    )
    return part.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_part"))), 1, k
        ).alias("kmv")
    )


def kmv_estimate_col(kmv: Column, k: int) -> Column:
    """Distinct-count estimate from a KMV array: exact size below
    saturation, else ``(k-1) / (kth_hash / 2^32)`` — one fixed
    parenthesization shared with the oracle."""
    kth = F.element_at(kmv, k).cast("double")
    return F.round(
        F.when(F.size(kmv) < k, F.size(kmv).cast("double")).otherwise(
            F.lit(k - 1.0) / (kth / F.lit(_KMV_DOM))
        ),
        6,
    )


def kmv_set_ops(
    df: DataFrame,
    key_col: str,
    type_col: str,
    type_a: str,
    type_b: str,
    k: int = 256,
    seed: str = "kmv",
    group_cols: tuple = (),
) -> DataFrame:
    """Distinct / union / intersection estimates for two segments from
    their KMV sketches, with the exact counts riding along as
    self-validating columns (drop them at 100 TB; the sketches need
    one pass, the exacts need a count-distinct). Optional
    ``group_cols`` compute the whole set algebra per group (e.g. per
    time window — the batch twin of ``stream_window_kmv``).

    Union sketch = k smallest of (kmv_a ∪ kmv_b) — exact by the KMV
    property. Intersection via the standard estimator: the fraction of
    union-sketch hashes present in BOTH sketches times the union
    estimate. Below saturation every number degrades to exact.
    """
    gcols = list(group_cols)
    typed = df.filter(F.col(type_col).isin([type_a, type_b]))
    sk = kmv_sketch(typed, key_col, gcols + [type_col], k=k, seed=seed)
    empty = F.array().cast("array<long>")
    one = sk.groupBy(*gcols).agg(
        F.coalesce(
            F.max(F.when(F.col(type_col) == type_a, F.col("kmv"))), empty
        ).alias("a"),
        F.coalesce(
            F.max(F.when(F.col(type_col) == type_b, F.col("kmv"))), empty
        ).alias("b"),
    )
    u_all = F.array_sort(F.array_union(F.col("a"), F.col("b")))
    u_sk = F.slice(u_all, 1, k)
    both = F.array_intersect(F.col("a"), F.col("b"))
    matches = F.size(F.array_intersect(u_sk, both))
    est_u = kmv_estimate_col(u_all, k)
    jacc = F.when(
        F.size(u_all) < k,
        F.size(both).cast("double") / F.size(u_all).cast("double"),
    ).otherwise(matches.cast("double") / F.lit(float(k)))
    est = one.select(
        *gcols,
        kmv_estimate_col(F.col("a"), k).alias("est_a"),
        kmv_estimate_col(F.col("b"), k).alias("est_b"),
        est_u.alias("est_union"),
        F.round(jacc, 6).alias("est_jaccard"),
        F.round(jacc * est_u, 6).alias("est_intersect"),
    )
    exact = typed.groupBy(*gcols).agg(
        F.countDistinct(
            F.when(F.col(type_col) == type_a, F.col(key_col))
        ).alias("exact_a"),
        F.countDistinct(
            F.when(F.col(type_col) == type_b, F.col(key_col))
        ).alias("exact_b"),
        F.countDistinct(F.col(key_col)).alias("exact_union"),
    )
    joined = (
        est.join(exact, gcols)
        if gcols
        else est.crossJoin(F.broadcast(exact))
    )
    out = joined.withColumn(
        "exact_intersect",
        (F.col("exact_a") + F.col("exact_b") - F.col("exact_union")).cast(
            "long"
        ),
    )
    return out.orderBy(*gcols) if gcols else out


def kmv_set_ops_sql(
    table: str,
    key_expr: str,
    type_expr: str,
    type_a: str,
    type_b: str,
    k: int = 256,
    seed: str = "kmv",
    cte_prefix: str = "",
) -> str:
    """DuckDB replay of :func:`kmv_set_ops` — identical 32-bit md5
    hashes, identical k-smallest sets, identical estimate
    parenthesization."""
    head = f"{cte_prefix}," if cte_prefix else "WITH"
    hx = (
        f"CAST(('0x' || substr(md5('{seed}:' || CAST({key_expr} AS VARCHAR)),"
        f" 1, 8)) AS BIGINT)"
    )
    est = (
        "CASE WHEN len({a}) < {k} THEN CAST(len({a}) AS DOUBLE) "
        "ELSE ({k} - 1.0) / (CAST({a}[{k}] AS DOUBLE) / 4294967296.0) END"
    )
    return f"""
{head} typed AS (
  SELECT {type_expr} AS t, {hx} AS h FROM {table}
  WHERE {type_expr} IN ('{type_a}', '{type_b}')
),
sk AS (
  SELECT t, list_slice(list_sort(list(DISTINCT h)), 1, {k}) AS kmv
  FROM typed GROUP BY t
),
one AS (
  SELECT
    max(CASE WHEN t = '{type_a}' THEN kmv END) AS a,
    max(CASE WHEN t = '{type_b}' THEN kmv END) AS b
  FROM sk
),
c AS (
  SELECT a, b,
    list_sort(list_distinct(list_concat(a, b))) AS u_all,
    list_filter(a, x -> list_contains(b, x)) AS inboth
  FROM one
),
e AS (
  SELECT
    round({est.format(a='a', k=k)}, 6) AS est_a,
    round({est.format(a='b', k=k)}, 6) AS est_b,
    round({est.format(a='u_all', k=k)}, 6) AS est_union,
    CASE WHEN len(u_all) < {k}
         THEN CAST(len(inboth) AS DOUBLE) / CAST(len(u_all) AS DOUBLE)
         ELSE CAST(len(list_filter(list_slice(u_all, 1, {k}),
                                   x -> list_contains(inboth, x))) AS DOUBLE)
              / CAST({k} AS DOUBLE)
    END AS jacc
  FROM c
),
ex AS (
  SELECT
    count(DISTINCT CASE WHEN t = '{type_a}' THEN h END) AS exact_a,
    count(DISTINCT CASE WHEN t = '{type_b}' THEN h END) AS exact_b,
    count(DISTINCT h) AS exact_union
  FROM typed
)
SELECT est_a, est_b, est_union,
  round(jacc, 6) AS est_jaccard,
  round(jacc * est_union, 6) AS est_intersect,
  CAST(exact_a AS BIGINT) AS exact_a,
  CAST(exact_b AS BIGINT) AS exact_b,
  CAST(exact_union AS BIGINT) AS exact_union,
  CAST(exact_a + exact_b - exact_union AS BIGINT) AS exact_intersect
FROM e CROSS JOIN ex
"""


# ---------------------------------------------------------------------------
# distribution drift (PSI + KS) between two event-time periods
# ---------------------------------------------------------------------------


def drift_metrics(
    df: DataFrame,
    value_col: Column,
    cur_pred: Column,
    group_cols: list[str],
) -> DataFrame:
    """Population Stability Index + Kolmogorov-Smirnov statistic of a
    value's distribution between a reference period (``cur_pred``
    false) and a current period (``cur_pred`` true) — the
    training-data drift monitor (did token lengths / activity values
    shift under the pipeline since the last snapshot?).

    Both periods histogram into the same log-scaled bins as
    :func:`hist_quantiles` (<=252 bins), so the whole comparison runs
    on bin frames:

    1. ONE corpus scan -> hash aggregate to (group, bin, ref_cnt,
       cur_cnt) — conditional counts, map-side partials; the only
       row-scale shuffle, and it carries (group, bin) keys only;
    2. group totals / bin cumsums as windows over the BIN frame
       (group-sized partitions, <=252 rows each) — all INTEGER sums,
       partition-order independent;
    3. KS in exact integer arithmetic: the statistic's numerator
       ``max |cum_ref*cur_n - cum_cur*ref_n|`` folds as decimal(38)
       products (overflow-free to ~1e18 rows per side), one float
       division at the very end;
    4. PSI with add-one smoothing over the union bin set
       (``p = (ref_cnt+1)/(ref_n+n_bins)``) — each bin's term has one
       fixed expression shape and the per-group sum folds BIN-ORDERED
       over a collected (<=252-entry) array, so float add order is
       fixed and the DuckDB oracle replays hash-exact (same
       discipline as the NLL/DSIR folds).

    Output: ``group_cols..., ref_n, cur_n, n_bins, psi, ks`` (floats
    rounded to 6, the repo's hashed-float convention). Groups with an
    empty side report NULL psi/ks (nothing to compare against).
    """
    from pyspark.sql.window import Window

    cur = cur_pred.cast("int")
    hist = (
        df.select(
            *group_cols, hist_bin(value_col.cast("long")).alias("_bin"), cur.alias("_c")
        )
        .groupBy(*group_cols, "_bin")
        .agg(
            F.sum(F.lit(1) - F.col("_c")).alias("_rc"),
            F.sum("_c").alias("_cc"),
        )
    )
    w = Window.partitionBy(*group_cols)
    wo = (
        Window.partitionBy(*group_cols)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dec = "decimal(38,0)"
    x = hist.select(
        *group_cols,
        "_bin",
        "_rc",
        "_cc",
        F.sum("_rc").over(w).alias("_rn"),
        F.sum("_cc").over(w).alias("_cn"),
        F.count(F.lit(1)).over(w).alias("_nb"),
        F.sum("_rc").over(wo).alias("_cumr"),
        F.sum("_cc").over(wo).alias("_cumc"),
    )
    p = (F.col("_rc") + 1).cast("double") / (F.col("_rn") + F.col("_nb")).cast("double")
    q = (F.col("_cc") + 1).cast("double") / (F.col("_cn") + F.col("_nb")).cast("double")
    term = (p - q) * F.log(p / q)
    diff = F.abs(
        F.col("_cumr").cast(dec) * F.col("_cn").cast(dec)
        - F.col("_cumc").cast(dec) * F.col("_rn").cast(dec)
    )
    g = x.select(
        *group_cols, "_bin", "_rn", "_cn", "_nb", term.alias("_t"), diff.alias("_d")
    ).groupBy(*group_cols).agg(
        F.max("_rn").alias("ref_n"),
        F.max("_cn").alias("cur_n"),
        F.max("_nb").alias("n_bins"),
        F.max("_d").alias("_ksnum"),
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct(F.col("_bin").alias("b"), F.col("_t").alias("t")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("_psi"),
    )
    both = (F.col("ref_n") > 0) & (F.col("cur_n") > 0)
    ks = F.col("_ksnum").cast("double") / (
        F.col("ref_n").cast("double") * F.col("cur_n").cast("double")
    )
    return g.select(
        *group_cols,
        F.col("ref_n").cast("long").alias("ref_n"),
        F.col("cur_n").cast("long").alias("cur_n"),
        F.col("n_bins").cast("long").alias("n_bins"),
        F.when(both, F.round(F.col("_psi"), 6)).alias("psi"),
        F.when(both, F.round(ks, 6)).alias("ks"),
    )


def drift_metrics_sql(
    table: str,
    value_expr: str,
    cur_expr: str,
    group_cols: list[str],
) -> str:
    """DuckDB replay of :func:`drift_metrics`: identical bins
    (:func:`duck_hist_bin_sql` shape), identical integer windows,
    identical bin-ordered float fold — hash-exact."""
    gc = ", ".join(group_cols)
    return f"""
WITH binned AS (
  SELECT {gc},
    CASE WHEN v IS NULL OR v <= 0 THEN -1
         ELSE (length(bin(v)) - 1) * 4
              + CAST(floor((v * 4) / power(2, length(bin(v)) - 1)) AS BIGINT) - 4
    END AS b,
    CASE WHEN {cur_expr} THEN 1 ELSE 0 END AS c
  FROM (SELECT *, CAST({value_expr} AS BIGINT) AS v FROM {table})
),
hist AS (
  SELECT {gc}, b, sum(1 - c) AS rc, sum(c) AS cc
  FROM binned GROUP BY {gc}, b
),
x AS (
  SELECT {gc}, b, rc, cc,
    sum(rc) OVER (PARTITION BY {gc}) AS rn,
    sum(cc) OVER (PARTITION BY {gc}) AS cn,
    count(*) OVER (PARTITION BY {gc}) AS nb,
    sum(rc) OVER (PARTITION BY {gc} ORDER BY b
                  ROWS UNBOUNDED PRECEDING) AS cumr,
    sum(cc) OVER (PARTITION BY {gc} ORDER BY b
                  ROWS UNBOUNDED PRECEDING) AS cumc
  FROM hist
),
terms AS (
  SELECT {gc}, b, rn, cn, nb,
    (CAST(rc + 1 AS DOUBLE) / CAST(rn + nb AS DOUBLE)
     - CAST(cc + 1 AS DOUBLE) / CAST(cn + nb AS DOUBLE))
    * ln((CAST(rc + 1 AS DOUBLE) / CAST(rn + nb AS DOUBLE))
         / (CAST(cc + 1 AS DOUBLE) / CAST(cn + nb AS DOUBLE))) AS t,
    abs(CAST(cumr AS HUGEINT) * CAST(cn AS HUGEINT)
        - CAST(cumc AS HUGEINT) * CAST(rn AS HUGEINT)) AS d
  FROM x
)
SELECT {gc},
  CAST(max(rn) AS BIGINT) AS ref_n,
  CAST(max(cn) AS BIGINT) AS cur_n,
  CAST(max(nb) AS BIGINT) AS n_bins,
  CASE WHEN max(rn) > 0 AND max(cn) > 0 THEN
    round(list_sum(list_transform(
      list(struct_pack(b := b, t := t) ORDER BY b, t), s -> s.t)), 6)
  END AS psi,
  CASE WHEN max(rn) > 0 AND max(cn) > 0 THEN
    round(CAST(max(d) AS DOUBLE)
          / (CAST(max(rn) AS DOUBLE) * CAST(max(cn) AS DOUBLE)), 6)
  END AS ks
FROM terms GROUP BY {gc} ORDER BY {gc}
"""


def py_drift_metrics(ref_bins: dict, cur_bins: dict):
    """Pure-Python replay of one :func:`drift_metrics` group from two
    bin tables — the shared arithmetic for the streaming fold and the
    equivalence tests: identical expression shapes, bin-ordered float
    adds, round-6 outputs (Python floats are IEEE doubles, so the ops
    match the JVM bit-for-bit modulo a final-ulp ln difference that
    round-6 absorbs).

    Returns ``(ref_n, cur_n, n_bins, psi, ks)``; psi/ks are None when
    either side is empty.
    """
    import math

    bins = sorted(set(ref_bins) | set(cur_bins))
    nb = len(bins)
    rn = sum(ref_bins.values())
    cn = sum(cur_bins.values())
    if rn == 0 or cn == 0:
        return rn, cn, nb, None, None
    psi = 0.0
    cum_r = cum_c = 0
    num = 0
    for b in bins:
        rc = ref_bins.get(b, 0)
        cc = cur_bins.get(b, 0)
        p = (rc + 1) / (rn + nb)
        q = (cc + 1) / (cn + nb)
        psi += (p - q) * math.log(p / q)
        cum_r += rc
        cum_c += cc
        num = max(num, abs(cum_r * cn - cum_c * rn))
    return rn, cn, nb, round(psi, 6), round(num / (rn * cn), 6)


def hist_table(df: DataFrame, value_col: Column, pred: Column | None = None) -> dict:
    """Log-bin histogram of a (filtered) frame as a plain dict — the
    bounded (<=252-row) reference snapshot ``stream_drift_psi``
    monitors against. The collect is dimension-class by construction."""
    d = df.filter(pred) if pred is not None else df
    rows = (
        d.select(hist_bin(value_col.cast("long")).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    return {int(r["b"]): int(r["count"]) for r in rows}

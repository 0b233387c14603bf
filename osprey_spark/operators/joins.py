"""Temporal / interval join operators Spark lacks as built-ins.

Two classic shapes a feature-backfill or analytics pipeline needs that
have no direct DataFrame API:

* **as-of join** — each left row picks the single most recent right row
  at or before its timestamp (per key).  The naive formulation is an
  inequality join + per-pair argmax: quadratic fan-out on hot keys.
  :func:`asof_join` instead uses the union-and-carry-forward plan —
  ONE shuffle on the key, one sort, a running ``last(ignorenulls)``
  window — cost identical to a sort-merge join, zero fan-out.

* **range join** — points matched to containing ``[lo, hi]`` intervals.
  Spark executes a raw ``BETWEEN`` join condition as
  BroadcastNestedLoopJoin/CartesianProduct.  :func:`range_join` bins
  the value domain so both sides equi-join on a bin id (plus optional
  equi-keys) and the exact containment check runs only on bin-collided
  candidates — the standard binned range-join rewrite (what
  Databricks' range-join hint and KDB's window joins do under the
  hood), expressed in plain DataFrame ops so Catalyst still picks
  broadcast vs shuffle per side.

No reference counterpart: roostorg/osprey has no temporal join
operator (its per-event engine sees one action at a time); these are
the batch/analytics complements the survey's training-pipeline section
calls for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Per-key as-of join: for every left row, attach the right row
    with the greatest ``right_ts`` <= ``left_ts`` (``backward``,
    inclusive) or the least ``right_ts`` >= ``left_ts`` (``forward``).

    Plan shape (the 100 TB argument):

    1. both sides project to (keys, ts, payload-struct) and
       ``unionByName`` — no join yet, so no fan-out;
    2. one hash exchange on ``on`` + one sort by (ts, side) — exactly
       a sort-merge join's cost;
    3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding
       row window carries the latest right payload forward onto each
       left row; right rows sort BEFORE left rows at equal ts, making
       the match inclusive (DuckDB/pandas ``merge_asof`` semantics).

    The payload rides in ONE struct so a right row whose payload
    columns are legitimately NULL still matches (``last`` skips NULLs
    at the struct level only).  Rows never multiply: output cardinality
    == left cardinality (matched columns NULL where no right row
    qualifies — left-join semantics).

    Ties inside the right side (duplicate (key, ts)) carry whichever
    sorts last — pre-aggregate the right side to unique (key, ts) for
    a deterministic result (the oracle-checked driver query does).

    Skew: a hot key serializes into one sorted partition, same as any
    keyed stateful op; AQE skew-join can split the *exchange* but the
    carry-forward needs key-contiguous order, so extreme hot keys want
    a coarser key (e.g. (key, day)) with per-day boundary seeding.

    ``tolerance_s`` nulls out matches farther than the given seconds
    from the left timestamp (pandas ``merge_asof(tolerance=)``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in on and c != right_ts
        ]
    overlap = {prefix + c for c in right_cols} & set(left.columns)
    if overlap:
        raise ValueError(f"prefixed right columns collide with left: {sorted(overlap)}")

    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    # a NULL-timestamped right row can never be "at or before/after"
    # anything, but under asc-NULLS-FIRST ordering it would sort ahead
    # of every real row and its payload would carry into matchless
    # left rows — drop them up front
    r2 = right.filter(F.col(right_ts).isNotNull()).select(
        *on, F.col(right_ts).alias("__ats"), F.lit(0).alias("__side"), payload.alias("__r")
    )
    l2 = left.select(
        "*", F.col(left_ts).alias("__ats"), F.lit(1).alias("__side")
    )
    # unionByName(allowMissingColumns) nulls out __r on the left side
    # and every left payload column on the right side
    u = l2.unionByName(r2, allowMissingColumns=True)

    if direction == "backward":
        order = [F.asc("__ats"), F.asc("__side")]
    else:
        order = [F.desc("__ats"), F.asc("__side")]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # a NULL-timestamped LEFT row matches nothing (under forward's
    # desc-NULLS-LAST ordering it would otherwise pick up the
    # minimum-ts right row)
    matched = F.when(
        F.col("__ats").isNotNull(), F.last("__r", ignorenulls=True).over(w)
    )
    out = u.withColumn("__m", matched).filter(F.col("__side") == 1)

    if tolerance_s is not None:
        gap = F.col("__ats").cast("double") - F.col("__m.__rts").cast("double")
        if direction == "forward":
            gap = -gap
        out = out.withColumn(
            "__m", F.when(gap <= F.lit(float(tolerance_s)), F.col("__m"))
        )

    keep = [c for c in left.columns]
    proj = [F.col(c) for c in keep]
    proj.append(F.col("__m.__rts").alias(prefix + right_ts))
    proj.extend(F.col(f"__m.{c}").alias(prefix + c) for c in right_cols)
    return out.select(*proj)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: list[str] | None = None,
    bin_width: float | None = None,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Inner join of each point row to every interval row whose
    ``[lo_col, hi_col]`` contains ``point_col`` (optionally also
    equi-keyed on ``on``).

    Strategies:

    * ``broadcast_intervals=True`` — the interval table is dimension-
      sized: broadcast it and let the containment predicate run as a
      (nested-loop) broadcast join.  Correct scale answer when the
      interval side fits in memory; the cross product is bounded by
      the broadcast side.
    * ``bin_width`` set — both sides are large: points compute ONE bin
      id (``floor(p/w)``), intervals explode to the bins they cover,
      and the join becomes an equi-join on (bins + keys) with the
      exact ``BETWEEN`` check post-filtering bin-collided candidates.
      A point lands in exactly one bin and an interval covers each of
      its bins once, so no duplicate pairs arise (no ``distinct``
      needed).  Shuffle volume: |points| + sum(interval_width/w) rows
      of a few columns — pick ``w`` near the median interval width so
      the explode factor stays O(1).

    Exactly one of the two strategies must be selected.
    """
    on = on or []
    pc, lo, hi = F.col(point_col), F.col(lo_col), F.col(hi_col)
    contains = pc.between(lo, hi)
    eq = [points[k] == intervals[k] for k in on]
    if broadcast_intervals and bin_width is None:
        cond = contains
        for e in eq:
            cond = cond & e
        joined = points.join(F.broadcast(intervals), cond)
        return joined.drop(*[intervals[k] for k in on])
    if bin_width is None:
        raise ValueError("pass bin_width for the binned strategy or broadcast_intervals=True")
    w = float(bin_width)
    pb = points.withColumn("__bin", F.floor(pc / F.lit(w)).cast("long"))
    ib = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(lo / F.lit(w)).cast("long"), F.floor(hi / F.lit(w)).cast("long")
            )
        ),
    )
    cond = pb["__bin"] == ib["__bin"]
    for k in on:
        cond = cond & (pb[k] == ib[k])
    joined = pb.join(ib, cond).filter(contains)
    return joined.drop(ib["__bin"]).drop(pb["__bin"]).drop(*[ib[k] for k in on])


def bucket_of(id_col: Column, seed: str = "", buckets: int = 10000) -> Column:
    """Deterministic [0, buckets) bucket from md5(seed:id), replayable
    by an external SQL engine. Uses a 32-bit digest prefix: a 16-bit
    prefix mod 10000 would leave a 7:6 frequency skew between buckets
    below/above 5536 (65536 % 10000), visibly biasing split fractions;
    2^32 % 10000 leaves a relative bias of ~7e-7."""
    key = F.concat(F.lit(seed), F.lit(":"), id_col.cast("string"))
    return (
        F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10).cast("long")
        % F.lit(buckets)
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: one projection, ZERO
    shuffles, no RNG.  Each row's md5 bucket (0..9999) falls into
    cumulative weight ranges in sorted-split-name order, so the split
    is reproducible across runs, engines (the DuckDB oracle replays
    it) and table layouts, and any stratum's split fractions converge
    to the weights (hash uniformity) without a per-stratum shuffle.

    Weights must sum to 1 (to 4 decimal places — bucket resolution).
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-4:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = bucket_of(F.col(id_col), seed=seed)
    expr = None
    acc = 0.0
    # iterate sorted for a deterministic boundary order
    for name, frac in sorted(weights.items()):
        acc += frac
        hi = round(acc * 10000)
        branch = F.lit(name)
        if expr is None:
            expr = F.when(bucket < hi, branch)
        else:
            expr = expr.when(bucket < hi, branch)
    # float-sum residue lands the last bucket in the last split
    last = sorted(weights)[-1]
    return df.withColumn(split_col, expr.otherwise(F.lit(last)))


def hash_split_oracle_case(weights: dict[str, float], id_expr: str, seed: str = "") -> str:
    """DuckDB CASE expression replaying :func:`hash_split` bucket
    boundaries for the oracle query."""
    bucket = (
        f"CAST(('0x' || substr(md5(CAST('{seed}' || ':' || {id_expr} AS VARCHAR)), 1, 8)) "
        "AS BIGINT) % 10000"
    )
    acc = 0.0
    arms = []
    for name, frac in sorted(weights.items()):
        acc += frac
        arms.append(f"WHEN {bucket} < {round(acc * 10000)} THEN '{name}'")
    last = sorted(weights)[-1]
    return "CASE " + " ".join(arms) + f" ELSE '{last}' END"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: a hot join key concentrates all its
    rows in one task of a plain hash join; salting splits the hot
    key's LEFT rows across ``salts`` sub-partitions and replicates the
    RIGHT side once per salt, so the join key becomes (key, salt) and
    the hot key's work spreads over ``salts`` tasks.

    Semantics are exactly the plain join's: each left row carries ONE
    deterministic salt (hash of the whole row — duplicate rows share a
    salt, which only affects balance, never results), each right row
    exists once per salt, so every (left, right) match appears exactly
    once; ``left``-outer unmatched rows survive as themselves.

    Use when the right side is too big to broadcast but cheap to
    replicate ``salts``× (dimension-to-fact scale gap); for broadcast-
    sized right sides just broadcast, and for both-sides-huge skew
    prefer AQE's skew-join split, which salts adaptively at runtime.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salts)
    ).cast("int")
    l2 = left.withColumn("__salt", salt)
    r2 = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    joined = l2.join(r2, [on, "__salt"], how)
    return joined.drop("__salt")


def stratified_split_exact(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    seed: str = "",
    split_col: str = "split",
) -> DataFrame:
    """EXACT per-stratum split proportions: rows rank inside their
    stratum by a seeded md5 order and split at rank/count thresholds,
    so every stratum's split sizes are exact to ±1 row (vs
    :func:`hash_split`'s in-expectation proportions).

    Scale shape: one count aggregate per stratum (broadcast back) and
    one rank window PER STRATUM — a stratum is a single sort
    partition, so this is for BOUNDED strata (languages, sources);
    for high-cardinality or giant strata use ``hash_split``, which is
    one shuffle-free projection. Deterministic: same seed → same
    assignment, replayable in SQL.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-4:
        raise ValueError(f"weights must sum to 1, got {total}")
    order_key = F.md5(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")).cast("binary")
    )
    w = Window.partitionBy(strata_col).orderBy(order_key, F.col(id_col))
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    ranked = df.withColumn("__rk", F.row_number().over(w)).join(
        F.broadcast(counts), strata_col
    )
    expr = None
    acc = 0.0
    for name, frac in sorted(weights.items()):
        acc += frac
        # ceil at each cumulative boundary -> sizes exact to the
        # rounding of the boundary, replayable as ceil() in SQL
        hi = F.ceil(F.col("__n") * F.lit(acc))
        branch = F.lit(name)
        if expr is None:
            expr = F.when(F.col("__rk") <= hi, branch)
        else:
            expr = expr.when(F.col("__rk") <= hi, branch)
    last = sorted(weights)[-1]
    return ranked.withColumn(split_col, expr.otherwise(F.lit(last))).drop(
        "__rk", "__n"
    )


# ---------------------------------------------------------------------------
# bucketed (co-located) joins
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a Spark catalog table hash-bucketed (and
    bucket-sorted) on ``key`` — the write-side half of a co-located
    join. Tables bucketed on the same key with the SAME bucket count
    sort-merge-join with ZERO exchanges: each task reads matching
    buckets from both sides, so a 100 TB fact⋈fact join costs no
    shuffle at all (the brief's "bucketing for co-located joins";
    `tests/test_bucketed_join.py` asserts the exchange-free plan).
    Bucket counts are a layout contract: pick once per table family
    (e.g. 4096 for turn-scale tables) and keep writers consistent —
    mismatched counts fall back to shuffling one side.

    On the cluster target this maps 1:1 onto Iceberg's ``bucket(N,
    key)`` partition transform with storage-partitioned joins; the
    local form uses the session catalog so the optimization is
    testable here.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(*(sort_cols or [key]))
        .saveAsTable(table)
    )

"""Two-sample / rank-based hypothesis tests, engine-exact.

Round-4 additions to the statistics tail: Mann-Whitney U (the
nonparametric two-cohort comparison every "did the distribution
change?" question wants before anyone assumes normality) and Spearman
rank correlation (monotone association without linearity). Both follow
the repo's exactness discipline: every rank moment is a BIGINT (ranks
with tie-averaging ride a ×2 quantization so halves stay integral),
and the final statistic is one fixed parenthesization of double casts
— bit-identical between Spark and the DuckDB replay.

Scale shapes:
- ``mann_whitney`` aggregates to the DISTINCT-VALUE frame first (one
  hash aggregate over the pooled metric), so the ordered window that
  assigns average ranks runs over support cardinality, not row count.
  Contract (documented, like hist_quantiles' bins): the metric must
  have bounded support — lengths, counts, scores, bucketed doubles.
  For continuous metrics, pre-bucket (the test is rank-based; any
  strictly monotone bucketing that preserves distinctness of interest
  is admissible).
- ``spearman_corr`` ranks PER-KEY AGGREGATES (one row per key), the
  gini_activity frame class: key cardinality (users, conversations)
  is orders below the event stream, and the moments that follow are
  map-side-combinable sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mann_whitney(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Mann-Whitney U (two-sided normal approximation, tie-corrected).

    Output: one row ``(n_a, n_b, u_a, z)`` where ``u_a`` is group A's
    U statistic under average ranks and ``z`` its standardized value
    with the tie-corrected variance
    ``var = n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1)))``.

    Exact-integer discipline: with ``c_lt(v)`` = pooled count below v,
    ``t(v)`` = pooled ties at v, the doubled rank-sum
    ``2·R_a = Σ_v a(v)·(2·c_lt(v) + t(v) + 1)`` is a BIGINT, as is
    ``2·U_a = 2·R_a − n_a(n_a+1)`` and the tie moment Σ(t³−t). z is a
    fixed-order double expression over those integers, rounded to 6.
    """
    pool = df.select(
        F.col(value_col).alias("_v"),
        F.when(F.col(group_col) == F.lit(group_a), 1)
        .when(F.col(group_col) == F.lit(group_b), 0)
        .alias("_g"),
    ).filter(F.col("_g").isNotNull() & F.col("_v").isNotNull())
    # distinct-value frame: one row per support point
    per_v = pool.groupBy("_v").agg(
        F.count(F.lit(1)).cast("long").alias("_t"),
        F.sum("_g").cast("long").alias("_a"),
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.select(
        "_v",
        "_t",
        "_a",
        F.coalesce(F.sum("_t").over(w), F.lit(0)).cast("long").alias("_clt"),
    )
    m = ranked.agg(
        F.sum("_a").cast("long").alias("n_a"),
        F.sum(F.col("_t") - F.col("_a")).cast("long").alias("n_b"),
        F.sum(
            F.col("_a") * (F.lit(2) * F.col("_clt") + F.col("_t") + F.lit(1))
        )
        .cast("long")
        .alias("_r2"),
        F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t"))
        .cast("long")
        .alias("_ties"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    u2 = (F.col("_r2") - F.col("n_a") * (F.col("n_a") + F.lit(1))).cast(
        "double"
    )  # 2·U_a
    mean2 = na * nb  # 2·E[U]
    var = (
        na
        * nb
        / F.lit(12.0)
        * ((n + F.lit(1.0)) - F.col("_ties").cast("double") / (n * (n - F.lit(1.0))))
    )
    z = F.when(var > 0, (u2 - mean2) / (F.lit(2.0) * F.sqrt(var)))
    return m.select(
        "n_a",
        "n_b",
        (u2 / F.lit(2.0)).alias("u_a"),
        F.round(z, 6).alias("z"),
    )


def mann_whitney_sql(
    pool_sql: str,
) -> str:
    """DuckDB replay over a CTE named by ``pool_sql`` producing
    columns ``(_v, _g)`` with ``_g`` ∈ {1, 0} — same doubled-rank
    integer moments, same fixed-order double algebra."""
    return f"""mwv AS (
  SELECT _v, CAST(count(*) AS BIGINT) AS t, CAST(sum(_g) AS BIGINT) AS a
  FROM ({pool_sql}) GROUP BY _v
),
mwr AS (
  SELECT _v, t, a,
    CAST(coalesce(sum(t) OVER (ORDER BY _v ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS BIGINT) AS clt
  FROM mwv
),
mwm AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_a,
         CAST(sum(t - a) AS BIGINT) AS n_b,
         CAST(sum(a * (2 * clt + t + 1)) AS BIGINT) AS r2,
         CAST(sum(t * t * t - t) AS BIGINT) AS ties
  FROM mwr
)
SELECT n_a, n_b,
  CAST(r2 - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
  round(CASE WHEN (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
              ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
               - CAST(ties AS DOUBLE) /
                 ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                  * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)))) > 0
        THEN (CAST(r2 - n_a * (n_a + 1) AS DOUBLE)
              - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             / (2.0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
              ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
               - CAST(ties AS DOUBLE) /
                 ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                  * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)))))
        END, 6) AS z
FROM mwm"""


def spearman_corr(
    keyed: DataFrame, x_col: str, y_col: str, key_col: str
) -> DataFrame:
    """Spearman ρ between two per-key metrics (one input row per key).

    Average ranks with the ×2 integral trick: for metric m,
    ``2·rank(v) = 2·c_lt(v) + t(v) + 1``; Pearson over the doubled
    ranks equals Pearson over ranks (correlation is scale-invariant),
    and every moment — Σr, Σr², Σ(r_x·r_y) — is a BIGINT. ρ is one
    fixed-order double expression, rounded to 6. Output:
    ``(n_keys, rho)``.

    Scale: two distinct-value windows over each metric's support plus
    one moment aggregate; the ranked frame is key-cardinality class.
    """
    base = keyed.select(
        F.col(key_col).alias("_k"),
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())

    def ranks(col: str) -> DataFrame:
        per_v = base.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("_t"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return per_v.select(
            col,
            (
                F.lit(2) * F.coalesce(F.sum("_t").over(w), F.lit(0))
                + F.col("_t")
                + F.lit(1)
            )
            .cast("long")
            .alias(f"_r{col}"),
        )

    j = base.join(ranks("_x"), "_x").join(ranks("_y"), "_y")
    m = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("_r_x").cast("long").alias("_sx"),
        F.sum("_r_y").cast("long").alias("_sy"),
        F.sum(F.col("_r_x") * F.col("_r_y")).cast("long").alias("_sxy"),
        F.sum(F.col("_r_x") * F.col("_r_x")).cast("long").alias("_sxx"),
        F.sum(F.col("_r_y") * F.col("_r_y")).cast("long").alias("_syy"),
    )
    nd = F.col("n_keys").cast("double")
    num = nd * F.col("_sxy").cast("double") - F.col("_sx").cast("double") * F.col(
        "_sy"
    ).cast("double")
    vx = nd * F.col("_sxx").cast("double") - F.col("_sx").cast("double") * F.col(
        "_sx"
    ).cast("double")
    vy = nd * F.col("_syy").cast("double") - F.col("_sy").cast("double") * F.col(
        "_sy"
    ).cast("double")
    rho = F.when((vx > 0) & (vy > 0), num / F.sqrt(vx * vy))
    return m.select("n_keys", F.round(rho, 6).alias("rho"))


def spearman_sql(keyed_sql: str) -> str:
    """DuckDB replay over a subquery producing ``(_k, _x, _y)``."""
    return f"""spb AS (
  SELECT _k, _x, _y FROM ({keyed_sql})
  WHERE _x IS NOT NULL AND _y IS NOT NULL
),
sprx AS (
  SELECT _x, CAST(2 * coalesce(sum(t) OVER (ORDER BY _x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + t + 1 AS BIGINT) AS rx
  FROM (SELECT _x, CAST(count(*) AS BIGINT) AS t FROM spb GROUP BY _x)
),
spry AS (
  SELECT _y, CAST(2 * coalesce(sum(t) OVER (ORDER BY _y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + t + 1 AS BIGINT) AS ry
  FROM (SELECT _y, CAST(count(*) AS BIGINT) AS t FROM spb GROUP BY _y)
),
spm AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
    CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
    CAST(sum(rx * ry) AS BIGINT) AS sxy,
    CAST(sum(rx * rx) AS BIGINT) AS sxx,
    CAST(sum(ry * ry) AS BIGINT) AS syy
  FROM spb JOIN sprx USING (_x) JOIN spry USING (_y)
)
SELECT n_keys,
  round(CASE WHEN (CAST(n_keys AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
              AND (CAST(n_keys AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        THEN (CAST(n_keys AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n_keys AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n_keys AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        END, 6) AS rho
FROM spm"""

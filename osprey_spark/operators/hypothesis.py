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


def chi2_independence(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Pearson chi-square test of independence between two bounded
    categorical columns, plus Cramér's V effect size.

    Per cell: ``(o·n − r·c)² / (n·r·c)`` — every factor an exact
    integer below 2^53, so the per-cell double is IEEE-identical in
    both engines; each contribution quantizes via
    ``floor(x·10^9 + 0.5)`` (positive; floor parity is exact, unlike
    round's HALF_UP-vs-HALF_EVEN split) and the BIGINT sum is
    order-independent. Output one row:
    ``(n, dof, chi2, cramers_v)``, both statistics rounded to 6.

    Scale: one hash aggregate to the contingency cells (alphabet² ≤
    bounded), broadcast marginals, nothing else touches the stream.
    """
    cells = df.groupBy(
        F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
    ).agg(F.count(F.lit(1)).cast("long").alias("_o"))
    rows = cells.groupBy("_a").agg(F.sum("_o").cast("long").alias("_r"))
    colsm = cells.groupBy("_b").agg(F.sum("_o").cast("long").alias("_c"))
    tot = cells.agg(
        F.sum("_o").cast("long").alias("_n"),
        F.countDistinct("_a").cast("long").alias("_nr"),
        F.countDistinct("_b").cast("long").alias("_nc"),
    )
    j = (
        cells.join(F.broadcast(rows), "_a")
        .join(F.broadcast(colsm), "_b")
        .join(F.broadcast(tot))
    )
    o = F.col("_o").cast("double")
    r = F.col("_r").cast("double")
    c = F.col("_c").cast("double")
    n = F.col("_n").cast("double")
    num = (o * n - r * c) * (o * n - r * c)
    contrib_q = F.floor(num / (n * r * c) * F.lit(1e9) + F.lit(0.5)).cast(
        "long"
    )
    m = j.groupBy("_n", "_nr", "_nc").agg(
        F.sum(contrib_q).cast("long").alias("_chi_q")
    )
    chi2 = F.col("_chi_q").cast("double") / F.lit(1e9)
    dof = ((F.col("_nr") - 1) * (F.col("_nc") - 1)).cast("long")
    minrc = F.least(F.col("_nr") - 1, F.col("_nc") - 1).cast("double")
    v = F.when(
        (minrc > 0) & (F.col("_n") > 0),
        F.sqrt(chi2 / (F.col("_n").cast("double") * minrc)),
    )
    return m.select(
        F.col("_n").alias("n"),
        dof.alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
    )


def chi2_independence_sql(pairs_sql: str) -> str:
    """DuckDB replay over a subquery producing ``(_a, _b)``."""
    return f"""c2c AS (
  SELECT _a, _b, CAST(count(*) AS BIGINT) AS o FROM ({pairs_sql}) GROUP BY _a, _b
),
c2r AS (SELECT _a, CAST(sum(o) AS BIGINT) AS r FROM c2c GROUP BY _a),
c2cl AS (SELECT _b, CAST(sum(o) AS BIGINT) AS c FROM c2c GROUP BY _b),
c2t AS (
  SELECT CAST(sum(o) AS BIGINT) AS n,
         CAST(count(DISTINCT _a) AS BIGINT) AS nr,
         CAST(count(DISTINCT _b) AS BIGINT) AS nc
  FROM c2c
),
c2m AS (
  SELECT n, nr, nc,
    CAST(sum(CAST(floor(
      (CAST(o AS DOUBLE) * CAST(n AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
      * (CAST(o AS DOUBLE) * CAST(n AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
      / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
      * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS chi_q
  FROM c2c JOIN c2r USING (_a) JOIN c2cl USING (_b) CROSS JOIN c2t
  GROUP BY n, nr, nc
)
SELECT n, CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
  round(CAST(chi_q AS DOUBLE) / 1e9, 6) AS chi2,
  round(CASE WHEN least(nr - 1, nc - 1) > 0 AND n > 0
        THEN sqrt(CAST(chi_q AS DOUBLE) / 1e9
                  / (CAST(n AS DOUBLE) * CAST(least(nr - 1, nc - 1) AS DOUBLE)))
        END, 6) AS cramers_v
FROM c2m"""


def kruskal_wallis(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Kruskal-Wallis H: the k-cohort extension of Mann-Whitney (did
    ANY of the role/cohort distributions shift?), tie-corrected.

    Same doubled-rank machinery as :func:`mann_whitney`: per distinct
    value v, ``2·rank(v) = 2·c_lt(v) + t(v) + 1`` (BIGINT); per group
    ``R2_g = Σ a_g(v)·2rank(v)``. Then
    ``H = (3·Σ_g (R2_g² / n_g)) / (n(n+1)) − 3(n+1)``, tie-corrected
    by ``1 − Σ(t³−t)/(n³−n)``. ``R2_g²`` can exceed 2^63, so the
    per-group term routes through DECIMAL(38,0) integer division
    (== DuckDB HUGEINT ``//``, floor on positives — the documented
    big-product discipline); the floor loses < 1 quantum per group
    (bounded groups), identically in both engines.

    Output: one row ``(n, k_groups, h)`` with h rounded to 6.
    Bounded-support contract on the value, group alphabet bounded.
    """
    pool = df.select(
        F.col(value_col).alias("_v"), F.col(group_col).alias("_g")
    ).filter(F.col("_v").isNotNull() & F.col("_g").isNotNull())
    per_v = pool.groupBy("_v").agg(F.count(F.lit(1)).cast("long").alias("_t"))
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    rank2 = per_v.select(
        "_v",
        "_t",
        (
            F.lit(2) * F.coalesce(F.sum("_t").over(w), F.lit(0))
            + F.col("_t")
            + F.lit(1)
        )
        .cast("long")
        .alias("_r2"),
    )
    per_g = (
        pool.join(rank2.select("_v", "_r2"), "_v")
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_ng"),
            F.sum("_r2").cast("long").alias("_rg2"),
        )
    )
    # R2_g² DIV n_g through DECIMAL(38,0): exact floor, no overflow
    term = F.expr(
        "CAST(CAST(_rg2 AS DECIMAL(38,0)) * CAST(_rg2 AS DECIMAL(38,0))"
        " DIV CAST(_ng AS DECIMAL(38,0)) AS DECIMAL(38,0))"
    )
    gm = per_g.agg(
        F.sum("_ng").cast("long").alias("_n"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum(term).alias("_sq"),  # decimal sum, exact
    )
    ties = per_v.agg(
        F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t"))
        .cast("long")
        .alias("_ties")
    )
    m = gm.join(F.broadcast(ties))
    nd = F.col("_n").cast("double")
    h_raw = (
        F.lit(3.0) * F.col("_sq").cast("double") / (nd * (nd + F.lit(1.0)))
        - F.lit(3.0) * (nd + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("_ties").cast("double") / (nd * nd * nd - nd)
    h = F.when(corr > 0, h_raw / corr)
    return m.select(
        F.col("_n").alias("n"), "k_groups", F.round(h, 6).alias("h")
    )


def kruskal_wallis_sql(pool_sql: str) -> str:
    """DuckDB replay over a subquery producing ``(_v, _g)``."""
    return f"""kwp AS (
  SELECT _v, _g FROM ({pool_sql}) WHERE _v IS NOT NULL AND _g IS NOT NULL
),
kwv AS (SELECT _v, CAST(count(*) AS BIGINT) AS t FROM kwp GROUP BY _v),
kwr AS (
  SELECT _v, t,
    CAST(2 * coalesce(sum(t) OVER (ORDER BY _v ROWS BETWEEN UNBOUNDED
          PRECEDING AND 1 PRECEDING), 0) + t + 1 AS BIGINT) AS r2
  FROM kwv
),
kwg AS (
  SELECT _g, CAST(count(*) AS BIGINT) AS ng, CAST(sum(r2) AS BIGINT) AS rg2
  FROM kwp JOIN kwr USING (_v) GROUP BY _g
),
kwm AS (
  SELECT CAST(sum(ng) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k_groups,
         sum(CAST(rg2 AS HUGEINT) * CAST(rg2 AS HUGEINT) // CAST(ng AS HUGEINT))
           AS sq
  FROM kwg
),
kwt AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS ties FROM kwv)
SELECT n, k_groups,
  round(CASE WHEN (1.0 - CAST(ties AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      - CAST(n AS DOUBLE))) > 0
        THEN (3.0 * CAST(sq AS DOUBLE)
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
              - 3.0 * (CAST(n AS DOUBLE) + 1.0))
             / (1.0 - CAST(ties AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   - CAST(n AS DOUBLE)))
        END, 6) AS h
FROM kwm CROSS JOIN kwt"""


def brown_forsythe(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test: did the
    VARIANCE/spread differ across cohorts? — the dispersion
    complement to Kruskal-Wallis's location shift (a drift that
    widens the distribution without moving its center trips this
    test first).

    Exactness: per group the EXACT median rides the two-middle-row
    selection as the integer ``med2 = z[(n+1)/2] + z[n/2+1]``
    (2·median), so the deviation ``d = |2x − med2|`` is a BIGINT.
    The F statistic's between/within sums use the moment forms
    ``Σ_g S_g²/n_g − S²/N`` and ``Σ d² − Σ_g S_g²/n_g`` with each
    ``S_g² // n_g`` an integer floor division — identical in both
    engines (BIGINT range at any realistic scale; the ≤1-unit floor
    loss is applied identically). Output one row
    ``(n, k_groups, f_bf)`` rounded to 6.

    Scale: group-partitioned windows (groups bounded), then one
    moment aggregate — nothing beyond the first shuffle.
    """
    pool = df.select(
        F.col(value_col).cast("long").alias("_v"),
        F.col(group_col).alias("_g"),
    ).filter(F.col("_v").isNotNull() & F.col("_g").isNotNull())
    wg = Window.partitionBy("_g").orderBy("_v")
    ranked = pool.select(
        "_g",
        "_v",
        F.row_number().over(wg).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("_g")).alias("_c"),
    )
    med2 = (
        ranked.filter(
            (F.col("_rn") == F.expr("(_c + 1) DIV 2"))
            | (F.col("_rn") == F.expr("_c DIV 2 + 1"))
        )
        .groupBy("_g")
        .agg((F.sum("_v") * 2 / F.count(F.lit(1))).cast("long").alias("_med2"))
    )
    dev = pool.join(F.broadcast(med2), "_g").select(
        "_g", F.abs(F.lit(2) * F.col("_v") - F.col("_med2")).cast("long").alias("_d")
    )
    per_g = dev.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("_ng"),
        F.sum("_d").cast("long").alias("_sg"),
        F.sum(F.col("_d") * F.col("_d")).cast("long").alias("_qg"),
    )
    m = per_g.agg(
        F.sum("_ng").cast("long").alias("_n"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("_sg").cast("long").alias("_s"),
        F.sum("_qg").cast("long").alias("_q"),
        F.sum(F.expr("(_sg * _sg) DIV _ng")).cast("long").alias("_sqg"),
    )
    nd = F.col("_n").cast("double")
    k = F.col("k_groups").cast("double")
    # the S_g²//n_g floors can push the between-sum a hair below the
    # exact S²/N (mathematically between >= 0): clamp at 0, mirrored
    # in the SQL replay
    between = F.greatest(
        F.col("_sqg").cast("double")
        - (F.col("_s").cast("double") * F.col("_s").cast("double") / nd),
        F.lit(0.0),
    )
    within = F.col("_q").cast("double") - F.col("_sqg").cast("double")
    f = F.when(
        (within > 0) & (k > 1) & (nd > k),
        (between / (k - F.lit(1.0))) / (within / (nd - k)),
    )
    return m.select(
        F.col("_n").alias("n"), "k_groups", F.round(f, 6).alias("f_bf")
    )


def brown_forsythe_sql(pool_sql: str) -> str:
    """DuckDB replay over a subquery producing ``(_v, _g)``."""
    return f"""bfp AS (
  SELECT CAST(_v AS BIGINT) AS _v, _g FROM ({pool_sql})
  WHERE _v IS NOT NULL AND _g IS NOT NULL
),
bfr AS (
  SELECT _g, _v,
    row_number() OVER (PARTITION BY _g ORDER BY _v) AS rn,
    count(*) OVER (PARTITION BY _g) AS c
  FROM bfp
),
bfm AS (
  SELECT _g, CAST(sum(_v) * 2 / count(*) AS BIGINT) AS med2
  FROM bfr WHERE rn = (c + 1) // 2 OR rn = c // 2 + 1
  GROUP BY _g
),
bfd AS (
  SELECT p._g, CAST(abs(2 * p._v - m.med2) AS BIGINT) AS d
  FROM bfp p JOIN bfm m ON p._g = m._g
),
bfg AS (
  SELECT _g, CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(d) AS BIGINT) AS sg,
         CAST(sum(d * d) AS BIGINT) AS qg
  FROM bfd GROUP BY _g
),
bft AS (
  SELECT CAST(sum(ng) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k_groups,
         CAST(sum(sg) AS BIGINT) AS s,
         CAST(sum(qg) AS BIGINT) AS q,
         CAST(sum((sg * sg) // ng) AS BIGINT) AS sqg
  FROM bfg
)
SELECT n, k_groups,
  round(CASE WHEN (CAST(q AS DOUBLE) - CAST(sqg AS DOUBLE)) > 0
              AND k_groups > 1 AND n > k_groups
        THEN (greatest(CAST(sqg AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE),
               CAST(0.0 AS DOUBLE))
              / (CAST(k_groups AS DOUBLE) - 1.0))
             / ((CAST(q AS DOUBLE) - CAST(sqg AS DOUBLE))
                / (CAST(n AS DOUBLE) - CAST(k_groups AS DOUBLE)))
        END, 6) AS f_bf
FROM bft"""

"""Data-quality expectation checks over the transcripts table.

The Great-Expectations-class ingest gate, engine-native: each
expectation compiles to a conditional COUNT inside a shared
aggregate, so a full check suite over 10^12 rows is ONE scan + ONE
map-side-combined aggregate for the row-level checks, plus one
conv-keyed aggregate (same shuffle key as the rest of the pipeline)
for the per-conversation structural checks — not one job per check,
which is how checklist tools burn a cluster. All counts are integers.

Checks:
- ``null_conv_id`` / ``null_ts`` / ``null_text`` — required fields;
- ``bad_role`` — role outside the dialogue contract's enum;
- ``negative_turn_idx`` — turn positions must be ≥ 0;
- ``sparse_conv`` — conversations whose turn_idx is not dense 0..n-1
  (max+1 ≠ count or min ≠ 0): dropped/duplicated turns upstream;
- ``ts_regression`` — a turn whose event time precedes the previous
  turn's (by turn_idx) within its conversation: clock skew or
  misordered backfill (one lag window over conv-bounded partitions).

Output: one row per check — ``(check_name, violations, total, passed)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VALID_ROLES = ("user", "assistant", "system", "tool")


def dq_observe_exprs(
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    ts_col: str = "ts",
) -> list:
    """The row-level expectations as ``observe()`` aggregate columns —
    the streaming form of the gate: attached to the input stream they
    ride the EXISTING micro-batch pass for free (no extra job, no
    second scan) and surface per-batch in every progress event's
    ``observedMetrics``, where the metrics listener records them.
    Only row-local checks belong here; the cross-row checks
    (sparse_conv, ts_regression) are the batch suite's job."""

    def cnt(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)

    return [
        F.count(F.lit(1)).cast("long").alias("rows"),
        cnt(F.col(conv_col).isNull(), "null_conv_id"),
        cnt(F.col(ts_col).isNull(), "null_ts"),
        cnt(F.col(text_col).isNull(), "null_text"),
        cnt(
            ~F.col(role_col).isin(*VALID_ROLES) | F.col(role_col).isNull(),
            "bad_role",
        ),
        cnt(F.col(idx_col) < 0, "negative_turn_idx"),
    ]


def dq_checks(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    total = F.count(F.lit(1)).cast("long")
    row_checks = turns.agg(
        total.alias("_total"),
        cnt(F.col(conv_col).isNull()).alias("null_conv_id"),
        cnt(F.col(ts_col).isNull()).alias("null_ts"),
        cnt(F.col(text_col).isNull()).alias("null_text"),
        cnt(
            ~F.col(role_col).isin(*VALID_ROLES) | F.col(role_col).isNull()
        ).alias("bad_role"),
        cnt(F.col(idx_col) < 0).alias("negative_turn_idx"),
    )

    conv_checks = (
        turns.groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.max(idx_col).alias("_mx"),
            F.min(idx_col).alias("_mn"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("_total"),
            cnt(
                (F.col("_mx") + 1 != F.col("_n")) | (F.col("_mn") != 0)
            ).alias("sparse_conv"),
        )
    )

    w = Window.partitionBy(conv_col).orderBy(idx_col)
    sec = F.col(ts_col).cast("timestamp").cast("long")
    prev = F.lag(sec).over(w)
    ts_check = turns.select(
        (prev.isNotNull() & (sec < prev)).alias("_regr")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("_total"),
        cnt(F.col("_regr")).alias("ts_regression"),
    )

    def unpivot(df, names):
        rows = None
        for name in names:
            r = df.select(
                F.lit(name).alias("check_name"),
                F.col(name).alias("violations"),
                F.col("_total").alias("total"),
            )
            rows = r if rows is None else rows.unionAll(r)
        return rows

    out = (
        unpivot(
            row_checks,
            ["null_conv_id", "null_ts", "null_text", "bad_role", "negative_turn_idx"],
        )
        .unionAll(unpivot(conv_checks, ["sparse_conv"]))
        .unionAll(unpivot(ts_check, ["ts_regression"]))
    )
    return out.select(
        "check_name", "violations", "total", (F.col("violations") == 0).alias("passed")
    )


def dq_checks_sql(table: str) -> str:
    """DuckDB oracle replaying the identical conditional counts."""
    roles = ", ".join(f"'{r}'" for r in VALID_ROLES)
    return f"""
WITH rowc AS (
  SELECT CAST(count(*) AS BIGINT) AS total,
    CAST(sum(CASE WHEN conv_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_conv_id,
    CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
    CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
    CAST(sum(CASE WHEN role IS NULL OR role NOT IN ({roles}) THEN 1 ELSE 0 END) AS BIGINT) AS bad_role,
    CAST(sum(CASE WHEN turn_idx < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_turn_idx
  FROM {table}
),
convc AS (
  SELECT CAST(count(*) AS BIGINT) AS total,
    CAST(sum(CASE WHEN mx + 1 != n OR mn != 0 THEN 1 ELSE 0 END) AS BIGINT) AS sparse_conv
  FROM (
    SELECT conv_id, count(*) AS n, max(turn_idx) AS mx, min(turn_idx) AS mn
    FROM {table} GROUP BY conv_id
  )
),
tsc AS (
  SELECT CAST(count(*) AS BIGINT) AS total,
    CAST(sum(CASE WHEN prev IS NOT NULL AND sec < prev THEN 1 ELSE 0 END) AS BIGINT) AS ts_regression
  FROM (
    SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec,
           lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
             PARTITION BY conv_id ORDER BY turn_idx) AS prev
    FROM {table}
  )
)
SELECT check_name, violations, total, violations = 0 AS passed FROM (
  SELECT 'null_conv_id' AS check_name, null_conv_id AS violations, total FROM rowc
  UNION ALL SELECT 'null_ts', null_ts, total FROM rowc
  UNION ALL SELECT 'null_text', null_text, total FROM rowc
  UNION ALL SELECT 'bad_role', bad_role, total FROM rowc
  UNION ALL SELECT 'negative_turn_idx', negative_turn_idx, total FROM rowc
  UNION ALL SELECT 'sparse_conv', sparse_conv, total FROM convc
  UNION ALL SELECT 'ts_regression', ts_regression, total FROM tsc
)
"""


# Benford first-digit probabilities log10(1 + 1/d), computed once in
# Python and embedded as IDENTICAL literals in both engines — the
# constants never depend on either engine's log implementation.
import math as _math

BENFORD_P = [_math.log10(1.0 + 1.0 / d) for d in range(1, 10)]


def benford_deviation(
    df: DataFrame,
    group_col: str = "user_id",
    value_col: str = "value",
    min_n: int = 50,
    chi2_crit: float = 20.09,
) -> DataFrame:
    """Benford's-law first-significant-digit screen (Newcomb 1881 /
    Benford 1938; Nigrini's forensic-accounting standard) over
    monetary amounts per group: fabricated or constrained amounts
    (fixed price points, invented invoices, structuring under a
    threshold) deviate from the log-uniform first-digit law that
    organic multi-scale amounts follow. The classic cheap fraud
    triage BEFORE entity-level rules run.

    Determinism: amounts quantize to integer cents
    (``round(value·100)`` → BIGINT, half-away-from-zero in both
    engines); the first digit reads off the integer's decimal string
    (plain-format in both engines for BIGINT — never the scientific
    notation a raw DOUBLE cast risks); the 9 expected probabilities
    are Python-computed literals embedded identically in both plans,
    and χ² = Σ_d (c_d − n·p_d)²/(n·p_d) adds its 9 terms in fixed
    digit order — missing digits contribute their full n·p_d
    (dropping them would understate deviation exactly where it
    matters).

    Scale shape: ONE hash aggregate per group (9 conditional digit
    counts + n as aggregate expressions — no digit-grid join, no
    pivot shuffle), map-side partials; output is group-cardinality.

    Returns (group, n, chi2, suspicious) for groups with at least
    ``min_n`` positive amounts; ``suspicious`` = χ² above
    ``chi2_crit`` (default: χ²₈ at p=0.99).
    """
    if min_n < 9:
        raise ValueError("benford_deviation: min_n >= 9 required")
    cents = F.round(F.col(value_col) * F.lit(100.0), 0).cast("long")
    base = df.select(F.col(group_col).alias("grp"), cents.alias("_c")).filter(
        F.col("_c") > 0
    )
    digit = F.substring(F.col("_c").cast("string"), 1, 1).cast("int")
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum((digit == d).cast("long")).alias(f"c{d}") for d in range(1, 10)
    ]
    counted = base.groupBy("grp").agg(*aggs).filter(F.col("n") >= int(min_n))
    nd = F.col("n").cast("double")
    chi2 = None
    for d in range(1, 10):
        exp = nd * F.lit(BENFORD_P[d - 1])
        cd = F.col(f"c{d}").cast("double")
        term = ((cd - exp) * (cd - exp)) / exp
        chi2 = term if chi2 is None else chi2 + term
    return counted.select(
        F.col("grp").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(float(chi2_crit))).cast("int").alias("suspicious"),
    )


def benford_sql(
    source_sql: str,
    min_n: int = 50,
    chi2_crit: float = 20.09,
) -> str:
    """DuckDB replay of :func:`benford_deviation`. ``source_sql`` must
    select (grp, value). Identical cents quantization, digit-string
    read, embedded probability literals, and fixed-order χ² chain."""
    counts = ", ".join(
        "CAST(sum(CASE WHEN substr(CAST(c AS VARCHAR), 1, 1) = '"
        + str(d)
        + "' THEN 1 ELSE 0 END) AS BIGINT) AS c"
        + str(d)
        for d in range(1, 10)
    )
    chi2 = None
    for d in range(1, 10):
        exp = f"(CAST(n AS DOUBLE) * {BENFORD_P[d - 1]!r})"
        term = f"((CAST(c{d} AS DOUBLE) - {exp}) * (CAST(c{d} AS DOUBLE) - {exp})) / {exp}"
        chi2 = term if chi2 is None else f"{chi2} + {term}"
    return f"""
bsource AS ({source_sql}),
bcents AS (
  SELECT grp, CAST(round(value * 100.0, 0) AS BIGINT) AS c FROM bsource
  WHERE CAST(round(value * 100.0, 0) AS BIGINT) > 0
),
bcounted AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n, {counts}
  FROM bcents GROUP BY grp HAVING count(*) >= {int(min_n)}
)
SELECT grp, n, round({chi2}, 6) AS chi2,
  CAST(({chi2}) > {float(chi2_crit)!r} AS INT) AS suspicious
FROM bcounted
"""


def cohens_kappa(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Cohen's kappa (Cohen 1960) between two binary raters — the
    chance-corrected agreement statistic behind every "are these two
    rules the same signal?" and inter-annotator-consistency question.
    Raw percent agreement is inflated whenever one class dominates
    (two rules that both almost never fire "agree" 99% of the time by
    accident); kappa subtracts the agreement expected from the
    raters' marginal rates alone: ``kappa = (po - pe) / (1 - pe)``.

    Reads ±1 like a correlation: 1 = redundant rules (drop one),
    ~0 = independent signals (keep both), <0 = systematic
    disagreement (one of them is probably inverted).

    ONE map-side-partial hash aggregate over the scored frame — the
    2x2 contingency table is four conditional integer sums; po and pe
    are then fixed-parenthesization doubles over exact longs (counts
    cast to DOUBLE *before* any multiply, the collocations overflow
    discipline — a1*b1 at 10^12 rows would overflow BIGINT). The
    degenerate pe=1 case (both raters constant) returns NULL kappa.

    Output: one row ``(n, n11, n10, n01, n00, po, pe, kappa)`` with
    the three doubles rounded to 6.
    """
    a = F.col(a_col).cast("long")
    b = F.col(b_col).cast("long")
    conf = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(a * b).cast("long").alias("n11"),
        F.sum(a * (1 - b)).cast("long").alias("n10"),
        F.sum((1 - a) * b).cast("long").alias("n01"),
        F.sum((1 - a) * (1 - b)).cast("long").alias("n00"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / nd
    a1 = (F.col("n11") + F.col("n10")).cast("double")
    a0 = (F.col("n01") + F.col("n00")).cast("double")
    b1 = (F.col("n11") + F.col("n01")).cast("double")
    b0 = (F.col("n10") + F.col("n00")).cast("double")
    pe = (a1 * b1 + a0 * b0) / (nd * nd)
    kappa = F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe))
    return conf.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"),
    )


def cohens_kappa_sql(scored_sql: str) -> str:
    """DuckDB replay of :func:`cohens_kappa`. ``scored_sql`` must
    select integer 0/1 columns ``a`` and ``b``. Identical contingency
    sums (HUGEINT cast back to BIGINT), identical
    cast-before-multiply parenthesization for po/pe/kappa."""
    return f"""
kscored AS ({scored_sql}),
kconf AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(a * b) AS BIGINT) AS n11,
    CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
    CAST(sum((1 - a) * b) AS BIGINT) AS n01,
    CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
  FROM kscored
)
SELECT n, n11, n10, n01, n00,
  round(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
  round((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
         + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe,
  round(CASE WHEN (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                   + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0
    THEN ((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE))
          - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
             + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
         / (1.0 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                   + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
  END, 6) AS kappa
FROM kconf
"""


def ab_test(df: DataFrame, group_col: str, metric_col: str) -> DataFrame:
    """Two-proportion z-test (the standard normal-approximation A/B
    readout) between treatment (``group_col`` = 1) and control (0)
    over a binary per-unit metric — the experiment-analysis closer
    for the engine's deterministic ``Experiment`` bucketing: rule
    rollouts are assigned by hash bucket, and this answers "did the
    new rule change the verdict rate, beyond what chance explains?".

    ONE map-side-partial hash aggregate (four conditional integer
    sums); rates, lift, the pooled standard error and z are
    fixed-parenthesization doubles over the exact longs (one sqrt —
    IEEE-deterministic on bit-identical operands). Degenerate cases
    return NULL rather than 0/0: an empty arm nulls every rate-based
    column, an all-converted or never-converted pool nulls z.

    Output: one row
    ``(n_c, n_t, x_c, x_t, p_c, p_t, lift, z)`` (doubles rounded 6).
    """
    g = F.col(group_col).cast("long")
    m = F.col(metric_col).cast("long")
    conf = df.agg(
        F.sum(1 - g).cast("long").alias("n_c"),
        F.sum(g).cast("long").alias("n_t"),
        F.sum((1 - g) * m).cast("long").alias("x_c"),
        F.sum(g * m).cast("long").alias("x_t"),
    )
    nc = F.col("n_c").cast("double")
    nt = F.col("n_t").cast("double")
    p_c = F.col("x_c").cast("double") / nc
    p_t = F.col("x_t").cast("double") / nt
    pd_ = (F.col("x_t") + F.col("x_c")).cast("double") / (
        F.col("n_t") + F.col("n_c")
    ).cast("double")
    se = F.sqrt(
        (pd_ * (F.lit(1.0) - pd_)) * (F.lit(1.0) / nt + F.lit(1.0) / nc)
    )
    both = (F.col("n_c") >= 1) & (F.col("n_t") >= 1)
    z = F.when(both & (pd_ > 0.0) & (pd_ < 1.0), (p_t - p_c) / se)
    return conf.select(
        "n_c",
        "n_t",
        "x_c",
        "x_t",
        F.round(F.when(F.col("n_c") >= 1, p_c), 6).alias("p_c"),
        F.round(F.when(F.col("n_t") >= 1, p_t), 6).alias("p_t"),
        F.round(F.when(both, p_t - p_c), 6).alias("lift"),
        F.round(z, 6).alias("z"),
    )


def ab_test_sql(scored_sql: str) -> str:
    """DuckDB replay of :func:`ab_test`. ``scored_sql`` must select
    integer 0/1 columns ``g`` (arm) and ``m`` (metric)."""
    p_c = "CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE)"
    p_t = "CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
    pd_ = "CAST(x_t + x_c AS DOUBLE) / CAST(n_t + n_c AS DOUBLE)"
    se = (
        f"sqrt(({pd_} * (1.0 - {pd_}))"
        f" * (1.0 / CAST(n_t AS DOUBLE) + 1.0 / CAST(n_c AS DOUBLE)))"
    )
    return f"""
abscored AS ({scored_sql}),
abconf AS (
  SELECT CAST(sum(1 - g) AS BIGINT) AS n_c,
    CAST(sum(g) AS BIGINT) AS n_t,
    CAST(sum((1 - g) * m) AS BIGINT) AS x_c,
    CAST(sum(g * m) AS BIGINT) AS x_t
  FROM abscored
)
SELECT n_c, n_t, x_c, x_t,
  round(CASE WHEN n_c >= 1 THEN {p_c} END, 6) AS p_c,
  round(CASE WHEN n_t >= 1 THEN {p_t} END, 6) AS p_t,
  round(CASE WHEN n_c >= 1 AND n_t >= 1 THEN {p_t} - {p_c} END, 6) AS lift,
  round(CASE WHEN n_c >= 1 AND n_t >= 1 AND {pd_} > 0.0 AND {pd_} < 1.0
        THEN ({p_t} - {p_c}) / {se} END, 6) AS z
FROM abconf
"""


def rule_prf(
    df: DataFrame, truth_col: str, rule_cols: "Sequence[str]"
) -> DataFrame:
    """Rule backtest: precision / recall / F1 of each rule column
    against a shared ground-truth column — the first report a safety
    team pulls when labeled outcomes (chargebacks, confirmed abuse,
    appeal reversals) arrive after the fact: which rules actually
    caught the bad events, and at what false-positive cost.

    ONE map-side-partial hash aggregate computes all rules'
    2x2 tables at once (4 conditional integer sums per rule over a
    single scan — not one job per rule); the 1-row result explodes to
    one row per rule. Precision/recall are single divisions of exact
    longs; F1 uses the one-division ``2tp / (2tp + fp + fn)`` form so
    no intermediate double compounds. Zero denominators (a rule that
    never fires, a truth that never occurs) yield NULL, not 0/0.

    Output: ``(rule, tp, fp, fn, tn, precision, recall, f1)``
    ordered by rule name.
    """
    if not rule_cols:
        raise ValueError("rule_prf: need at least one rule column")
    t = F.col(truth_col).cast("long")
    aggs = []
    for i, rc in enumerate(rule_cols):
        r = F.col(rc).cast("long")
        aggs += [
            F.sum(r * t).cast("long").alias(f"_tp{i}"),
            F.sum(r * (1 - t)).cast("long").alias(f"_fp{i}"),
            F.sum((1 - r) * t).cast("long").alias(f"_fn{i}"),
            F.sum((1 - r) * (1 - t)).cast("long").alias(f"_tn{i}"),
        ]
    conf = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(rc).alias("rule"),
                F.col(f"_tp{i}").alias("tp"),
                F.col(f"_fp{i}").alias("fp"),
                F.col(f"_fn{i}").alias("fn"),
                F.col(f"_tn{i}").alias("tn"),
            )
            for i, rc in enumerate(rule_cols)
        ]
    )
    ex = conf.select(F.explode(entries).alias("_e")).select("_e.*")
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = F.when(tp + fp >= 1, tp.cast("double") / (tp + fp).cast("double"))
    rec = F.when(tp + fn >= 1, tp.cast("double") / (tp + fn).cast("double"))
    f1 = F.when(
        2 * tp + fp + fn >= 1,
        (2 * tp).cast("double") / (2 * tp + fp + fn).cast("double"),
    )
    return ex.select(
        "rule",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy("rule")


def rule_prf_sql(scored_sql: str, rule_names: "Sequence[str]") -> str:
    """DuckDB replay of :func:`rule_prf`. ``scored_sql`` must select
    an integer truth column ``t`` plus one integer 0/1 column per
    entry of ``rule_names`` (same names). Same single-scan aggregate,
    same one-division metrics."""
    aggs = []
    for i, rn in enumerate(rule_names):
        aggs += [
            f"CAST(sum({rn} * t) AS BIGINT) AS tp{i}",
            f"CAST(sum({rn} * (1 - t)) AS BIGINT) AS fp{i}",
            f"CAST(sum((1 - {rn}) * t) AS BIGINT) AS fn{i}",
            f"CAST(sum((1 - {rn}) * (1 - t)) AS BIGINT) AS tn{i}",
        ]
    arms = []
    for i, rn in enumerate(rule_names):
        arms.append(
            f"SELECT '{rn}' AS rule, tp{i} AS tp, fp{i} AS fp, fn{i} AS fn,"
            f" tn{i} AS tn FROM prfconf"
        )
    union = "\nUNION ALL ".join(arms)
    return f"""
prfscored AS ({scored_sql}),
prfconf AS (SELECT {', '.join(aggs)} FROM prfscored)
SELECT rule, tp, fp, fn, tn,
  round(CASE WHEN tp + fp >= 1
        THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END, 6) AS precision,
  round(CASE WHEN tp + fn >= 1
        THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END, 6) AS recall,
  round(CASE WHEN 2 * tp + fp + fn >= 1
        THEN CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) END, 6) AS f1
FROM (
{union}
)
"""


def gini_concentration(df: DataFrame, key_col: str) -> DataFrame:
    """Gini coefficient of per-key activity concentration — the
    one-number inequality readout behind "is our traffic a broad base
    or five whales?": 0 = everyone equally active, →1 = all activity
    in one key. The skew statistic that decides salting strategy and
    flags abuse farms (a bot ring pushes the activity Lorenz curve
    toward the corner long before any single key tops a threshold).

    Exact-integer discipline via the tied-rank trick (the
    classifier_eval AUC machinery): per-key counts collapse to the
    DISTINCT-count-value frame, where a group of ``k`` keys sharing
    count ``c`` at cumulative offset ``m`` contributes exactly
    ``c·(k·m + k(k+1)/2)`` to the rank-weighted sum — all BIGINT, so
    ``G = 2·S2/(n·S) − (n+1)/n`` is two fixed divisions of exact
    integers. Shape: one key-keyed hash aggregate (map-side partials),
    one tiny distinct-value aggregate, one window over that bounded
    frame, one 1-row reduce. Long-sum headroom: S2 ≲ S·n — at
    extreme scale bucket counts first (the hist_quantiles trade).

    Output: one row ``(n_keys, total, gini)``.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).cast("long").alias("_c"))
    vals = counts.groupBy("_c").agg(F.count(F.lit(1)).cast("long").alias("_k"))
    w_cum = Window.orderBy("_c").rowsBetween(Window.unboundedPreceding, 0)
    staged = vals.select(
        "_c",
        "_k",
        (F.sum("_k").over(w_cum) - F.col("_k")).cast("long").alias("_m"),
    )
    half = F.expr("(_k * (_k + 1)) div 2")
    red = staged.agg(
        F.sum("_k").cast("long").alias("n_keys"),
        F.sum(F.col("_c") * F.col("_k")).cast("long").alias("total"),
        F.sum(F.col("_c") * (F.col("_k") * F.col("_m") + half))
        .cast("long")
        .alias("_s2"),
    )
    nd = F.col("n_keys").cast("double")
    gini = (F.lit(2.0) * F.col("_s2").cast("double")) / (
        nd * F.col("total").cast("double")
    ) - (F.col("n_keys") + 1).cast("double") / nd
    return red.select(
        "n_keys",
        "total",
        F.round(F.when(F.col("total") >= 1, gini), 6).alias("gini"),
    )


def gini_concentration_sql(table: str, key_col: str) -> str:
    """DuckDB replay of :func:`gini_concentration` — same tied-rank
    integer algebra, same two fixed divisions."""
    return f"""
gcounts AS (
  SELECT CAST(count(*) AS BIGINT) AS c FROM {table} GROUP BY {key_col}
),
gvals AS (
  SELECT c, CAST(count(*) AS BIGINT) AS k FROM gcounts GROUP BY c
),
gstaged AS (
  SELECT c, k,
    CAST(sum(k) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) - k AS BIGINT) AS m
  FROM gvals
),
gred AS (
  SELECT CAST(sum(k) AS BIGINT) AS n_keys,
    CAST(sum(c * k) AS BIGINT) AS total,
    CAST(sum(c * (k * m + (k * (k + 1)) // 2)) AS BIGINT) AS s2
  FROM gstaged
)
SELECT n_keys, total,
  round(CASE WHEN total >= 1
        THEN (2.0 * CAST(s2 AS DOUBLE)) / (CAST(n_keys AS DOUBLE) * CAST(total AS DOUBLE))
             - CAST(n_keys + 1 AS DOUBLE) / CAST(n_keys AS DOUBLE) END, 6) AS gini
FROM gred
"""


def fano_regularity(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_s: int = 3600,
    min_buckets: int = 6,
    low: float = 0.2,
    high: float = 4.0,
) -> DataFrame:
    """Fano factor (index of dispersion, variance/mean) of each key's
    per-bucket event counts — the REGULARITY screen: a Poisson-ish
    human rhythm sits near 1, a cron-driven bot that fires exactly k
    events every hour sits far BELOW 1 (too regular to be human — the
    signal rate thresholds cannot see, because its rate is modest),
    and a bursty scraper sits far above. Flags both tails.

    The zero-fill trick costs nothing: empty buckets contribute 0 to
    both Σx and Σx², so the whole statistic reads off the NONZERO
    bucket aggregate plus the span — ``n = span_buckets``,
    ``μ = S/n``, ``σ² = Q/n − μ²`` (population variance) — no dense
    grid is ever materialized. Shape: one (key, bucket) hash
    aggregate, one key aggregate (integer S, Q, bounds — map-side
    partials), fixed-parenthesization doubles.

    Output: ``(key, n_buckets, n_events, mean, fano, flag)`` for keys
    with ≥ ``min_buckets`` observed span; ``flag`` = 1 outside
    [low, high], NULL fano for the degenerate zero-mean case.
    """
    if int(bucket_s) < 1:
        raise ValueError("fano_regularity: bucket_s must be >= 1")
    if int(min_buckets) < 2:
        raise ValueError("fano_regularity: min_buckets must be >= 2")
    b = F.floor(
        F.col(ts_col).cast("timestamp").cast("double") / F.lit(float(bucket_s))
    ).cast("long")
    per = df.groupBy(F.col(key_col).alias("_k"), b.alias("_b")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    agg = per.groupBy("_k").agg(
        (F.max("_b") - F.min("_b") + 1).cast("long").alias("n_buckets"),
        F.sum("_c").cast("long").alias("n_events"),
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("_q"),
    )
    nd = F.col("n_buckets").cast("double")
    mean = F.col("n_events").cast("double") / nd
    var = F.col("_q").cast("double") / nd - mean * mean
    fano = F.when(F.col("n_events") >= 1, var / mean)
    flag = F.when(
        fano.isNotNull(),
        ((fano < F.lit(float(low))) | (fano > F.lit(float(high)))).cast("int"),
    )
    return (
        agg.filter(F.col("n_buckets") >= int(min_buckets))
        .select(
            F.col("_k").alias(key_col),
            "n_buckets",
            "n_events",
            F.round(mean, 6).alias("mean"),
            F.round(fano, 6).alias("fano"),
            flag.alias("flag"),
        )
        .orderBy(key_col)
    )


def fano_regularity_sql(
    table: str,
    key_col: str = "user_id",
    bucket_s: int = 3600,
    min_buckets: int = 6,
    low: float = 0.2,
    high: float = 4.0,
) -> str:
    """DuckDB replay of :func:`fano_regularity`."""
    bs = repr(float(bucket_s))
    mean = "CAST(n_events AS DOUBLE) / CAST(n_buckets AS DOUBLE)"
    var = f"CAST(q AS DOUBLE) / CAST(n_buckets AS DOUBLE) - ({mean}) * ({mean})"
    fano = f"({var}) / ({mean})"
    return f"""
fper AS (
  SELECT {key_col} AS k,
    CAST(floor(epoch(ts) / CAST({bs} AS DOUBLE)) AS BIGINT) AS b,
    CAST(count(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2
),
fagg AS (
  SELECT k, CAST(max(b) - min(b) + 1 AS BIGINT) AS n_buckets,
    CAST(sum(c) AS BIGINT) AS n_events,
    CAST(sum(c * c) AS BIGINT) AS q
  FROM fper GROUP BY k
)
SELECT k AS {key_col}, n_buckets, n_events,
  round({mean}, 6) AS mean,
  round(CASE WHEN n_events >= 1 THEN {fano} END, 6) AS fano,
  CASE WHEN n_events >= 1
    THEN CAST(({fano}) < {float(low)!r} OR ({fano}) > {float(high)!r} AS INT)
  END AS flag
FROM fagg WHERE n_buckets >= {int(min_buckets)}
"""


def burstiness(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    min_gaps: int = 5,
    low: float = -0.5,
    high: float = 0.5,
) -> DataFrame:
    """Goh-Barabási burstiness (EPL 2008): ``B = (σ−μ)/(σ+μ)`` over
    each key's INTER-EVENT GAPS — the timing-texture dual of the
    Fano screen (which reads per-bucket counts): B → −1 for
    metronome-periodic cron traffic, ≈ 0 for Poisson-ish human
    arrivals, → +1 for heavy-tailed human/scraper bursts. The pair
    (fano, burstiness) separates what either alone confuses: a
    slow cron and a slow human both have low rates, but the cron's
    gaps have (near-)zero variance.

    Gap extraction is ONE lag window on the key shuffle; the gap
    multiset depends only on each key's sorted timestamps, so ties
    need no tie-break (equal ts → zero gaps either way) and the
    statistic is partition-order independent: per-key moments
    (n, Σg, Σg²) are exact BIGINTs with map-side partials, then
    μ = S/n, σ = sqrt(Q/n − μ²) (population), B one fixed division;
    sqrt is IEEE-exact in both engines. Flags outside [low, high];
    B is NULL when σ+μ = 0 (a key of all-simultaneous events).

    Output: ``(key, n_gaps, mean_gap, b, flag)`` for keys with ≥
    ``min_gaps`` gaps, doubles rounded 6, ordered by key.
    """
    if int(min_gaps) < 2:
        raise ValueError("burstiness: min_gaps must be >= 2")
    sec = F.col(ts_col).cast("timestamp").cast("long")
    w = Window.partitionBy(key_col).orderBy(sec)
    g = (sec - F.lag(sec).over(w)).alias("_g")
    gaps = df.select(F.col(key_col).alias("_k"), g).filter(
        F.col("_g").isNotNull()
    )
    agg = gaps.groupBy("_k").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("_g").cast("long").alias("_s"),
        F.sum(F.col("_g") * F.col("_g")).cast("long").alias("_q"),
    )
    nd = F.col("n_gaps").cast("double")
    mu = F.col("_s").cast("double") / nd
    sigma = F.sqrt(F.col("_q").cast("double") / nd - mu * mu)
    b = F.when(sigma + mu > 0, (sigma - mu) / (sigma + mu))
    flag = F.when(
        b.isNotNull(),
        ((b < F.lit(float(low))) | (b > F.lit(float(high)))).cast("int"),
    )
    return (
        agg.filter(F.col("n_gaps") >= int(min_gaps))
        .select(
            F.col("_k").alias(key_col),
            "n_gaps",
            F.round(mu, 6).alias("mean_gap"),
            F.round(b, 6).alias("b"),
            flag.alias("flag"),
        )
        .orderBy(key_col)
    )


def burstiness_sql(
    table: str,
    key_col: str = "user_id",
    min_gaps: int = 5,
    low: float = -0.5,
    high: float = 0.5,
) -> str:
    """DuckDB replay of :func:`burstiness` — same lag window, same
    integer moments, same fixed-order algebra."""
    mu = "CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)"
    sig = f"sqrt(CAST(q AS DOUBLE) / CAST(n_gaps AS DOUBLE) - ({mu}) * ({mu}))"
    bexpr = f"(({sig}) - ({mu})) / (({sig}) + ({mu}))"
    guard = f"({sig}) + ({mu}) > 0"
    return f"""bgaps AS (
  SELECT k, g FROM (
    SELECT {key_col} AS k,
      CAST(floor(epoch(ts)) AS BIGINT)
        - lag(CAST(floor(epoch(ts)) AS BIGINT))
            OVER (PARTITION BY {key_col} ORDER BY CAST(floor(epoch(ts)) AS BIGINT)) AS g
    FROM {table}
  ) WHERE g IS NOT NULL
),
bagg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_gaps,
    CAST(sum(g) AS BIGINT) AS s, CAST(sum(g * g) AS BIGINT) AS q
  FROM bgaps GROUP BY k
)
SELECT k AS {key_col}, n_gaps,
  round({mu}, 6) AS mean_gap,
  round(CASE WHEN {guard} THEN {bexpr} END, 6) AS b,
  CASE WHEN {guard}
    THEN CAST(({bexpr}) < {float(low)!r} OR ({bexpr}) > {float(high)!r} AS INT)
  END AS flag
FROM bagg WHERE n_gaps >= {int(min_gaps)}
"""


def k_anonymity(
    df: DataFrame,
    quasi_cols: "Sequence[str]",
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over a chosen
    quasi-identifier tuple: every row whose QI equivalence class has
    fewer than ``k`` members is re-identifiable by linking — the
    privacy gate a training-data release runs before shipping, and
    the dual of the dedup question (there, big classes are the
    problem; here, SMALL ones are).

    ONE hash aggregate over the QI tuple (map-side partials), one
    tiny distinct-size rollup: output is the class-size histogram
    ``(class_size, n_classes, n_rows, violating)`` — violating = 1
    for class_size < k — from which min class size, violation counts
    and re-identification risk all read directly; no row-level
    explode, scales as a count.
    """
    if int(k) < 2:
        raise ValueError("k_anonymity: k must be >= 2")
    if not quasi_cols:
        raise ValueError("k_anonymity: quasi_cols must be non-empty")
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("_sz")
    )
    return (
        classes.groupBy(F.col("_sz").alias("class_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_classes"))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes")).cast("long").alias("n_rows"),
            (F.col("class_size") < int(k)).cast("int").alias("violating"),
        )
        .orderBy("class_size")
    )


def k_anonymity_sql(table: str, quasi_cols: "Sequence[str]", k: int = 5) -> str:
    """DuckDB replay of :func:`k_anonymity`."""
    qi = ", ".join(quasi_cols)
    return f"""kacls AS (
  SELECT CAST(count(*) AS BIGINT) AS sz FROM {table} GROUP BY {qi}
)
SELECT sz AS class_size, CAST(count(*) AS BIGINT) AS n_classes,
  CAST(sz * count(*) AS BIGINT) AS n_rows,
  CAST(sz < {int(k)} AS INT) AS violating
FROM kacls GROUP BY sz ORDER BY sz
"""


def did_lift(
    scored: DataFrame,
    group_col: str = "g",
    period_col: str = "p",
    metric_col: str = "m",
) -> DataFrame:
    """Difference-in-differences (Card & Krueger 1994 lineage): the
    causal-reading companion to :func:`ab_test` when assignment is
    NOT randomized — compare the treated group's pre→post change
    against the control group's, so any time trend common to both
    cancels: ``DiD = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre)``.
    The 'did the rule change actually move the metric, or did
    everything drift together?' readout.

    Inputs: one row per unit with integer/0-1 ``metric_col``, a 0/1
    ``group_col`` (1 = treated) and a 0/1 ``period_col`` (1 = post).
    ONE hash-free global aggregate produces all four cells' exact
    integer (n, Σm) pairs via conditional sums (map-side partials);
    the estimate and its binomial-variance z are fixed
    parenthesizations of those integers. Output: one row with the
    four cell means, ``did``, and ``z`` (NULL when any cell is
    empty), doubles rounded 6.
    """
    g = F.col(group_col).cast("long")
    p = F.col(period_col).cast("long")
    m = F.col(metric_col).cast("long")
    cells = scored.agg(
        *[
            c
            for gi, pi, tag in [
                (1, 0, "tp"),  # treated pre
                (1, 1, "tq"),  # treated post
                (0, 0, "cp"),  # control pre
                (0, 1, "cq"),  # control post
            ]
            for c in (
                F.sum(
                    (g.eqNullSafe(F.lit(gi)) & p.eqNullSafe(F.lit(pi))).cast(
                        "long"
                    )
                )
                .cast("long")
                .alias(f"n_{tag}"),
                F.sum(
                    F.when(
                        g.eqNullSafe(F.lit(gi)) & p.eqNullSafe(F.lit(pi)), m
                    ).otherwise(F.lit(0))
                )
                .cast("long")
                .alias(f"s_{tag}"),
            )
        ]
    )

    def mean(tag: str):
        # per-cell guard, not just the outer `ok` gate: ANSI mode
        # evaluates the division inside the z column's `se > 0`
        # CONDITION before the gate can mask it
        return F.when(
            F.col(f"n_{tag}") >= 1,
            F.col(f"s_{tag}").cast("double") / F.col(f"n_{tag}").cast("double"),
        )

    def var(tag: str):
        mu = mean(tag)
        return mu * (F.lit(1.0) - mu) / F.col(f"n_{tag}").cast("double")

    did = (mean("tq") - mean("tp")) - (mean("cq") - mean("cp"))
    se = F.sqrt(var("tq") + var("tp") + var("cq") + var("cp"))
    ok = (
        (F.col("n_tp") >= 1)
        & (F.col("n_tq") >= 1)
        & (F.col("n_cp") >= 1)
        & (F.col("n_cq") >= 1)
    )
    return cells.select(
        "n_tp",
        "n_tq",
        "n_cp",
        "n_cq",
        F.round(F.when(ok, mean("tp")), 6).alias("mean_t_pre"),
        F.round(F.when(ok, mean("tq")), 6).alias("mean_t_post"),
        F.round(F.when(ok, mean("cp")), 6).alias("mean_c_pre"),
        F.round(F.when(ok, mean("cq")), 6).alias("mean_c_post"),
        F.round(F.when(ok, did), 6).alias("did"),
        F.round(F.when(ok & (se > 0), did / se), 6).alias("z"),
    )


def did_lift_sql(scored_sql: str) -> str:
    """DuckDB replay of :func:`did_lift` over a (g, p, m) SELECT —
    same four integer cells, same fixed-order algebra."""
    cells = []
    for gi, pi, tag in [(1, 0, "tp"), (1, 1, "tq"), (0, 0, "cp"), (0, 1, "cq")]:
        cells.append(
            f"CAST(sum(CASE WHEN g = {gi} AND p = {pi} THEN 1 ELSE 0 END) AS BIGINT) AS n_{tag}"
        )
        cells.append(
            f"CAST(sum(CASE WHEN g = {gi} AND p = {pi} THEN m ELSE 0 END) AS BIGINT) AS s_{tag}"
        )
    mean = lambda t: f"(CAST(s_{t} AS DOUBLE) / CAST(n_{t} AS DOUBLE))"  # noqa: E731
    var = (
        lambda t: f"({mean(t)} * (1.0 - {mean(t)}) / CAST(n_{t} AS DOUBLE))"
    )  # noqa: E731
    did = f"(({mean('tq')} - {mean('tp')}) - ({mean('cq')} - {mean('cp')}))"
    se = f"sqrt({var('tq')} + {var('tp')} + {var('cq')} + {var('cp')})"
    ok = "n_tp >= 1 AND n_tq >= 1 AND n_cp >= 1 AND n_cq >= 1"
    return f"""didscored AS ({scored_sql}),
didcells AS (SELECT {', '.join(cells)} FROM didscored)
SELECT n_tp, n_tq, n_cp, n_cq,
  round(CASE WHEN {ok} THEN {mean('tp')} END, 6) AS mean_t_pre,
  round(CASE WHEN {ok} THEN {mean('tq')} END, 6) AS mean_t_post,
  round(CASE WHEN {ok} THEN {mean('cp')} END, 6) AS mean_c_pre,
  round(CASE WHEN {ok} THEN {mean('cq')} END, 6) AS mean_c_post,
  round(CASE WHEN {ok} THEN {did} END, 6) AS did,
  round(CASE WHEN {ok} AND {se} > 0 THEN {did} / {se} END, 6) AS z
FROM didcells"""


def rolling_active(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Rolling DAU/WAU — distinct active keys per day and per
    trailing ``window_days`` window, EXACT (no HLL): the engagement
    curve every product review opens with, and the denominator
    behind 'what fraction of this week's actives fired a rule?'.

    The exact-rolling-distinct trick: a sliding distinct cannot be
    composed from per-day distincts (users overlap), but each
    (key, active-day) pair SUPPORTS exactly ``window_days`` window
    ends — so explode the distinct user-day frame by the windows it
    feeds, distinct again on (window_end, key), and count. Work =
    window_days × |distinct user-days| with hash aggregates all the
    way down (map-side partials), never a quadratic self-join, and
    fully streaming-shardable by key. Trailing windows whose end-day
    has no activity still appear if ANY of their days had activity.

    Output per day: ``(day, dau, rolling_active)`` — dau for days
    with direct activity (0 if the day only closes a window), day as
    epoch days.
    """
    if int(window_days) < 1:
        raise ValueError("rolling_active: window_days must be >= 1")
    day = F.expr(
        f"CAST(CAST({ts_col} AS TIMESTAMP) AS LONG) DIV 86400"
    ).cast("long")
    ud = df.select(
        F.col(key_col).alias("_k"), day.alias("_d")
    ).distinct()
    dau = ud.groupBy("_d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    spread = ud.select(
        "_k",
        F.explode(
            F.sequence(
                F.col("_d"), F.col("_d") + F.lit(int(window_days) - 1)
            )
        ).alias("_w"),
    ).distinct()
    # clip windows that extend past the observed span (their end-day
    # is in the future); the 1-row max-day frame is the decay_score
    # broadcast class
    mx = ud.agg(F.max("_d").alias("_mx"))
    wau = (
        spread.join(F.broadcast(mx))
        .filter(F.col("_w") <= F.col("_mx"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).cast("long").alias("rolling_active"))
    )
    return (
        wau.join(dau.select(F.col("_d").alias("_w"), "dau"), "_w", "left")
        .select(
            F.col("_w").alias("day"),
            F.coalesce(F.col("dau"), F.lit(0)).cast("long").alias("dau"),
            "rolling_active",
        )
        .orderBy("day")
    )


def rolling_active_sql(
    table: str, key_col: str = "user_id", window_days: int = 7
) -> str:
    """DuckDB replay of :func:`rolling_active` — same user-day
    explode, same window clip."""
    w = int(window_days)
    return f"""raud AS (
  SELECT DISTINCT {key_col} AS k,
    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
  FROM {table}
),
radau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM raud GROUP BY d),
raspread AS (
  SELECT DISTINCT k, d + g.x AS w
  FROM raud, (SELECT unnest(range(0, {w})) AS x) g
),
ramax AS (SELECT CAST(max(d) AS BIGINT) AS mx FROM raud),
rawau AS (
  SELECT w, CAST(count(*) AS BIGINT) AS rolling_active
  FROM raspread, ramax WHERE w <= mx GROUP BY w
)
SELECT r.w AS day, CAST(coalesce(d2.dau, 0) AS BIGINT) AS dau,
  r.rolling_active
FROM rawau r LEFT JOIN radau d2 ON r.w = d2.d
ORDER BY day"""

"""The transcripts ("turns") input table.

BASELINE.json input_hint: ``(conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp)``. For oracle-checked
correctness we derive a deterministic turns view from the driver's
``events`` table with SQL that runs identically on Spark and DuckDB;
for streaming/bench we also generate a standalone skewed turns table
(Zipf-hot conversations — FIXTURES.md §1).

Trigger phrases are planted at known rows (event_id % 7 → 'hello',
% 11 → spam URL, % 13 → email) so rule fixtures have known positives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compiler.compile import InputBindings

# Bindings for rulesets over the transcripts table: simple $.field
# JsonData paths bind to the typed turn columns directly (the JSON
# envelope is kept for non-simple paths but pruned when unused).
TURN_BINDINGS = InputBindings(
    data_fields={c: c for c in ("conv_id", "turn_idx", "role", "text", "tool")}
)

# Runs verbatim under Spark SQL *and* DuckDB (common dialect subset).
TURNS_FROM_EVENTS_SQL = """
SELECT
  concat('conv_', user_id) AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
  CASE WHEN event_type IN ('click', 'view') THEN 'user'
       WHEN event_type = 'purchase' THEN 'assistant'
       WHEN event_type = 'signup' THEN 'system'
       ELSE 'tool' END AS role,
  concat('msg ', event_type,
         CASE WHEN event_id % 7 = 0 THEN ' hello world' ELSE '' END,
         CASE WHEN event_id % 11 = 0 THEN ' see https://spam.example.com/x' ELSE '' END,
         CASE WHEN event_id % 13 = 0 THEN ' contact alice@evil.test' ELSE '' END,
         ' n=', event_id % 100) AS text,
  CASE WHEN event_type = 'error' THEN concat('tool_', user_id % 5) ELSE NULL END AS tool,
  ts,
  event_id,
  user_id,
  event_type,
  value
FROM {events}
"""


def turns_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic turns view over the driver's events parquet."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("_events_src")
    return spark.sql(TURNS_FROM_EVENTS_SQL.format(events="_events_src"))


def with_envelope(turns: DataFrame) -> DataFrame:
    """Add the osprey Action envelope columns the compiled rulesets
    bind to (ref: engine/executor/execution_context.py:296-332):
    ``action_name`` (the role), ``data`` (JSON of the turn), and a
    deterministic ``action_id`` from (conv_id, turn_idx)
    (FIXTURES.md §2)."""
    return turns.withColumns(
        {
            "action_name": F.col("role"),
            "data": F.to_json(F.struct("conv_id", "turn_idx", "role", "text", "tool")),
            "action_id": F.xxhash64(F.col("conv_id"), F.col("turn_idx")),
        }
    )


def generate_turns(
    spark: SparkSession,
    n_convs: int = 2000,
    turns_per_conv: int = 30,
    hot_convs: int = 10,
    hot_multiplier: int = 50,
    seed: int = 42,
    late_fraction: float = 0.02,
    text_repeat: int = 1,
) -> DataFrame:
    """Standalone deterministic skewed transcripts generator.

    Distributed generation via ``spark.range`` (no driver-side loops):
    conversation sizes are Zipf-ish — the first ``hot_convs``
    conversations get ``hot_multiplier``× the turns, exercising the
    skew/salting path the north rule requires. A ``late_fraction`` of
    turns get a timestamp pulled back (late-data for watermark tests).
    """
    base = n_convs * turns_per_conv
    hot_extra = hot_convs * turns_per_conv * (hot_multiplier - 1)
    total = base + hot_extra

    df = spark.range(0, total, 1, numPartitions=max(32, total // 250_000))
    # rows [0, base) spread over all convs; rows [base, total) go to hot convs
    conv = F.when(
        F.col("id") < base, (F.col("id") / turns_per_conv).cast("long")
    ).otherwise(((F.col("id") - base) / (turns_per_conv * (hot_multiplier - 1))).cast("long"))
    # deterministic pseudo-random stream from xxhash64 of (seed, id)
    h = F.abs(F.xxhash64(F.lit(seed), F.col("id")))
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    tools = F.array(F.lit("search"), F.lit("exec"), F.lit("browse"), F.lit("fetch"), F.lit("calc"))
    role = F.element_at(roles, (h % 4 + 1).cast("int"))
    words = F.array(
        *[F.lit(w) for w in ("alpha bravo charlie delta echo foxtrot golf hotel india juliet").split()]
    )
    # text_repeat > 1 pads with deterministic word pairs — dialog-length
    # text so regex/tokenize features do realistic per-row work
    pad = [
        part
        for i in range(1, text_repeat)
        for part in (
            F.lit(" "),
            F.element_at(words, (F.pmod(h / (10 * i), F.lit(10)).cast("int") + 1)),
            F.lit(" "),
            F.element_at(words, (F.pmod(h / (7 * i), F.lit(10)).cast("int") + 1)),
        )
    ]
    text = F.concat(
        F.lit("turn "),
        F.element_at(words, (h % 10 + 1).cast("int")),
        F.lit(" "),
        F.element_at(words, (F.pmod(h / 10, F.lit(10)).cast("int") + 1)),
        *pad,
        F.when(h % 7 == 0, F.lit(" hello world")).otherwise(F.lit("")),
        F.when(h % 11 == 0, F.lit(" see https://spam.example.com/x")).otherwise(F.lit("")),
        F.when(h % 13 == 0, F.lit(" reach me at test@evil.example or +1 555 123 4567")).otherwise(F.lit("")),
        F.when(h % 17 == 0, F.lit(" FREE MONEY crypto giveaway https://bit.ly/x")).otherwise(F.lit("")),
        F.lit(" n="),
        (h % 100).cast("string"),
    )
    # monotone ts per conversation with jitter; a fraction arrive late
    turn_in_conv = F.when(F.col("id") < base, F.col("id") % turns_per_conv).otherwise(
        # hot conversations continue past their base turns — no dup turn_idx
        F.lit(turns_per_conv) + (F.col("id") - base) % (turns_per_conv * (hot_multiplier - 1))
    )
    base_epoch = F.lit(1704067200)  # 2024-01-01 UTC
    ts_sec = base_epoch + conv % 86400 + turn_in_conv * 60 + (h % 30)
    ts_sec = F.when(h % F.lit(int(1 / max(late_fraction, 1e-9))) == 0, ts_sec - 3600).otherwise(ts_sec)
    return df.select(
        F.concat(F.lit("conv_"), F.lpad(conv.cast("string"), 8, "0")).alias("conv_id"),
        turn_in_conv.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(role == "tool", F.element_at(tools, (h % 5 + 1).cast("int"))).otherwise(F.lit(None)).alias("tool"),
        F.timestamp_seconds(ts_sec).alias("ts"),
    )

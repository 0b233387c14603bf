"""Input sources for the transcripts table (batch + streaming).

The reference ingests from PubSub/Kafka (ref:
osprey_worker/src/osprey/worker/sinks/sink/input_stream.py) with the
action payload as JSON; file-based corpora arrive as parquet, JSONL or
CSV in practice. One schema-enforced entry point covers all three for
both batch and Structured Streaming reads — the schema is always
EXPLICIT (streaming requires it, and batch inference would let a
malformed corpus silently widen int32 turn_idx or stringly-type ts).

Kafka stays in streaming/kafka.py (connector options + envelope
decode); Iceberg is the documented swap at the table-format layer
(streaming/sink.py TableFormat contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# BASELINE.json input_hint, verbatim.
TURNS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

_FORMATS = ("parquet", "json", "csv")

# CSV has no native null/timestamp story — pin both so a round-trip
# through write_turns/read_turns is lossless for the turns schema:
# NULL serializes as \N, the EMPTY STRING as a quoted "" (an unquoted
# empty field is indistinguishable from NULL to the parser), newlines
# survive via multiLine + a sane escape char.
_CSV_COMMON = {
    "header": "true",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "nullValue": "\\N",
    "escape": '"',
}
_CSV_READ = {**_CSV_COMMON, "emptyValue": "", "multiLine": "true"}
_CSV_WRITE = {**_CSV_COMMON, "emptyValue": '""'}


def read_turns(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    streaming: bool = False,
    schema: str = TURNS_SCHEMA,
    **options: str,
) -> DataFrame:
    """Read a turns table from ``path`` as parquet, JSONL (``json``)
    or CSV, batch or streaming, schema enforced."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported turns format {fmt!r}; one of {_FORMATS}")
    reader = (spark.readStream if streaming else spark.read).schema(schema)
    opts = dict(_CSV_READ) if fmt == "csv" else {}
    opts.update(options)
    return getattr(reader.options(**opts), fmt)(path)


def write_turns(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "error") -> None:
    """Write a turns frame in a format ``read_turns`` round-trips
    losslessly (test-fixture / export helper)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported turns format {fmt!r}; one of {_FORMATS}")
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.options(**_CSV_WRITE)
    getattr(writer, fmt)(path)

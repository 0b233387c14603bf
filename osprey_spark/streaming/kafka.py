"""Kafka-shaped source/sink for the streaming rule engine.

ref: worker/sinks/sink/input_stream.py:413-444 (KafkaInputStream —
consume, decode JSON Action) and worker/sinks/sink/
kafka_output_sink.py:12-35 (KafkaOutputSink — extracted-features JSON
to a topic).

The container ships no spark-sql-kafka jars, so `.load()`/`.save()`
raise DATA_SOURCE_NOT_FOUND here; everything up to that call — reader
options, JSON envelope decode, the (key, value) produce frame — is
real Spark plan code and unit-tested against static DataFrames. On a
cluster with the connector on the classpath these paths run as-is.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: Optional[int] = None,
    extra: Optional[dict] = None,
) -> dict:
    """Reader options for readStream.format('kafka').
    ``maxOffsetsPerTrigger`` plays the same admission-control role
    maxFilesPerTrigger does for file sources (bounded micro-batches)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # never silently skip data after retention-expiry at scale
        "failOnDataLoss": "true",
    }
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(int(max_offsets_per_trigger))
    opts.update(extra or {})
    return opts


def decode_kafka_turns(raw: DataFrame, schema: T.StructType) -> DataFrame:
    """Kafka records -> typed turn rows: the JSON ``value`` decodes
    against the turns schema JVM-side (from_json, no Python). Rows
    whose value fails to parse keep NULL fields rather than killing
    the batch (the reference logs-and-continues on decode errors,
    input_stream.py:436-443)."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("_t"),
        F.col("timestamp").alias("_kafka_ingest_ts"),
    ).select("_t.*", "_kafka_ingest_ts")


def kafka_reader(
    spark: SparkSession, schema: T.StructType, options: dict, fmt: str = "kafka"
) -> DataFrame:
    """readStream.format('kafka') -> decoded turns. Raises
    DATA_SOURCE_NOT_FOUND without the connector jars; pass
    ``fmt="kafka_file"`` (streaming.kafka_file, registered via
    ``register_kafka_file``) to execute the identical plan against the
    file-backed wire-compatible source — the decode stage and
    everything downstream are the same Column objects either way."""
    raw = spark.readStream.format(fmt).options(**options).load()
    return decode_kafka_turns(raw, schema)


def kafka_produce_frame(df: DataFrame, key_col: Optional[str] = "conv_id") -> DataFrame:
    """Results -> Kafka produce records: value = full-row JSON (the
    reference sends extracted_features_json), key = partition key so
    a conversation's verdicts stay ordered within a topic partition."""
    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if key_col and key_col in df.columns:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


class KafkaSink:
    """foreachBatch target that produces each micro-batch to a topic
    (ref: kafka_output_sink.py:12-35). At-least-once: Kafka has no
    batch-id overwrite, so replayed batches re-produce — consumers
    dedup on (conv_id, turn_idx) or an action id, which the value JSON
    carries. Use inside MultiSink alongside the exactly-once parquet
    tables when both delivery modes are needed."""

    def __init__(
        self,
        bootstrap_servers: str,
        topic: str,
        key_col: Optional[str] = "conv_id",
        fmt: str = "kafka",
        extra_options: Optional[dict] = None,
    ):
        self.options = {
            "kafka.bootstrap.servers": bootstrap_servers,
            "topic": topic,
        }
        self.options.update(extra_options or {})
        self.key_col = key_col
        self.fmt = fmt

    def write_data(self, df: DataFrame, batch_id: int) -> dict:
        out = kafka_produce_frame(df, self.key_col)
        out.write.mode("append").format(self.fmt).options(**self.options).save()
        return {"rows": None, "topic": self.options["topic"]}

    # foreachBatch-compatible
    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        self.write_data(df, batch_id)

"""Exactly-once idempotent sink.

The reference's stored-execution-results sink writes each result by
action_id to BigTable/MinIO (at-least-once + ack,
ref: worker/sinks/sink/stored_execution_result_output_sink.py:6-22).
Here: ``foreachBatch`` + a batch-id commit log. Replayed batch ids
(crash between write and checkpoint commit) overwrite their own
output partition, so the sink converges to exactly-once output.

Layout (Iceberg-shaped: data + commit metadata; swap `_write_batch`
for an Iceberg `MERGE INTO`/snapshot append when the runtime has the
jars — the container here has none, documented divergence):

    <root>/data/_batch_id=N/part-*.parquet   (+ user partition cols)
    <root>/_commits/N.json                   commit marker + lineage

Readers take only committed batches: ``read_committed``.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ExactlyOnceParquetSink:
    def __init__(
        self,
        root: str,
        partition_by: Sequence[str] = (),
        n_buckets: int = 32,
        bucket_col: Optional[str] = "conv_id",
        repartition_buckets: bool = True,
        salt_span: Optional[int] = None,
        salt_col: str = "turn_idx",
    ):
        """``partition_by`` are user partition columns *in addition to*
        the batch-id partition. With ``bucket_col`` set, a
        ``_bucket = pmod(xxhash64(bucket_col), n_buckets)`` partition
        column spreads hot keys (north rule: hash(conv_id) × ts-hour
        partitioning with salting).

        ``repartition_buckets=False`` skips the pre-write shuffle: use
        it when the *input* table is already clustered by
        ``xxhash64(bucket_col) % K`` with K a multiple of n_buckets
        (co-partitioned source and sink — each map task then holds a
        few whole buckets and the write stays narrow, the layout a
        bucketed Iceberg table gives for free at cluster scale).

        ``salt_span`` enables explicit hot-key salting (north rule):
        the bucket becomes ``pmod(xxhash64(bucket_col) +
        floor(salt_col / salt_span), n_buckets)``, so a conversation
        longer than salt_span turns spreads deterministically across
        consecutive buckets while short conversations keep exactly one
        bucket. Readers recover a conversation by scanning its
        ⌈len/span⌉ buckets — bounded fan-out, no hot partition."""
        self.root = root
        self.partition_by = list(partition_by)
        self.n_buckets = n_buckets
        self.bucket_col = bucket_col
        self.repartition_buckets = repartition_buckets
        self.salt_span = salt_span
        self.salt_col = salt_col
        os.makedirs(self._commits_dir, exist_ok=True)

    @property
    def _commits_dir(self) -> str:
        return os.path.join(self.root, "_commits")

    @property
    def data_dir(self) -> str:
        return os.path.join(self.root, "data")

    def _commit_path(self, batch_id: int) -> str:
        return os.path.join(self._commits_dir, f"{batch_id}.json")

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._commit_path(batch_id))

    def committed_batches(self) -> list[int]:
        out = []
        for f in os.listdir(self._commits_dir):
            if f.endswith(".json"):
                out.append(int(f[:-5]))
        return sorted(out)

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """foreachBatch body. Idempotent: a replayed batch id
        overwrites exactly its own `_batch_id=N` partition (no
        cross-batch clobber), then re-marks the commit."""
        from pyspark.sql import Observation

        t0 = time.time()
        obs = Observation()
        out = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        parts = list(self.partition_by)
        if self.bucket_col and self.bucket_col in df.columns:
            bucket = F.xxhash64(F.col(self.bucket_col))
            if self.salt_span and self.salt_col in df.columns:
                bucket = bucket + F.floor(F.col(self.salt_col) / F.lit(self.salt_span))
            out = out.withColumn("_bucket", F.pmod(bucket, F.lit(self.n_buckets)))
            parts.append("_bucket")
            if self.repartition_buckets:
                # co-locate each bucket in one task: B output files per
                # batch instead of tasks × B tiny files
                out = out.repartition(self.n_buckets, F.col("_bucket"))
        # static overwrite scoped to this batch's partition directory:
        # write to data/_batch_id=N with overwrite semantics.
        batch_dir = os.path.join(self.data_dir, f"_batch_id={int(batch_id)}")
        writer = out.write.mode("overwrite")
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(batch_dir)
        # row count observed during the single write pass
        n_rows = obs.get["rows"]
        commit = {
            "batch_id": int(batch_id),
            "rows": n_rows,
            "committed_at_unix": time.time(),
            "duration_s": round(time.time() - t0, 3),
            "writer": str(uuid.uuid4()),
            "partition_columns": parts,
        }
        tmp = self._commit_path(batch_id) + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(commit, f)
        os.replace(tmp, self._commit_path(batch_id))

    def read_committed(self, spark: SparkSession) -> DataFrame:
        """Union of committed batch partitions only (uncommitted data
        files from a crashed writer are invisible)."""
        batches = self.committed_batches()
        if not batches:
            raise FileNotFoundError(f"no committed batches under {self.root}")
        paths = [os.path.join(self.data_dir, f"_batch_id={b}") for b in batches]
        return spark.read.option("basePath", self.data_dir).parquet(*paths)

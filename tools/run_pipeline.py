"""Production entry point: run the streaming rule engine via spark-submit.

The reference deploys its engine as a long-lived worker service wired
to a coordinator (ref: worker/main.py); the Spark-native deployment
shape is one Structured Streaming job per ruleset:

    spark-submit --master <cluster> --py-files dist/osprey_spark.zip \
        tools/run_pipeline.py \
        --rules rules_dir/ --input /data/turns_stream --output /data/verdicts \
        --trigger "10 seconds" --tee --metrics /var/log/osprey_metrics.jsonl

``--rules`` is a directory of ``*.sml`` files with the reference's
``main.sml`` entry convention; the whole tree is compiled once on the
driver and the job runs until terminated (or to completion with
``--trigger availableNow``). Restarting the same command resumes from
the checkpoint: the exactly-once sink's commit log makes replayed
micro-batches idempotent, so a crash mid-batch never duplicates
output. Per-batch metrics (rows, state size, watermark lag) append to
``--metrics`` as JSON lines via the StreamingQueryListener.

Everything here is a thin argparse shell over
``osprey_spark.streaming.pipeline.StreamingRuleEngine`` — the same
object the tests and bench drive — so the CLI surface cannot drift
from the tested engine.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def load_rules(rules_dir: str) -> dict[str, str]:
    """Read a rule-source tree: every ``*.sml`` under ``rules_dir``,
    keyed by its path relative to the dir (the compiler's Import paths
    resolve against these keys)."""
    sources: dict[str, str] = {}
    for root, _dirs, files in os.walk(rules_dir):
        for f in sorted(files):
            if f.endswith(".sml"):
                full = os.path.join(root, f)
                rel = os.path.relpath(full, rules_dir)
                with open(full, encoding="utf-8") as fh:
                    sources[rel] = fh.read()
    if not sources:
        raise SystemExit(f"no .sml files under {rules_dir}")
    return sources


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--rules", required=True, help="directory of .sml files (entry main.sml)")
    ap.add_argument("--entry", default="main.sml", help="entry file key within --rules")
    ap.add_argument("--input", required=True, help="streaming source dir (parquet) or kafka")
    ap.add_argument("--output", required=True, help="sink root (tables + commit log)")
    ap.add_argument("--checkpoint", default=None, help="default <output>/_checkpoint")
    ap.add_argument(
        "--trigger",
        default="availableNow",
        help='"availableNow" (drain + exit) or a processing-time interval like "10 seconds"',
    )
    ap.add_argument(
        "--source-format",
        default="parquet",
        choices=["parquet", "json", "csv", "kafka"],
        dest="source_format",
    )
    ap.add_argument(
        "--source-option",
        action="append",
        default=[],
        metavar="K=V",
        help="reader option (repeatable); kafka needs kafka.bootstrap.servers + subscribe",
    )
    ap.add_argument(
        "--tee",
        action="store_true",
        help="standard fan-out: results table + label-effect changelog under one commit log",
    )
    ap.add_argument(
        "--sample",
        default=None,
        help='per-action-name sampling config JSON, e.g. {"user": 50, "tool": 0}',
    )
    ap.add_argument("--labels", default=None, help="parquet path of a label snapshot for HasLabel")
    ap.add_argument(
        "--dedup-ids",
        default=None,
        help="comma-separated natural-key columns for ingest dedup (at-least-once upstreams)",
    )
    ap.add_argument(
        "--dedup-watermark", default="10 minutes", help="watermark horizon for ingest dedup"
    )
    ap.add_argument(
        "--passthrough",
        default="conv_id,turn_idx,ts",
        help="source columns copied to the output beside extracted features",
    )
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--buckets", type=int, default=32, help="sink hash(conv_id) bucket count")
    ap.add_argument(
        "--no-repartition",
        action="store_true",
        help="source already clustered by hash(conv_id) buckets (bucketed Iceberg layout) — skip the sink exchange",
    )
    ap.add_argument(
        "--partition-hour",
        action="store_true",
        help="also partition the sink by the event-time hour (ts_hour=yyyy-MM-dd-HH dirs) — time-range reads prune at the directory level; needs ts in --passthrough",
    )
    ap.add_argument(
        "--salt-span",
        type=int,
        default=None,
        help="spread each bucket over this many salted writers (hot-conversation skew)",
    )
    ap.add_argument("--metrics", default=None, help="append per-batch JSON metrics here")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument(
        "--explain",
        action="store_true",
        help="compile the rules, print the streaming plan (explain formatted), exit without starting",
    )
    return ap


def run(args: argparse.Namespace, spark=None):
    """Build and start the engine; returns the StreamingQuery (caller
    owns awaitTermination). Passing ``spark`` reuses an existing
    session (tests); otherwise the spark-submit-provided session is
    materialized here."""
    if spark is None:
        from pyspark.sql import SparkSession

        b = SparkSession.builder.appName("osprey_spark_pipeline")
        if args.shuffle_partitions:
            b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        spark = b.getOrCreate()

    # Session must exist before any Column is built (Spark 4), so the
    # imports that construct expressions happen after getOrCreate.
    from osprey_spark.compiler import compile_ruleset
    from osprey_spark.streaming.pipeline import StreamingRuleEngine, verdict_label_tee
    from osprey_spark.turns import TURN_BINDINGS

    ruleset = compile_ruleset(load_rules(args.rules), entry=args.entry, bindings=TURN_BINDINGS)

    if args.metrics:
        from osprey_spark.streaming.metrics import JsonMetricsListener

        spark.streams.addListener(JsonMetricsListener(args.metrics))

    labels_df = spark.read.parquet(args.labels) if args.labels else None
    engine = StreamingRuleEngine(
        spark,
        ruleset,
        input_dir=args.input,
        output_dir=args.output,
        checkpoint_dir=args.checkpoint,
        passthrough=tuple(c for c in args.passthrough.split(",") if c),
        max_files_per_trigger=args.max_files_per_trigger,
        n_buckets=args.buckets,
        repartition_buckets=not args.no_repartition,
        salt_span=args.salt_span,
        tee=verdict_label_tee(args.buckets) if args.tee else None,
        source_format=args.source_format,
        source_options=dict(kv.split("=", 1) for kv in args.source_option),
        sample_config=json.loads(args.sample) if args.sample else None,
        labels_df=labels_df,
        dedup_ids=tuple(args.dedup_ids.split(",")) if args.dedup_ids else None,
        dedup_watermark=args.dedup_watermark,
        partition_hour=args.partition_hour,
    )
    if getattr(args, "explain", False):
        engine.transform(engine.source()).explain("formatted")
        return None
    if args.trigger == "availableNow":
        return engine.start(available_now=True)
    return engine.start(available_now=False, processing_time=args.trigger)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    q = run(args)
    if q is not None:
        q.awaitTermination()


if __name__ == "__main__":
    sys.exit(main())

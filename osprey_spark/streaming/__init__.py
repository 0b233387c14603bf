"""Structured Streaming layer.

Replaces the reference's coordinator/worker serving topology
(ref: osprey_coordinator/src/main.rs, worker/sinks/sink/rules_sink.py)
with Spark micro-batches: the coordinator's Kafka consume + hash-ring
routing + ack/nack becomes readStream + checkpointed offsets
(exactly-once instead of at-least-once), and per-event execution
becomes whole-batch columnar evaluation of the compiled ruleset.
"""

from .pipeline import StreamingRuleEngine  # noqa: F401
from .sink import ExactlyOnceParquetSink  # noqa: F401

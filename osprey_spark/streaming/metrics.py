"""Streaming observability: rows processed, state size, watermark lag.

North-rule requirement: "resumable from checkpoint with per-partition
lineage and metrics". Batch lineage lives in the sink commit log;
query-level metrics come from a StreamingQueryListener writing JSON
lines.
"""

from __future__ import annotations

import json
import os
import threading
import time

from pyspark.sql.streaming import StreamingQueryListener


def _lag_ms(ev_max, watermark):
    """Watermark lag: max observed event time minus current watermark
    (how far behind the frontier the watermark trails), in ms."""
    if not ev_max or not watermark:
        return None
    from datetime import datetime

    fmt = "%Y-%m-%dT%H:%M:%S.%fZ"
    try:
        return int(
            (datetime.strptime(ev_max, fmt) - datetime.strptime(watermark, fmt)).total_seconds()
            * 1000
        )
    except ValueError:
        return None


class JsonMetricsListener(StreamingQueryListener):
    """Appends one JSON line per micro-batch progress event."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def onQueryStarted(self, event):
        self._emit({"event": "started", "id": str(event.id), "ts": time.time()})

    def onQueryProgress(self, event):
        p = event.progress
        state_rows = 0
        state_bytes = 0
        for so in p.stateOperators or []:
            state_rows += so.numRowsTotal or 0
            state_bytes += so.memoryUsedBytes or 0
        et = p.eventTime or {}
        rec = {
            "event": "progress",
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "batch_duration_ms": (p.durationMs or {}).get("triggerExecution"),
            "state_rows": state_rows,
            "state_bytes": state_bytes,
            "watermark": et.get("watermark"),
            "event_time_max": et.get("max"),
            "watermark_lag_ms": _lag_ms(et.get("max"), et.get("watermark")),
            "ts": time.time(),
        }
        # observe() metrics (e.g. the dq ingest-quality counters) —
        # one named Row per observation point
        try:
            observed = p.observedMetrics or {}
        except Exception:  # pragma: no cover - older event shapes
            observed = {}
        if observed:
            rec["observed"] = {
                name: row.asDict() for name, row in observed.items()
            }
        self._emit(rec)

    def onQueryTerminated(self, event):
        self._emit({"event": "terminated", "id": str(event.id), "ts": time.time()})

    def onQueryIdle(self, event):
        pass

    def _emit(self, rec: dict):
        with self._lock:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")


def read_metrics(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]

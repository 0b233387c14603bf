"""osprey_spark — a PySpark-native streaming rules/CEP engine.

A from-scratch rebuild of the *capabilities* of roostorg/osprey (the
event-stream decisions engine; see /root/reference) on Apache Spark:

- SML rule programs (a restricted Python subset) compile to Spark SQL
  ``Column`` expression trees — not a per-row interpreter.
- Feature extraction, verdicts and label effects are evaluated per
  micro-batch with Structured Streaming; per-entity/per-conversation
  state lives in the Spark state store.
- Analytics (TopN, timeseries, scan, approx-distinct) are plain Spark
  SQL over the sink table, filtered by the same SML expression syntax.

Reference parity citations in docstrings use ``ref:`` + path relative
to /root/reference.
"""

__version__ = "0.1.0"

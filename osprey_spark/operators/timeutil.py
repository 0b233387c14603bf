"""Timestamp helpers.

Testdata timestamps are ``timestamp_ntz``, which Spark refuses to cast
numerically; with the session pinned to UTC, ntz → ltz is wall-clock
identity, so ``cast('timestamp')`` first is lossless.
"""

from __future__ import annotations

from pyspark.sql import Column


def epoch_seconds(c: Column) -> Column:
    """Event time as fractional epoch seconds (UTC session)."""
    return c.cast("timestamp").cast("double")


def epoch_long(c: Column) -> Column:
    """Floored epoch seconds as bigint (DuckDB parity:
    ``floor(epoch(ts))::BIGINT``)."""
    from pyspark.sql import functions as F

    return F.floor(epoch_seconds(c)).cast("long")

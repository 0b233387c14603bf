"""Scalar function library (the SML stdlib UDFs, SURVEY.md §2.3).

Each reference UDF (``UDFBase`` subclass, ref: osprey_worker/src/
osprey/engine/stdlib/udfs/) becomes a *compile function*: it receives
the compiled keyword arguments and returns a Spark ``Column``
expression. Built-in ``pyspark.sql.functions`` are used wherever the
semantics allow (JVM-side, codegen'd); pandas UDFs only for the
unicode-table / parsing-heavy ones.
"""

from . import atproto, cache, core, strings, lists, query, text  # noqa: F401
from .registry import REGISTRY, QUERY_REGISTRY  # noqa: F401

"""Oracle/Spark output-type parity sweep (round-4 hardening).

Round 3's only red driver row (``tpch_q12``) was locally
irreproducible; the one structural anomaly was its oracle emitting raw
``sum(CASE ...)`` columns — DuckDB types those HUGEINT (int128) while
Spark emits bigint, so any driver-side hash normalization that renders
int128 cells differently (Arrow decimal128, width tags) reds the row
on *types* even though the values match. This test makes that whole
hazard class impossible to reintroduce:

1. every DuckDB oracle's output column types must come from a SAFE set
   whose Python rendering is bit-identical to the matching Spark type
   (no HUGEINT / DECIMAL / FLOAT32 / TIMESTAMPTZ / UUID / BLOB), and
2. per column name, the DuckDB type CLASS (int/float/str/bool/
   timestamp/date/list) must equal the Spark schema's type class.

The sweep compiles (does not execute) every oracle and analyzes (does
not collect) every Spark query at sf0.001, so it is cheap relative to
the value-hash board in tools/check_parity.py.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TYPE_SF_DIR", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# DuckDB types whose cursor-level Python objects render identically to
# the Spark type of the same class under any sane normalizer.
SAFE_DUCK = {
    "BIGINT": "int",
    "INTEGER": "int",
    "SMALLINT": "int",
    "TINYINT": "int",
    "DOUBLE": "float",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "TIMESTAMP": "ts",
    "DATE": "date",
}
# Hazard types: Python-side rendering is NOT guaranteed to match the
# Spark column (int128, decimal.Decimal, float32 rounding, tz-aware).
HAZARD_RE = re.compile(
    r"HUGEINT|DECIMAL|\bFLOAT\b|TIME ZONE|TIMESTAMPTZ|UUID|BLOB|UBIGINT|UINTEGER",
    re.IGNORECASE,
)


def duck_class(type_str: str) -> str | None:
    t = type_str.strip().upper()
    m = re.match(r"^(.*)\[\]$", t)
    if m:
        inner = duck_class(m.group(1))
        return f"list<{inner}>" if inner else None
    return SAFE_DUCK.get(t)


def spark_class(dt) -> str | None:
    from pyspark.sql import types as T

    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.DoubleType):
        return "float"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampNTZType, T.TimestampType)):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.ArrayType):
        inner = spark_class(dt.elementType)
        return f"list<{inner}>" if inner else None
    return None


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def test_every_oracle_emits_only_safe_types(duck, spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, sql in oracles.items():
        try:
            rel = duck.sql(sql)
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
        except Exception as e:  # compile error is its own failure
            failures.append(f"{name}: oracle does not compile: {e}")
            continue
        hazards = [
            f"{c}:{t}" for c, t in zip(dcols, dtypes) if HAZARD_RE.search(t)
        ]
        if hazards:
            failures.append(f"{name}: hazard duck types {hazards}")
            continue
        unknown = [
            f"{c}:{t}"
            for c, t in zip(dcols, dtypes)
            if duck_class(t) is None
        ]
        if unknown:
            failures.append(f"{name}: unmapped duck types {unknown}")
            continue
        try:
            sdf = qs[name](spark, SF_DIR)
        except Exception as e:
            failures.append(f"{name}: spark query failed to analyze: {e}")
            continue
        sclasses = {f.name: spark_class(f.dataType) for f in sdf.schema.fields}
        for c, t in zip(dcols, dtypes):
            if c not in sclasses:
                failures.append(f"{name}: oracle column {c!r} not in spark schema")
                continue
            dc, sc = duck_class(t), sclasses[c]
            if sc is None:
                failures.append(
                    f"{name}: spark column {c!r} has unmapped type"
                )
            elif dc != sc:
                failures.append(
                    f"{name}: column {c!r} class mismatch duck={t}({dc}) spark={sc}"
                )
    assert not failures, "\n".join(failures)

"""Osprey null/failure semantics on Spark columns.

The reference distinguishes node *failure* (Err) from a *None value*
(ref: engine/executor/execution_context.py:112-135); both collapse to
SQL NULL here, with operator-level overrides reproducing the observed
semantics (test oracle: engine/executor/tests/test_binary_comparison.py
and docs/rules.md "Nulls" table):

- ``==`` / ``!=`` are null-tolerant: ``None == None → True``
  (ref: binary_comparison_executor.py:33-43) → ``eqNullSafe``.
- ``< <= > >=`` poison on NULL operands (failure propagation) →
  plain SQL comparison already yields NULL.
- ``in`` / ``not in`` use the null-shield
  (ref: binary_comparison_executor.py:54-66): ``None in None → True``,
  ``None in [..None..] → True``, otherwise a NULL side → False.
  Result is always non-NULL.
- ``and`` / ``or`` coerce failed operands to falsey
  (ref: boolean_operation_executor.py:23-31) → coalesce(False) folds.
- list literals are strict: one failed element fails the list
  (ref: executor/node_executor/literals/list_executor.py:17-18), so
  ``Rule(when_all=[...])`` with a NULL condition is NULL, not False
  (ref: docs/rules.md "MySecondRule" example).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .values import Value


def sml_eq(left: Value, right: Value) -> Column:
    return _cmp_operand(left).eqNullSafe(_cmp_operand(right))


def sml_ne(left: Value, right: Value) -> Column:
    return ~_cmp_operand(left).eqNullSafe(_cmp_operand(right))


def _cmp_operand(v: Value) -> Column:
    # Entities compare by their id (post-exec value,
    # ref: engine/language_types/entities.py:37).
    return v.col


def sml_in(left: Value, right: Value) -> Column:
    """Membership with the reference's null-shield. Non-NULL result."""
    l, r = left.col, right.col
    if left.dtype == "null":
        # statically-None left side: `None in b` is True iff b is None
        # or a list containing None.
        if right.dtype.startswith("list"):
            return F.when(r.isNull(), F.lit(True)).otherwise(
                F.coalesce(F.exists(r, lambda x: x.isNull()), F.lit(False))
            )
        return r.isNull()
    if right.dtype == "null":
        # `a in None` → True only when a is also None.
        return l.isNull()
    # A runtime-NULL right side is a *failed* node in the reference —
    # only ==/!= tolerate right-side failure
    # (ref: binary_comparison_executor.py:38-43), so `in` poisons: NULL.
    # The null-shield (ref: :54-66) protects the left side only.
    if right.dtype.startswith("list"):
        return (
            F.when(r.isNull(), F.lit(None).cast("boolean"))
            .when(l.isNull(), F.coalesce(F.exists(r, lambda x: x.isNull()), F.lit(False)))
            .otherwise(F.coalesce(F.array_contains(r, l), F.lit(False)))
        )
    # string containment
    return (
        F.when(r.isNull(), F.lit(None).cast("boolean"))
        .when(l.isNull(), F.lit(False))
        .otherwise(r.contains(l))
    )


def truthy(v: Value) -> Column:
    """Python truthiness of an SML value as a non-NULL boolean.

    ``and``/``or`` treat failed (NULL) operands as falsey
    (ref: boolean_operation_executor.py:23-25).
    """
    c = v.col
    t = v.dtype
    if t == "bool" or t == "rule":
        return F.coalesce(c, F.lit(False))
    if t in ("int", "float", "timedelta"):
        return F.coalesce(c != F.lit(0), F.lit(False))
    if t == "str":
        return F.coalesce(F.length(c) > 0, F.lit(False))
    if t.startswith("list"):
        return F.coalesce(F.size(c) > 0, F.lit(False))
    if t == "null":
        return F.lit(False)
    # unknown type: NULL → False, else cast to boolean
    return F.coalesce(c.cast("boolean"), F.lit(False))


def sml_and(values: Sequence[Value]) -> Column:
    return reduce(lambda a, b: a & b, (truthy(v) for v in values))


def sml_or(values: Sequence[Value]) -> Column:
    return reduce(lambda a, b: a | b, (truthy(v) for v in values))


def strict_all(values: Sequence[Value]) -> Column:
    """``all()`` over a strict list: NULL if any element is NULL,
    else the conjunction. This is ``Rule(when_all=[...])``'s value
    (ref: stdlib/udfs/rules.py:97 + strict ListExecutor)."""
    cols = [v.col for v in values]
    any_null = reduce(lambda a, b: a | b, (c.isNull() for c in cols))
    conj = reduce(lambda a, b: a & b, (truthy(v) for v in values))
    return F.when(any_null, F.lit(None).cast("boolean")).otherwise(conj)


def lenient_any(values: Sequence[Value]) -> Column:
    """``any()`` tolerating failed elements — ``WhenRules(rules_any=…)``
    resolves each rule leniently (ref: stdlib/udfs/rules.py:123-154)."""
    return reduce(lambda a, b: a | b, (truthy(v) for v in values))

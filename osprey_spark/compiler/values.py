"""Compile-time value representation.

A ``Value`` pairs a Spark ``Column`` with a lightweight SML type tag —
the static-type info the reference's ``ValidateStaticTypes`` tracks
(ref: osprey_worker/src/osprey/engine/ast_validator/validators/
validate_static_types.py:65-120). Wrapper types (EntityT / RuleT /
TimeDeltaT, ref: engine/language_types/) carry metadata and unwrap to
primitives at extraction, mirroring PostExecutionConvertible
(ref: engine/language_types/post_execution_convertible.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

_NOT_CONST = object()


@dataclass
class Value:
    col: Column
    dtype: str = "any"  # str|int|float|bool|null|list:T|entity|rule|timedelta|effect|any
    const: Any = _NOT_CONST  # compile-time constant, when known
    entity_type: Optional[str] = None  # for dtype == 'entity'
    rule_name: Optional[str] = None  # for dtype == 'rule'
    effect: Optional["Effect"] = None  # for dtype == 'effect'

    @property
    def is_const(self) -> bool:
        return self.const is not _NOT_CONST

    @property
    def elem_type(self) -> str:
        return self.dtype.split(":", 1)[1] if self.dtype.startswith("list:") else "any"


def const_value(v: Any) -> Value:
    dtype = {str: "str", bool: "bool", int: "int", float: "float"}.get(type(v), "null" if v is None else "any")
    return Value(col=F.lit(v), dtype=dtype, const=v)


def unwrap(v: Value) -> Column:
    """Post-execution conversion: wrapper types → primitive columns.

    EntityT extracts as the bare id (ref: engine/language_types/
    entities.py:37), RuleT as its boolean value (ref: language_types/
    rules.py:11-17), TimeDeltaT as total seconds (ref: language_types/
    time_delta.py:10-24).
    """
    return v.col


@dataclass
class Effect:
    """An EffectBase subtype flowing into ``WhenRules(then=[...])``.

    kind: 'verdict' (ref: engine/language_types/verdicts.py:11-25)
        | 'label'  (ref: engine/language_types/labels.py:17-49)
    """

    kind: str
    verdict: Optional[str] = None
    entity: Optional[Value] = None
    label: Optional[str] = None
    status: Optional[str] = None  # 'added' | 'removed'
    apply_if: Optional[Value] = None
    expires_after_seconds: Optional[float] = None
    extra: dict = field(default_factory=dict)

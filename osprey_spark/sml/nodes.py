"""SML AST dataclasses.

Shapes mirror the reference grammar (ref: osprey_worker/src/osprey/
engine/ast/grammar.py) but only carry what the Spark compiler needs:
no executor hooks, no span-rendering machinery. Every node keeps a
(source, line, col) span for error messages.

Extraction rules (ref: ast/grammar.py:339-394):
- a top-level ``Assign`` is *extracted* (becomes an output feature)
  unless its name starts with ``_`` (local) or its value is a bare
  constant without an ``ExtractLiteral`` annotation;
- annotations: ``Optional[T]``, ``ExtractLiteral[T]``, ``Secret``,
  ``Entity[T]``, ``List[T]`` plus plain ``str/int/float/bool``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Union


@dataclass
class Span:
    source: str = "<sml>"
    line: int = 0
    col: int = 0


@dataclass
class Node:
    span: Span = field(default_factory=Span, repr=False)


# --- expressions -----------------------------------------------------------


@dataclass
class Literal(Node):
    """str/int/float/bool/None constant (ref: ast/grammar.py:307-330)."""

    value: Any = None


@dataclass
class ListLiteral(Node):
    items: list["Expr"] = field(default_factory=list)


@dataclass
class Name(Node):
    identifier: str = ""

    @property
    def is_local(self) -> bool:
        # '_'-prefixed names are file-local / never extracted
        # (ref: ast/grammar.py:265-268)
        return self.identifier.startswith("_")


@dataclass
class Attribute(Node):
    """One-level attribute access ``Base.attr`` (ref: ast/grammar.py:734-756)."""

    base: str = ""
    attr: str = ""


@dataclass
class FormatString(Node):
    """f-string; interpolations are names only (ref: ast/py_ast.py:287-331).

    ``parts`` alternates literal strings and Name nodes.
    """

    parts: list[Union[str, Name]] = field(default_factory=list)


@dataclass
class BinaryOperation(Node):
    """``+ - * / // % ** << >> | ^ &`` (ref: ast/grammar.py:467-564)."""

    op: str = "+"
    left: "Expr" = None  # type: ignore[assignment]
    right: "Expr" = None  # type: ignore[assignment]


@dataclass
class BinaryComparison(Node):
    """Single comparator ``== != < <= > >= in not-in``."""

    op: str = "=="
    left: "Expr" = None  # type: ignore[assignment]
    right: "Expr" = None  # type: ignore[assignment]


@dataclass
class BooleanOperation(Node):
    """n-ary ``and`` / ``or``; failed operands coerce falsey
    (ref: executor/node_executor/boolean_operation_executor.py:15-31)."""

    op: str = "and"  # 'and' | 'or'
    values: list["Expr"] = field(default_factory=list)


@dataclass
class UnaryOperation(Node):
    op: str = "not"  # 'not' | '-' | '+'
    operand: "Expr" = None  # type: ignore[assignment]


@dataclass
class Call(Node):
    """UDF call — keyword arguments only (ref: ast/py_ast.py:195)."""

    func: str = ""
    kwargs: dict[str, "Expr"] = field(default_factory=dict)


Expr = Union[
    Literal,
    ListLiteral,
    Name,
    Attribute,
    FormatString,
    BinaryOperation,
    BinaryComparison,
    BooleanOperation,
    UnaryOperation,
    Call,
]


# --- annotations -----------------------------------------------------------


@dataclass
class Annotation:
    """Parsed type annotation on an Assign.

    base: 'str' | 'int' | 'float' | 'bool' | 'List' | 'Entity' |
          'Optional' | 'ExtractLiteral' | 'Secret' | ...
    arg:  inner annotation for the subscripted forms.
    """

    base: str = ""
    arg: Optional["Annotation"] = None

    def innermost(self) -> str:
        a: Annotation = self
        while a.arg is not None:
            a = a.arg
        return a.base

    @property
    def is_optional(self) -> bool:
        return self.base == "Optional" or (self.arg is not None and self.arg.is_optional)

    @property
    def is_secret(self) -> bool:
        return self.base in ("Secret", "ExtractSecret") or (
            self.arg is not None and self.arg.is_secret
        )

    @property
    def is_extract_literal(self) -> bool:
        return self.base == "ExtractLiteral" or (
            self.arg is not None and self.arg.is_extract_literal
        )


# --- statements ------------------------------------------------------------


@dataclass
class Assign(Node):
    name: str = ""
    value: Expr = None  # type: ignore[assignment]
    annotation: Optional[Annotation] = None

    @property
    def is_constant(self) -> bool:
        # literals and lists of literals are constants
        # (ref: ast/grammar.py:380-386) — not extracted unless
        # annotated ExtractLiteral.
        if isinstance(self.value, Literal):
            return True
        if isinstance(self.value, ListLiteral):
            return all(isinstance(i, Literal) for i in self.value.items)
        return False

    @property
    def should_extract(self) -> bool:
        """ref: ast/grammar.py:355-378 ``Assign.should_extract``."""
        if self.name.startswith("_"):
            return False
        if self.annotation is not None and self.annotation.is_secret:
            return False
        if self.is_constant:
            return self.annotation is not None and self.annotation.is_extract_literal
        return True


@dataclass
class ExprStatement(Node):
    """Bare call at statement level (Import / Require / WhenRules)."""

    call: Call = None  # type: ignore[assignment]


Statement = Union[Assign, ExprStatement]


@dataclass
class Program(Node):
    source_path: str = "<sml>"
    statements: list[Statement] = field(default_factory=list)

"""SML front-end: parser, AST nodes, source tree loading, validation.

SML is osprey's rule language — a restricted Python subset
(ref: osprey_worker/src/osprey/engine/ast/py_ast.py). We reuse the
CPython ``ast`` module as the tokenizer/parser and lower to a small
dataclass AST, enforcing the same restrictions (top-level assignments
and bare calls only; keyword-only UDF calls; single comparators;
one-level attributes; f-strings interpolate names only).
"""

from .nodes import (  # noqa: F401
    Assign,
    Attribute,
    BinaryOperation,
    BinaryComparison,
    BooleanOperation,
    Call,
    ExprStatement,
    FormatString,
    ListLiteral,
    Literal,
    Name,
    Program,
    Statement,
    UnaryOperation,
)
from .parser import parse_program  # noqa: F401
from .errors import SmlError, SmlSyntaxError, SmlValidationError  # noqa: F401

"""Parse SML text → Program via the CPython ``ast`` module.

The reference does the same trick (ref: osprey_worker/src/osprey/
engine/ast/py_ast.py:71-92 ``transform``): SML *is* a Python subset,
so Python's parser tokenizes it and we whitelist node types while
lowering. Restrictions enforced here:

- module level: only ``Name = expr``, ``Name: Ann = expr``, and bare
  ``Call(...)`` expression statements;
- calls take keyword arguments only (ref: ast/py_ast.py:195);
- comparisons have exactly one comparator (no ``a < b < c``);
- attributes are one level (``Foo.Bar``), used for enum constants;
- f-strings interpolate plain names only (ref: ast/py_ast.py:287-331).
"""

from __future__ import annotations

import ast as pyast

from .errors import SmlSyntaxError
from .nodes import (
    Annotation,
    Assign,
    Attribute,
    BinaryComparison,
    BinaryOperation,
    BooleanOperation,
    Call,
    Expr,
    ExprStatement,
    FormatString,
    ListLiteral,
    Literal,
    Name,
    Program,
    Span,
    Statement,
    UnaryOperation,
)

_BINOPS = {
    pyast.Add: "+",
    pyast.Sub: "-",
    pyast.Mult: "*",
    pyast.Div: "/",
    pyast.FloorDiv: "//",
    pyast.Mod: "%",
    pyast.Pow: "**",
    pyast.LShift: "<<",
    pyast.RShift: ">>",
    pyast.BitOr: "|",
    pyast.BitXor: "^",
    pyast.BitAnd: "&",
}

_CMPOPS = {
    pyast.Eq: "==",
    pyast.NotEq: "!=",
    pyast.Lt: "<",
    pyast.LtE: "<=",
    pyast.Gt: ">",
    pyast.GtE: ">=",
    pyast.In: "in",
    pyast.NotIn: "not in",
}


def parse_program(text: str, source_path: str = "<sml>") -> Program:
    try:
        module = pyast.parse(text, filename=source_path)
    except SyntaxError as e:
        raise SmlSyntaxError(str(e.msg), source_path, e.lineno or 0, e.offset or 0) from e

    statements: list[Statement] = []
    for stmt in module.body:
        statements.append(_lower_statement(stmt, source_path))
    return Program(span=Span(source_path, 1, 0), source_path=source_path, statements=statements)


def _span(node: pyast.AST, source: str) -> Span:
    return Span(source, getattr(node, "lineno", 0), getattr(node, "col_offset", 0))


def _err(msg: str, node: pyast.AST, source: str) -> SmlSyntaxError:
    s = _span(node, source)
    return SmlSyntaxError(msg, s.source, s.line, s.col)


def _lower_statement(stmt: pyast.stmt, source: str) -> Statement:
    span = _span(stmt, source)
    if isinstance(stmt, pyast.Assign):
        if len(stmt.targets) != 1 or not isinstance(stmt.targets[0], pyast.Name):
            raise _err("assignment target must be a single name", stmt, source)
        return Assign(
            span=span,
            name=stmt.targets[0].id,
            value=_lower_expr(stmt.value, source),
            annotation=None,
        )
    if isinstance(stmt, pyast.AnnAssign):
        if not isinstance(stmt.target, pyast.Name):
            raise _err("assignment target must be a single name", stmt, source)
        if stmt.value is None:
            raise _err("annotated assignment must have a value", stmt, source)
        return Assign(
            span=span,
            name=stmt.target.id,
            value=_lower_expr(stmt.value, source),
            annotation=_lower_annotation(stmt.annotation, source),
        )
    if isinstance(stmt, pyast.Expr):
        if isinstance(stmt.value, pyast.Constant) and isinstance(stmt.value.value, str):
            # bare docstring — tolerated and ignored
            return ExprStatement(span=span, call=Call(span=span, func="__doc__", kwargs={}))
        if not isinstance(stmt.value, pyast.Call):
            raise _err("only calls are allowed as bare statements", stmt, source)
        call = _lower_expr(stmt.value, source)
        assert isinstance(call, Call)
        return ExprStatement(span=span, call=call)
    raise _err(f"statement type {type(stmt).__name__} is not part of SML", stmt, source)


def _lower_annotation(node: pyast.expr, source: str) -> Annotation:
    if isinstance(node, pyast.Name):
        return Annotation(base=node.id)
    if isinstance(node, pyast.Constant) and node.value is None:
        return Annotation(base="None")
    if isinstance(node, pyast.Subscript):
        if not isinstance(node.value, pyast.Name):
            raise _err("annotation base must be a name", node, source)
        return Annotation(base=node.value.id, arg=_lower_annotation(node.slice, source))
    raise _err(f"unsupported annotation {pyast.dump(node)[:60]}", node, source)


def _lower_expr(node: pyast.expr, source: str) -> Expr:
    span = _span(node, source)

    if isinstance(node, pyast.Constant):
        if node.value is None or isinstance(node.value, (str, int, float, bool)):
            return Literal(span=span, value=node.value)
        raise _err(f"unsupported constant {node.value!r}", node, source)

    if isinstance(node, pyast.List):
        return ListLiteral(span=span, items=[_lower_expr(e, source) for e in node.elts])

    if isinstance(node, pyast.Name):
        # `Null` reads as the None literal in UI query strings
        # (ref: docs/rules.md "Thing != Null").
        if node.id == "Null":
            return Literal(span=span, value=None)
        return Name(span=span, identifier=node.id)

    if isinstance(node, pyast.Attribute):
        if not isinstance(node.value, pyast.Name):
            raise _err("attribute access is one level only (Foo.Bar)", node, source)
        return Attribute(span=span, base=node.value.id, attr=node.attr)

    if isinstance(node, pyast.JoinedStr):
        parts: list = []
        for v in node.values:
            if isinstance(v, pyast.Constant):
                parts.append(str(v.value))
            elif isinstance(v, pyast.FormattedValue):
                if not isinstance(v.value, pyast.Name) or v.format_spec is not None:
                    raise _err("f-strings may only interpolate plain names", v, source)
                parts.append(Name(span=_span(v, source), identifier=v.value.id))
            else:
                raise _err("unsupported f-string component", v, source)
        return FormatString(span=span, parts=parts)

    if isinstance(node, pyast.BinOp):
        op = _BINOPS.get(type(node.op))
        if op is None:
            raise _err(f"unsupported binary operator {type(node.op).__name__}", node, source)
        return BinaryOperation(
            span=span, op=op, left=_lower_expr(node.left, source), right=_lower_expr(node.right, source)
        )

    if isinstance(node, pyast.Compare):
        if len(node.ops) != 1 or len(node.comparators) != 1:
            raise _err("chained comparisons are not allowed", node, source)
        op = _CMPOPS.get(type(node.ops[0]))
        if op is None:
            raise _err(f"unsupported comparator {type(node.ops[0]).__name__}", node, source)
        return BinaryComparison(
            span=span,
            op=op,
            left=_lower_expr(node.left, source),
            right=_lower_expr(node.comparators[0], source),
        )

    if isinstance(node, pyast.BoolOp):
        op = "and" if isinstance(node.op, pyast.And) else "or"
        return BooleanOperation(span=span, op=op, values=[_lower_expr(v, source) for v in node.values])

    if isinstance(node, pyast.UnaryOp):
        if isinstance(node.op, pyast.Not):
            op = "not"
        elif isinstance(node.op, pyast.USub):
            op = "-"
        elif isinstance(node.op, pyast.UAdd):
            op = "+"
        else:
            raise _err("unsupported unary operator", node, source)
        return UnaryOperation(span=span, op=op, operand=_lower_expr(node.operand, source))

    if isinstance(node, pyast.Call):
        if not isinstance(node.func, pyast.Name):
            raise _err("calls must be to plain UDF names", node, source)
        if node.args:
            raise _err(
                f"UDF {node.func.id} takes keyword arguments only", node, source
            )
        kwargs: dict[str, Expr] = {}
        for kw in node.keywords:
            if kw.arg is None:
                raise _err("**kwargs is not allowed", node, source)
            kwargs[kw.arg] = _lower_expr(kw.value, source)
        return Call(span=span, func=node.func.id, kwargs=kwargs)

    raise _err(f"expression type {type(node).__name__} is not part of SML", node, source)

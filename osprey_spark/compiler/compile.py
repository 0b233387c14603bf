"""The SML → Spark ``Column`` compiler.

Replaces the reference pipeline
``validate_sources → compile_execution_graph → per-action execute``
(ref: engine/ast_validator/, engine/executor/execution_graph.py:111-149,
engine/executor/executor.py:308-417) with a single compile pass that
emits one Spark Column per feature. The compiled ruleset is a plain
DataFrame transformation — Catalyst handles subexpression reuse,
constant folding, and codegen, so there is no runtime interpreter.

Statement-level UDFs handled here rather than in the registry:

- ``Import(rules=[...])`` — inline file merge, dedup + cycle check
  (ref: stdlib/udfs/import_.py:17-82, ast_validator/validators/
  imports_must_not_have_cycles.py).
- ``Require(rule=…, require_if=…)`` — conditional file inclusion;
  compiles the target file with every feature/effect masked by the
  guard predicate (ref: stdlib/udfs/require.py:14-57). An f-string
  rule path (dynamic dispatch by a feature such as ActionName) is
  expanded at compile time over all matching source files, each
  guarded by equality on the interpolated feature.
- ``WhenRules(rules_any=[...], then=[...])`` — effect trigger
  (ref: stdlib/udfs/rules.py:120-166).
"""

from __future__ import annotations

import posixpath
import re as _re_mod
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sml.errors import SmlValidationError
from ..sml.nodes import (
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
    UnaryOperation,
)
from ..sml.parser import parse_program
from . import nullsafe
from .values import Effect, Value, const_value

# Reserved output feature names
# (ref: engine/executor/custom_extracted_features.py:54-91,
#  engine/shared_constants.py:7-8).
ACTION_ID = "__action_id"
SAMPLE_RATE = "__sample_rate"

# Enum constants resolvable via attribute access (Foo.Bar). Seeded
# with the reference's public enums (worker/lib/osprey_shared/
# labels.py:41-55 LabelStatus, stdlib/udfs/experiments.py:34-35
# ExperimentsVersion); host applications extend via register_enum.
ENUM_CONSTANTS: dict[str, dict[str, object]] = {
    "LabelStatus": {
        "REMOVED": "removed",
        "ADDED": "added",
        "MANUALLY_REMOVED": "manually_removed",
        "MANUALLY_ADDED": "manually_added",
    },
    "ExperimentsVersion": {"v1": "v1"},
}


def _state_bucket_count() -> int:
    # lazy: streaming/__init__ imports pipeline which imports this
    # module, so a top-level import here would be circular
    from ..streaming.buckets import state_bucket_count

    return state_bucket_count()


def register_enum(name: str, members: dict[str, object]) -> None:
    ENUM_CONSTANTS[name] = dict(members)
TIMESTAMP = "__timestamp"
ERROR_COUNT = "__error_count"
VERDICTS = "__verdicts"
LABEL_MUTATIONS = "__entity_label_mutations"
# engine extension: typed label-effect rows for the stateful layer
LABEL_EFFECTS = "__label_effects"

LABEL_EFFECT_SCHEMA = (
    "array<struct<entity_type:string,entity_id:string,label:string,"
    "status:string,expires_after:double>>"
)


_UNRESOLVED_ATTR_RE = _re_mod.compile(r"UnresolvedAttribute\(\w*\(([^)]*)\)")
_MANGLED_TOKEN_RE = _re_mod.compile(r"__(?:f|wc|cache|lbl)_\w+")


def _column_refs(col: Column) -> set:
    """Names an unresolved Column references: UnresolvedAttribute
    entries from the column-node tree string, plus every mangled
    feature token anywhere in it (covers SQL-string-built columns,
    where the node is an opaque SqlExpression). Conservative
    over-capture is harmless — callers intersect with known names."""
    s = col._jc.node().toString()
    refs = {
        m.group(1).split(",")[0].strip()
        for m in _UNRESOLVED_ATTR_RE.finditer(s)
    }
    refs |= set(_MANGLED_TOKEN_RE.findall(s))
    refs.discard("")
    return refs


@dataclass
class InputBindings:
    """How SML's implicit inputs map onto input DataFrame columns.

    The reference's ``Action`` fields
    (ref: engine/executor/execution_context.py:296-332) map to:
    ``data`` → a JSON string column (JsonData paths resolve into it),
    ``action_name`` → string column, ``timestamp`` → event-time
    column, ``action_id`` → int64 column (or None → derived).
    """

    data: str = "data"
    action_name: str = "action_name"
    timestamp: str = "ts"
    action_id: Optional[str] = "action_id"
    # Struct-backed fast path: when the action payload also exists as
    # typed top-level columns (the transcripts table), map JSON field →
    # column name here and simple ``$.field`` JsonData paths compile to
    # direct column references — no to_json/get_json_object roundtrip.
    # Catalyst then prunes the JSON envelope column away entirely.
    data_fields: Optional[dict[str, str]] = None


_SPARK_TYPE = {"str": "string", "int": "long", "float": "double", "bool": "boolean"}


def annotation_dtype(ann: Optional[Annotation]) -> str:
    if ann is None:
        return "any"
    base = ann.base
    if base in ("Optional", "ExtractLiteral", "Secret", "ExtractSecret"):
        return annotation_dtype(ann.arg)
    if base == "List":
        return f"list:{annotation_dtype(ann.arg)}"
    if base == "Entity":
        return "entity"
    if base in ("str", "int", "float", "bool"):
        return base
    return "any"


@dataclass
class _FileScope:
    path: str
    locals: dict[str, Value] = field(default_factory=dict)
    # NoUnusedLocals lint state (ref: ast_validator/validators/
    # no_unused_locals.py): first-store span per local + load marks
    local_spans: dict[str, Span] = field(default_factory=dict)
    local_loads: set = field(default_factory=set)


class CompilerContext:
    def __init__(
        self,
        sources: dict[str, str],
        bindings: InputBindings,
        registry: dict[str, Callable],
        labels_config=None,
    ):
        self.sources = sources
        self.bindings = bindings
        self.registry = registry
        # Optional LabelsConfig (labels.yaml stand-in): when present,
        # LabelAdd/LabelRemove/HasLabel label names and entity types
        # are validated at compile time (ref: validate_labels.py:36-85)
        self.labels_config = labels_config
        self.features: dict[str, Value] = {}
        self.extracted: list[str] = []  # extraction order
        # Ordered (column_name, defining Column) pairs. Every non-const
        # feature is materialized as a projection column and all uses
        # reference it by name — keeps the logical plan linear in the
        # program size instead of exponential (the reference gets the
        # same evaluate-once sharing from its named dataflow nodes,
        # ref: engine/executor/execution_graph.py:90-93).
        self.feature_exprs: list[tuple[str, Column]] = []
        # HasLabel lookups: mangled column name → join spec, resolved
        # by CompiledRuleset.apply against a label snapshot (the
        # reference batches label fetches by entity routing key,
        # ref: stdlib/udfs/labels.py:242-293)
        self.label_lookups: list[dict] = []
        self.verdict_conditions: list[tuple[Column, str]] = []
        self.label_effects: list[dict] = []
        # AtprotoList-class effects → the 'atproto_list' custom
        # extracted feature (ref: example_plugins/src/udfs/atproto/
        # list.py:40-49 serializes fired effects as 'did|list_uri')
        self.list_effects: list[tuple[Column, Column]] = []
        self.rule_descriptions: dict[str, Column] = {}
        self._compiled_paths: set[str] = set()
        self._compiling_stack: list[str] = []
        self._guard: Optional[Value] = None
        self._scopes: list[_FileScope] = []
        self.current_annotation: Optional[Annotation] = None

    # -- errors --------------------------------------------------------
    def error(self, msg: str, span: Span) -> SmlValidationError:
        return SmlValidationError(msg, span.source, span.line, span.col)

    def validate_label(
        self, label: str, entity_type: Optional[str], span: Span
    ) -> None:
        """Compile-time label validation against the registered config
        (ref: validate_labels.py:46-85): unknown label → error with a
        closest-match hint; entity type outside the label's valid_for
        list → error listing the valid types. No-op without a config —
        a typo'd label would otherwise silently return False forever."""
        if self.labels_config is None:
            return
        from .labels_config import closest_within_threshold

        info = self.labels_config.labels.get(label)
        if info is None:
            hint = f"there is no `{label}` label in the config"
            closest = closest_within_threshold(label, self.labels_config.labels)
            if closest is not None:
                hint += f", did you mean `{closest}`?"
            raise self.error(f"unknown label: {hint}", span)
        if entity_type is not None and entity_type not in info.valid_for:
            valid = ", ".join(f"`{t}`" for t in info.valid_for) or "(none)"
            raise self.error(
                f"label `{label}` is not valid for this entity type: entity "
                f"has type `{entity_type}`, this label is valid for {valid}",
                span,
            )

    # -- name scoping ----------------------------------------------------
    def lookup(self, node: Name) -> Value:
        if node.is_local:
            for scope in reversed(self._scopes):
                if node.identifier in scope.locals:
                    scope.local_loads.add(node.identifier)
                    return scope.locals[node.identifier]
            raise self.error(f"undefined local {node.identifier}", node.span)
        if node.identifier in self.features:
            return self.features[node.identifier]
        raise self.error(f"undefined name {node.identifier}", node.span)

    def assign(self, stmt: Assign, value: Value) -> None:
        if stmt.name.startswith("_"):
            scope = self._scopes[-1]
            scope.locals[stmt.name] = value
            scope.local_spans.setdefault(stmt.name, stmt.span)
            return
        if stmt.name in self.features:
            # UniqueStoredNames validator parity
            raise self.error(f"duplicate feature name {stmt.name}", stmt.span)
        if not value.is_const and value.dtype != "effect":
            # materialize + rebind to a reference (mangled to keep the
            # feature namespace disjoint from input columns)
            mangled = f"__f_{stmt.name}"
            self.feature_exprs.append((mangled, value.col))
            value = Value(
                col=F.col(mangled),
                dtype=value.dtype,
                entity_type=value.entity_type,
                rule_name=value.rule_name,
                effect=value.effect,
            )
        self.features[stmt.name] = value
        if stmt.should_extract:
            self.extracted.append(stmt.name)

    # -- guards ----------------------------------------------------------
    def guarded(self, col: Column) -> Column:
        if self._guard is None:
            return col
        return F.when(self._guard.col, col)

    def effect_condition(self, cond: Column) -> Column:
        if self._guard is None:
            return cond
        return nullsafe.truthy(self._guard) & cond

    # -- file compilation --------------------------------------------------
    def compile_path(self, path: str, span: Span, guard: Optional[Value] = None) -> None:
        path = posixpath.normpath(path)
        if path in self._compiling_stack:
            cycle = " -> ".join(self._compiling_stack + [path])
            raise self.error(f"import cycle: {cycle}", span)
        if path in self._compiled_paths:
            return
        text = self.sources.get(path)
        if text is None:
            raise self.error(f"no such rule source: {path}", span)
        program = parse_program(text, path)
        self._compiling_stack.append(path)
        prev_guard = self._guard
        if guard is not None:
            if prev_guard is not None:
                combined = nullsafe.truthy(prev_guard) & nullsafe.truthy(guard)
                self._guard = Value(col=combined, dtype="bool")
            else:
                self._guard = guard
        self._scopes.append(_FileScope(path=path))
        try:
            for stmt in program.statements:
                self._compile_statement(stmt)
            # NoUnusedLocals (ref: no_unused_locals.py:10-36): a local
            # that is stored but never loaded has no effect — error
            scope = self._scopes[-1]
            for lname, lspan in scope.local_spans.items():
                if lname not in scope.local_loads:
                    raise self.error(
                        f"unused local variable: `{lname}` — this variable is "
                        "not used anywhere, and thus has no effect. either "
                        "delete or comment it out",
                        lspan,
                    )
            self._compiled_paths.add(path)
        finally:
            self._scopes.pop()
            self._guard = prev_guard
            self._compiling_stack.pop()

    # -- statements --------------------------------------------------------
    def _compile_statement(self, stmt) -> None:
        if isinstance(stmt, Assign):
            self.current_annotation = stmt.annotation
            try:
                value = self.compile_expr(stmt.value)
            finally:
                self.current_annotation = None
            if self._guard is not None and not isinstance(stmt.value, Literal):
                value = Value(
                    col=self.guarded(value.col),
                    dtype=value.dtype,
                    entity_type=value.entity_type,
                    rule_name=value.rule_name,
                )
            if value.dtype == "rule":
                value.rule_name = stmt.name
                if id(value) in self.rule_descriptions:
                    self.rule_descriptions[stmt.name] = self.rule_descriptions.pop(id(value))
            self.assign(stmt, value)
            return
        if isinstance(stmt, ExprStatement):
            call = stmt.call
            if call.func == "__doc__":
                return
            if call.func == "Import":
                self._stmt_import(call)
                return
            if call.func == "Require":
                self._stmt_require(call)
                return
            if call.func == "WhenRules":
                self._stmt_when_rules(call)
                return
            # statement-level UDFs returning None (CacheSet* family —
            # they record state writes in the context, producing no
            # feature; ref: example_plugins/src/udfs/cache.py:278-302)
            fn = self.registry.get(call.func)
            if fn is not None:
                from ..functions.registry import TrackedArgs

                args = TrackedArgs({k: self.compile_expr(e) for k, e in call.kwargs.items()
                                    if k != "when_all"})
                v = fn(self, call, args)
                if v.dtype == "none":
                    self._reject_unconsumed_kwargs(call, args)
                    return
            # other bare effect calls are not meaningful outside WhenRules
            raise self.error(f"{call.func} cannot appear as a bare statement", call.span)
        raise self.error(f"unsupported statement {type(stmt).__name__}", stmt.span)

    def _check_stmt_kwargs(self, call: Call, allowed: set) -> None:
        extra = set(call.kwargs) - allowed
        if extra:
            raise self.error(
                f"{call.func} got unexpected keyword argument(s): "
                + ", ".join(sorted(extra)),
                call.span,
            )

    def _stmt_import(self, call: Call) -> None:
        self._check_stmt_kwargs(call, {"rules"})
        rules = call.kwargs.get("rules")
        if not isinstance(rules, ListLiteral):
            raise self.error("Import(rules=[...]) requires a literal list", call.span)
        paths = []
        for item in rules.items:
            if not isinstance(item, Literal) or not isinstance(item.value, str):
                raise self.error("Import paths must be string literals", call.span)
            paths.append(item.value)
        # the reference sorts import lists for determinism
        # (ref: stdlib/udfs/import_.py:17-82)
        for p in sorted(paths):
            self.compile_path(p, call.span)

    def _stmt_require(self, call: Call) -> None:
        self._check_stmt_kwargs(call, {"rule", "require_if"})
        rule = call.kwargs.get("rule")
        require_if = call.kwargs.get("require_if")
        guard: Optional[Value] = None
        if require_if is not None:
            guard = self.compile_expr(require_if)
        if isinstance(rule, Literal) and isinstance(rule.value, str):
            self.compile_path(rule.value, call.span, guard)
            return
        if isinstance(rule, FormatString):
            # dynamic dispatch: expand over all matching files, each
            # guarded by equality on the interpolated feature
            # (ref: stdlib/udfs/require.py:36-57).
            name_parts = [p for p in rule.parts if isinstance(p, Name)]
            if len(name_parts) != 1:
                raise self.error("Require f-string must interpolate exactly one name", call.span)
            dispatch = self.lookup(name_parts[0])
            prefix = ""
            suffix = ""
            seen_name = False
            for p in rule.parts:
                if isinstance(p, Name):
                    seen_name = True
                elif not seen_name:
                    prefix += p
                else:
                    suffix += p
            for path in sorted(self.sources):
                if path.startswith(prefix) and path.endswith(suffix) and len(path) > len(prefix) + len(suffix):
                    segment = path[len(prefix) : len(path) - len(suffix)]
                    if "/" in segment:
                        continue
                    eq = dispatch.col.eqNullSafe(F.lit(segment))
                    g = Value(col=eq, dtype="bool")
                    if guard is not None:
                        g = Value(col=nullsafe.truthy(guard) & eq, dtype="bool")
                    self.compile_path(path, call.span, g)
            return
        raise self.error("Require(rule=...) must be a string literal or f-string", call.span)

    def _stmt_when_rules(self, call: Call) -> None:
        self._check_stmt_kwargs(call, {"rules_any", "then"})
        rules_any = call.kwargs.get("rules_any")
        then = call.kwargs.get("then")
        if not isinstance(rules_any, ListLiteral) or not isinstance(then, ListLiteral):
            raise self.error("WhenRules requires rules_any=[...] and then=[...]", call.span)
        rule_vals = [self.compile_expr(e) for e in rules_any.items]
        cond = self.effect_condition(nullsafe.lenient_any(rule_vals))
        for e in then.items:
            ev = self.compile_expr(e)
            if ev.dtype != "effect" or ev.effect is None:
                raise self.error("then=[...] items must be effects", call.span)
            self.add_effect(cond, ev.effect, call.span)

    def add_effect(self, cond: Column, eff: Effect, span: Span) -> None:
        if eff.kind == "verdict":
            self.verdict_conditions.append((cond, eff.verdict or ""))
            return
        if eff.kind == "label":
            c = cond
            if eff.apply_if is not None:
                # apply_if failure ⇒ suppressed, fail-closed
                # (ref: stdlib/udfs/labels.py:61-67)
                c = c & nullsafe.truthy(eff.apply_if)
            assert eff.entity is not None
            c = c & eff.entity.col.isNotNull()
            self.label_effects.append(
                {
                    "cond": c,
                    "entity_type": eff.entity.entity_type or "Unknown",
                    "entity_id": eff.entity.col.cast("string"),
                    "label": eff.label or "",
                    "status": eff.status or "added",
                    "expires_after": eff.expires_after_seconds,
                }
            )
            return
        if eff.kind == "list":
            # ref: example_plugins/src/udfs/atproto/list.py:52-62 —
            # the effect carries (did, list_uri); serialization is
            # 'did|list_uri' (to_str, list.py:31-32). A NULL did or
            # uri makes the concat NULL and the entry drops from the
            # array — the Err→no-effect analogue of the reference's
            # raising UDF.
            self.list_effects.append(
                (
                    cond,
                    F.concat(
                        eff.extra["did"], F.lit("|"), eff.extra["list_uri"]
                    ),
                )
            )
            return
        raise self.error(f"unknown effect kind {eff.kind}", span)

    # -- expressions ---------------------------------------------------------
    def compile_expr(self, node: Expr) -> Value:
        if isinstance(node, Literal):
            return const_value(node.value)

        if isinstance(node, ListLiteral):
            items = [self.compile_expr(e) for e in node.items]
            elem = "any"
            for it in items:
                if it.dtype not in ("any", "null"):
                    elem = it.dtype
                    break
            if not items:
                return Value(col=F.array().cast("array<string>"), dtype="list:str", const=[])
            v = Value(col=F.array(*[it.col for it in items]), dtype=f"list:{elem}")
            if all(it.is_const for it in items):
                v.const = [it.const for it in items]
            return v

        if isinstance(node, Name):
            return self.lookup(node)

        if isinstance(node, Attribute):
            # enum-constant access Foo.Bar (ref: ast/grammar.py:734-756
            # parses it; the reference's own validator still rejects
            # attributes — validate_static_types.py:614-616 — so this
            # registry is a strict superset of reference behavior)
            ns = ENUM_CONSTANTS.get(node.base)
            if ns is None or node.attr not in ns:
                raise self.error(
                    f"unknown attribute constant {node.base}.{node.attr}", node.span
                )
            return const_value(ns[node.attr])

        if isinstance(node, FormatString):
            cols: list[Column] = []
            for p in node.parts:
                if isinstance(p, str):
                    cols.append(F.lit(p))
                else:
                    cols.append(self.lookup(p).col.cast("string"))
            return Value(col=F.concat(*cols) if cols else F.lit(""), dtype="str")

        if isinstance(node, BinaryOperation):
            return self._compile_binop(node)

        if isinstance(node, BinaryComparison):
            return self._compile_comparison(node)

        if isinstance(node, BooleanOperation):
            values = [self.compile_expr(v) for v in node.values]
            col = nullsafe.sml_and(values) if node.op == "and" else nullsafe.sml_or(values)
            return Value(col=col, dtype="bool")

        if isinstance(node, UnaryOperation):
            v = self.compile_expr(node.operand)
            if node.op == "not":
                out = Value(col=~v.col.cast("boolean"), dtype="bool")
                if v.is_const:
                    out.const = not v.const
                return out
            if node.op == "-":
                out = Value(col=-v.col, dtype=v.dtype)
                if v.is_const and isinstance(v.const, (int, float)):
                    out.const = -v.const
                return out
            return v

        if isinstance(node, Call):
            return self._compile_call(node)

        raise self.error(f"unsupported expression {type(node).__name__}", node.span)

    def _compile_call(self, node: Call) -> Value:
        fn = self.registry.get(node.func)
        if fn is None:
            raise self.error(f"unknown UDF {node.func}", node.span)
        from ..functions.registry import TrackedArgs

        args = TrackedArgs({k: self.compile_expr(v) for k, v in node.kwargs.items()})
        out = fn(self, node, args)
        self._reject_unconsumed_kwargs(node, args)
        return out

    def _reject_unconsumed_kwargs(self, node: Call, args) -> None:
        """Reject typo'd/unexpected keyword arguments: every kwarg a
        call passes must be consumed by its UDF's compile fn (ref:
        ast_validator/validators/validate_call_kwargs.py — the
        reference errors on kwargs absent from the UDF's Arguments
        class; a silently ignored `statu='added'` is the same bug
        class as an unknown label)."""
        extra = set(node.kwargs) - args.accessed
        if extra:
            raise self.error(
                f"{node.func} got unexpected keyword argument(s): "
                + ", ".join(sorted(extra)),
                node.span,
            )

    def _type_kind(self, dtype: str) -> Optional[str]:
        """Static-type kind for the transition checks (ref:
        validate_static_types.py:722-757 binary-operation transitions,
        :760-782 comparison transitions). ``None`` = unknown/wrapper —
        not checked (the reference's AnyType); timedelta counts as
        numeric (post-exec seconds, ref: language_types/time_delta.py)."""
        if dtype == "str":
            return "str"
        if dtype in ("int", "float", "bool", "timedelta"):
            return "num"
        if dtype.startswith("list"):
            return "list"
        return None

    def _check_op_types(self, node, op: str, lt: str, rt: str, allowed) -> None:
        """Reject statically known type mismatches, mirroring the
        reference's transition tables; unknown kinds pass."""
        lk, rk = self._type_kind(lt), self._type_kind(rt)
        if lk is None or rk is None or (lk, rk) in allowed:
            return
        raise self.error(
            f"unsupported operand type(s) for {op}: `{lt}` and `{rt}`", node.span
        )

    def _compile_binop(self, node: BinaryOperation) -> Value:
        left = self.compile_expr(node.left)
        right = self.compile_expr(node.right)
        op = node.op
        l, r = left.col, right.col
        lt, rt = left.dtype, right.dtype
        NUM = {("num", "num")}
        if op == "+":
            self._check_op_types(
                node, op, lt, rt, NUM | {("str", "str"), ("list", "list")}
            )
            if lt == "str" or rt == "str":
                return Value(col=F.concat(l, r), dtype="str")
            if lt.startswith("list") or rt.startswith("list"):
                return Value(col=F.concat(l, r), dtype=lt if lt.startswith("list") else rt)
            return Value(col=l + r, dtype=_num(lt, rt))
        if op == "-":
            self._check_op_types(node, op, lt, rt, NUM)
            return Value(col=l - r, dtype=_num(lt, rt))
        if op == "*":
            # str * int / int * str = repetition
            # (ref: validate_static_types.py:742-745 Multiply table)
            self._check_op_types(
                node, op, lt, rt, NUM | {("str", "num"), ("num", "str")}
            )
            if lt == "str" and rt in ("int", "bool"):
                return Value(col=F.repeat(l, r.cast("int")), dtype="str")
            if rt == "str" and lt in ("int", "bool"):
                return Value(col=F.repeat(r, l.cast("int")), dtype="str")
            if "str" in (lt, rt):
                raise self.error(
                    f"unsupported operand type(s) for *: `{lt}` and `{rt}`", node.span
                )
            return Value(col=l * r, dtype=_num(lt, rt))
        if op == "/":
            self._check_op_types(node, op, lt, rt, NUM)
            return Value(col=l / r, dtype="float")
        if op == "//":
            self._check_op_types(node, op, lt, rt, NUM)
            if lt == "int" and rt == "int":
                return Value(col=F.floor(l.cast("double") / r).cast("long"), dtype="int")
            return Value(col=F.floor(l / r).cast("double"), dtype="float")
        if op == "%":
            # Python modulo takes the sign of the divisor; SQL pmod covers
            # the common non-negative-divisor case.
            self._check_op_types(node, op, lt, rt, NUM)
            return Value(col=F.pmod(l, r), dtype=_num(lt, rt))
        if op == "**":
            self._check_op_types(node, op, lt, rt, NUM)
            return Value(col=F.pow(l, r), dtype="float")
        # shifts and bitwise ops are int-only in the reference table
        # (validate_static_types.py:746-756)
        if op in ("<<", ">>", "|", "^", "&"):
            self._check_op_types(node, op, lt, rt, NUM)
            if "float" in (lt, rt):
                raise self.error(
                    f"unsupported operand type(s) for {op}: `{lt}` and `{rt}`",
                    node.span,
                )
        if op == "<<":
            return Value(col=F.shiftleft(l, _const_int(self, right, node.span)), dtype="int")
        if op == ">>":
            return Value(col=F.shiftright(l, _const_int(self, right, node.span)), dtype="int")
        if op == "|":
            return Value(col=l.bitwiseOR(r), dtype="int")
        if op == "^":
            return Value(col=l.bitwiseXOR(r), dtype="int")
        if op == "&":
            return Value(col=l.bitwiseAND(r), dtype="int")
        raise self.error(f"unsupported binary operator {op}", node.span)

    def _compile_comparison(self, node: BinaryComparison) -> Value:
        left = self.compile_expr(node.left)
        right = self.compile_expr(node.right)
        op = node.op
        lt, rt = left.dtype, right.dtype
        lk, rk = self._type_kind(lt), self._type_kind(rt)
        if op in ("==", "!="):
            # incompatible known kinds always compare False/True
            # (ref: validate_static_types.py:472-534 — errors
            # "left and right sides have incompatible types"); null
            # literals compare against anything
            if (
                lk is not None
                and rk is not None
                and lk != rk
                and "null" not in (lt, rt)
            ):
                raise self.error(
                    f"left and right sides have incompatible types "
                    f"(`{lt}` vs `{rt}`)",
                    node.span,
                )
            if op == "==":
                return Value(col=nullsafe.sml_eq(left, right), dtype="bool")
            return Value(col=nullsafe.sml_ne(left, right), dtype="bool")
        if op in ("in", "not in"):
            # valid: str in str, any in List
            # (ref: validate_static_types.py:768-773)
            if rk == "num" or (rk == "str" and lk not in (None, "str")):
                raise self.error(
                    f"unsupported operand type(s) for in: `{lt}` and `{rt}`",
                    node.span,
                )
            col = nullsafe.sml_in(left, right)
            return Value(col=col if op == "in" else ~col, dtype="bool")
        # ordering comparisons are numeric-only in the reference
        # (validate_static_types.py:764-767: LessThan..GreaterThanEquals
        # accept _INT_OR_FLOAT_T only)
        if (lk is not None and lk != "num") or (rk is not None and rk != "num"):
            raise self.error(
                f"unsupported operand type(s) for {op}: `{lt}` and `{rt}`", node.span
            )
        cmap = {"<": "__lt__", "<=": "__le__", ">": "__gt__", ">=": "__ge__"}
        col = getattr(left.col, cmap[op])(right.col)
        return Value(col=col, dtype="bool")


def _num(lt: str, rt: str) -> str:
    if lt == "float" or rt == "float":
        return "float"
    return "int"


def _const_int(ctx: CompilerContext, v: Value, span: Span) -> int:
    if v.is_const and isinstance(v.const, int):
        return v.const
    raise ctx.error("shift amount must be an integer literal", span)


# --- public API --------------------------------------------------------------


@dataclass
class CompiledRuleset:
    """A compiled SML program: a pure DataFrame transformation.

    ``apply(df)`` projects the input to
    ``passthrough + extracted features + reserved columns``
    (__action_id, __timestamp, __verdicts, __entity_label_mutations,
    __label_effects, __error_count).
    """

    ctx: CompilerContext
    bindings: InputBindings

    @property
    def feature_names(self) -> list[str]:
        return list(self.ctx.extracted)

    @property
    def feature_types(self) -> dict[str, str]:
        return {n: self.ctx.features[n].dtype for n in self.ctx.extracted}

    def _join_label(self, df: DataFrame, labels_df: DataFrame, spec: dict) -> DataFrame:
        """Left-join one HasLabel lookup as a boolean column.

        Semantics per the reference (stdlib/udfs/labels.py:168-224):
        status must match; an expired ADDED label does not count
        (expiry judged at event time); ``min_label_age`` requires the
        mutation to predate the action by at least that many seconds.
        Missing entity/label → False. The label side is filtered to one
        (entity_type, label) pair and broadcast — label cardinality per
        pair is bounded by labeled entities, which is orders below the
        event stream."""
        name = spec["name"]
        ts = F.col(self.bindings.timestamp).cast("timestamp").cast("double")
        side = (
            labels_df.filter(
                (F.col("entity_type") == F.lit(spec["entity_type"]))
                & (F.col("label") == F.lit(spec["label"]))
            )
            .select(
                F.col("entity_id").alias(f"{name}__id"),
                F.col("status").alias(f"{name}__status"),
                F.col("expires_at_unix").alias(f"{name}__exp"),
                F.col("mutation_ts").cast("timestamp").cast("double").alias(f"{name}__mut"),
            )
        )
        df = df.join(
            F.broadcast(side), spec["entity_col"] == F.col(f"{name}__id"), "left"
        )
        ok = F.col(f"{name}__status") == F.lit(spec["status"])
        if spec["status"] == "added":
            ok = ok & (
                (F.col(f"{name}__exp").isNull())
                | (F.col(f"{name}__exp") == 0)
                | (F.col(f"{name}__exp") > ts)
            )
        if spec.get("min_age_seconds"):
            ok = ok & (ts - F.col(f"{name}__mut") >= F.lit(float(spec["min_age_seconds"])))
        return df.select("*", F.coalesce(ok, F.lit(False)).alias(name)).drop(
            f"{name}__id", f"{name}__status", f"{name}__exp", f"{name}__mut"
        )

    def verdicts_column(self) -> Column:
        """Declaration-ordered array of declared verdict strings
        (ref: engine/language_types/verdicts.py:28-40)."""
        if not self.ctx.verdict_conditions:
            return F.array().cast("array<string>")
        parts = [F.when(cond, F.lit(v)) for cond, v in self.ctx.verdict_conditions]
        return F.filter(F.array(*parts), lambda x: x.isNotNull())

    def label_mutations_column(self) -> Column:
        """``"{EntityType}/{label}/{status}"`` strings
        (ref: engine/language_types/labels.py:44-66,
        engine/shared_constants.py:11-12)."""
        if not self.ctx.label_effects:
            return F.array().cast("array<string>")
        parts = [
            F.when(e["cond"], F.lit(f"{e['entity_type']}/{e['label']}/{e['status']}"))
            for e in self.ctx.label_effects
        ]
        return F.filter(F.array(*parts), lambda x: x.isNotNull())

    def label_effects_column(self) -> Column:
        """Typed label-effect rows for the stateful layer (engine
        extension; the reference ships these to LabelOutputSink,
        ref: worker/sinks/sink/output_sink.py:156-173)."""
        if not self.ctx.label_effects:
            return F.array().cast(LABEL_EFFECT_SCHEMA)
        parts = [
            F.when(
                e["cond"],
                F.struct(
                    F.lit(e["entity_type"]).alias("entity_type"),
                    e["entity_id"].alias("entity_id"),
                    F.lit(e["label"]).alias("label"),
                    F.lit(e["status"]).alias("status"),
                    F.lit(e["expires_after"]).cast("double").alias("expires_after"),
                ),
            )
            for e in self.ctx.label_effects
        ]
        return F.filter(F.array(*parts), lambda x: x.isNotNull())

    def atproto_list_column(self) -> Column:
        """``'did|list_uri'`` strings for fired AtprotoList effects —
        the 'atproto_list' custom extracted feature (ref:
        example_plugins/src/udfs/atproto/list.py:38-49)."""
        if not self.ctx.list_effects:
            return F.array().cast("array<string>")
        parts = [
            F.when(cond, entry) for cond, entry in self.ctx.list_effects
        ]
        return F.filter(F.array(*parts), lambda x: x.isNotNull())

    def sample_filter(
        self, df: DataFrame, sample_config: dict[str, int], sample_key: Optional[Column] = None
    ) -> tuple[DataFrame, Column]:
        """Per-action-name sampling (ref: worker/sinks/sink/rules_sink.py:47-70
        ActionSampler): config maps action_name -> sample_rate in [0, 100]
        where 100 = keep every event (disabled), 0 = drop every event, else
        drop with probability rate/100. The reference rolls ``randint``
        per action; this engine derives the roll deterministically from
        ``sample_key`` (md5 bucket in [0, 100)) so runs are replayable and
        oracle-checkable. Returns (filtered df, sample_rate column) — the
        rate column is NULL at 100, matching the reference's serialized
        ``sample_rate`` extra feature
        (ref: engine/executor/custom_extracted_features.py:84-96).
        """
        for name, rate in sample_config.items():
            if not (0 <= int(rate) <= 100):
                raise ValueError(f"sample_rate for {name!r} must be in [0, 100], got {rate}")
        b = self.bindings
        if sample_key is None:
            key_src = b.action_id if (b.action_id and b.action_id in df.columns) else b.data
            sample_key = F.col(key_src).cast("string")
        rate = F.coalesce(
            F.element_at(
                F.create_map(
                    *[x for name, r in sorted(sample_config.items()) for x in (F.lit(name), F.lit(int(r)))]
                ),
                F.col(b.action_name),
            ),
            F.lit(100),
        )
        # 16-bit md5 bucket mod 100: deterministic replayable roll.
        # Known slight bias: 65536 % 100 != 0, so buckets 0-35 occur
        # 656/65536 of the time vs 655/65536 for 36-99 — a <0.16%
        # relative skew vs the reference's uniform randint, accepted
        # for exact replayability.
        bucket = F.conv(F.substring(F.md5(sample_key.cast("binary")), 1, 4), 16, 10).cast("int") % 100
        # NULL sample keys have no identity to roll on. Policy: KEEP
        # (fail-open — a safety engine should not silently drop events
        # it cannot attribute), except rate=0 which is an explicit
        # drop-all. The reference's randint roll would drop rate% of
        # them nondeterministically; fail-open is the deterministic
        # superset (every row the reference could keep, we keep).
        keep = (rate == 100) | ((rate != 0) & F.coalesce(bucket >= rate, F.lit(True)))
        out = df.withColumn("__rate", rate).filter(keep)
        return out, F.when(F.col("__rate") < 100, F.col("__rate")).cast("int")

    def _join_cache(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one CacheGet as a key-VALUE lookup (Redis pairing,
        see functions/cache.py): union every Set statement's writes
        with the Get's probe rows into one narrow relation, shuffle
        once on the key value, take the latest write in the max-TTL
        event-time frame, expiry-check it against the probe's time
        (overwrite semantics: an expired latest write hides older
        ones), and join the values back by row id. Scale shape: one
        shuffle on the key + one join back — hot keys are one window
        partition, identical to any Redis-hot-key situation."""
        from pyspark.sql import Window as W

        name = spec["name"]
        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        if df.isStreaming:
            return self._join_cache_streaming(df, spec, sec)
        rid = "__cache_rid"
        if rid not in df.columns:
            # the rid must be IDENTICAL in every branch that re-reads
            # df (probes, per-Set writes, final join-back), but
            # monotonically_increasing_id depends on partition-local
            # row order, which upstream exchanges don't guarantee
            # across re-executions — persist pins one materialization
            # (released via CompiledRuleset.release_cache_state())
            df = df.withColumn(rid, F.monotonically_increasing_id()).persist()
            if not hasattr(self, "_cache_persists"):
                self._cache_persists = []
            self._cache_persists.append(df)
        cast = spec["cast"]
        probes = df.select(
            F.col(rid).alias("_crid"),
            spec["key_col"].cast("string").alias("_ck"),
            sec.alias("_cts"),
            F.lit(None).cast("long").alias("_cidx"),
            F.lit(None).cast("long").alias("_cexp"),
            F.lit(None).cast(cast).alias("_cv"),
            F.lit(0).alias("_cset"),
        )
        branches = [probes]
        max_ttl = 1
        for s in spec["sets"]:
            ttl = round(s["ttl"])
            max_ttl = max(max_ttl, ttl)
            set_gate = F.coalesce(
                s["gate"] if s["gate"] is not None else F.lit(True), F.lit(False)
            )
            branches.append(
                df.filter(set_gate & s["key_col"].isNotNull())
                .select(
                    F.lit(None).cast("long").alias("_crid"),
                    s["key_col"].cast("string").alias("_ck"),
                    sec.alias("_cts"),
                    F.lit(int(s["idx"])).cast("long").alias("_cidx"),
                    # last event-second at which this write is readable
                    (sec + F.lit(ttl - 1)).alias("_cexp"),
                    s["value_col"].cast(cast).alias("_cv"),
                    F.lit(1).alias("_cset"),
                )
            )
        rel = branches[0]
        for b_ in branches[1:]:
            rel = rel.unionByName(b_)
        w = W.partitionBy("_ck").orderBy("_cts").rangeBetween(-(max_ttl - 1), 0)
        best = F.max(
            F.when(
                F.col("_cset") == 1,
                F.struct(
                    F.col("_cts").alias("ts"),
                    F.col("_cidx").alias("i"),
                    F.col("_cexp").alias("exp"),
                    F.col("_cv").alias("v"),
                ),
            )
        ).over(w)
        looked_up = (
            rel.withColumn("_cbest", best)
            .filter(F.col("_cset") == 0)
            .select(
                "_crid",
                F.when(F.col("_cbest.exp") >= F.col("_cts"), F.col("_cbest.v")).alias("_cval"),
            )
        )
        df = df.join(looked_up, df[rid] == looked_up["_crid"], "left").drop("_crid")
        result = F.coalesce(F.col("_cval"), spec["default_col"])
        if spec["gate"] is not None:
            result = F.when(
                F.coalesce(spec["gate"], F.lit(False)), result
            ).otherwise(spec["default_col"])
        return df.select("*", result.alias(name)).drop("_cval")

    def _join_window_count(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one IncrementWindow/GetWindowCount. Batch frames:
        event-time range window (one shuffle on the key, whole-stage
        codegen). Streaming frames: applyInPandasWithState keyed by
        the key value — the state is the deque of in-window increment
        timestamps (the Redis zset, ref example_plugins/src/udfs/
        cache.py:161-227), carried across micro-batches; every input
        column passes through, so no stream-stream join-back is
        needed. Late rows within a batch are handled by sorting on
        event time; cross-batch late data follows watermark limits
        (counts are judged against the retained deque)."""
        name = spec["name"]
        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        win = int(spec["window_seconds"])
        cap = int(spec["cap"])
        gate = spec["gate"]
        if not df.isStreaming:
            from pyspark.sql import Window as W

            w = W.partitionBy(spec["key_col"]).orderBy(sec).rangeBetween(-(win - 1), 0)
            count = F.sum(F.when(spec["incremented"], 1).otherwise(0)).over(w)
            if cap:
                count = F.least(count, F.lit(cap))
            if gate is not None:
                count = F.when(F.coalesce(gate, F.lit(False)), count).otherwise(F.lit(0))
            return df.select("*", F.coalesce(count, F.lit(0)).cast("long").alias(name))

        import json as _json
        import os as _os

        import pandas as pd
        from pyspark.sql import types as T

        # KEY COALESCING: the state op groups by hash-BUCKET of the key,
        # not the key itself, and keeps a {key: deque} map per bucket.
        # applyInPandasWithState pays a fixed per-GROUP cost (Arrow
        # slicing + state round-trip, measured ~0.4 ms); with millions
        # of conversations that per-group tax IS the throughput ceiling
        # (benched 2.6x: ~20k -> ~52k turns/s on the window-counter
        # rule at 40k convs). Bucketing amortizes it ~(keys/buckets)x
        # while per-key semantics stay bit-identical: rows sort
        # (key, sec) and each key's segment folds against its own
        # deque, exactly as the per-key grouping did. State per bucket
        # is the sum of its keys' in-window deques — same total bytes,
        # fewer state-store rows. Skew: xxhash64 spreads keys
        # uniformly; a hot KEY still serializes (inherent), but a hot
        # key no longer adds a per-group tax to every other key.
        n_buckets = _state_bucket_count()
        aug = df.select(
            "*",
            spec["key_col"].cast("string").alias("__wc_key"),
            sec.alias("__wc_sec"),
            F.coalesce(spec["incremented"], F.lit(False)).alias("__wc_inc"),
            (
                F.coalesce(gate, F.lit(False)) if gate is not None else F.lit(True)
            ).alias("__wc_gate"),
            F.pmod(
                F.xxhash64(spec["key_col"].cast("string")), F.lit(n_buckets)
            ).cast("int").alias("__wc_bkt"),
        )
        out_schema = T.StructType(
            [f for f in aug.schema.fields if not f.name.startswith("__wc_")]
            + [T.StructField(name, T.LongType())]
        )
        passthrough_cols = [f.name for f in aug.schema.fields if not f.name.startswith("__wc_")]
        _NULL_KEY = "\x00"  # JSON map slot for a null key value

        def fold(pdf, smap):
            """One micro-batch's worth of one bucket: sort, fold each
            key segment against its carried deque, mutate ``smap`` in
            place, return the output frame. Shared VERBATIM by both
            state engines (applyInPandasWithState and the
            transformWithStateInPandas port below), so their outputs
            are identical by construction."""
            import numpy as np

            pdf = pdf.sort_values(["__wc_key", "__wc_sec"], kind="stable", na_position="last")
            keys = pdf["__wc_key"].to_numpy(dtype=object)
            sec_a = pdf["__wc_sec"].to_numpy(dtype="int64")
            inc_a = pdf["__wc_inc"].to_numpy(dtype=bool)
            gate_a = pdf["__wc_gate"].to_numpy(dtype=bool)
            counts = np.empty(len(sec_a), dtype="int64")
            # contiguous per-key segments of the (key, sec)-sorted batch
            change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(keys)]))
            for s, e in zip(starts, ends):
                mk = keys[s] if keys[s] is not None else _NULL_KEY
                entries = smap.get(mk, ())
                seg_sec = sec_a[s:e]
                # all increment timestamps visible this batch for this
                # key: carried deque + this batch's gated rows, sorted
                inc_ts = np.sort(
                    np.concatenate(
                        [np.asarray(entries, dtype="int64"), seg_sec[inc_a[s:e]]]
                    )
                )
                # count at row i = increments in [sec_i - win + 1,
                # sec_i]; a row's own increment sorts <= sec_i so it is
                # included, later rows' (> sec_i) are not — exactly the
                # sequential zadd-then-zcard semantics, vectorized
                hi = np.searchsorted(inc_ts, seg_sec, side="right")
                lo = np.searchsorted(inc_ts, seg_sec - win + 1, side="left")
                counts[s:e] = hi - lo
                keep = int(seg_sec.max()) - win + 1
                kept = inc_ts[np.searchsorted(inc_ts, keep, side="left"):]
                if len(kept):
                    smap[mk] = [int(x) for x in kept]
                elif mk in smap:
                    del smap[mk]  # empty deque = evict the slot
            if cap:
                counts = np.minimum(counts, cap)
            counts = np.where(gate_a, counts, 0)
            out = pdf[passthrough_cols].copy()
            out[name] = counts.astype("int64")
            return out

        def fn(key, pdf_iter, state):
            smap = _json.loads(state.get[0]) if state.exists else {}
            # Materialize the WHOLE group before sorting: pdf_iter
            # yields ~maxRecordsPerBatch-row Arrow chunks and a later
            # chunk may hold earlier timestamps — per-chunk sorting
            # with per-chunk state folds would make counts depend on
            # chunk boundaries and diverge from the batch path. One
            # bucket's micro-batch volume bounds the concat.
            chunks = [c for c in pdf_iter if len(c)]
            if not chunks:
                state.update((_json.dumps(smap),))
                return
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            out = fold(pdf, smap)
            state.update((_json.dumps(smap),))
            yield out

        # OSPREY_STATE_ENGINE=tws: the Spark 4 transformWithState
        # port of this family (survey §1.5's forward path — typed
        # state handles, TTL, RocksDB changelog checkpointing on a
        # real cluster). Same bucket grouping, same `fold`, state in
        # a named ValueState instead of the applyInPandasWithState
        # tuple; outputs are identical by construction and pinned by
        # tests/test_tws_window_counter.py. The TWS state-server
        # protocol needs the `protobuf` package (absent from this
        # container, like the Kafka jars) — on a standard cluster
        # image the flag works as-is.
        if _os.environ.get("OSPREY_STATE_ENGINE", "apply") == "tws":
            from pyspark.sql.streaming.stateful_processor import StatefulProcessor

            state_schema = T.StructType(
                [T.StructField("entries_json", T.StringType())]
            )

            class _WcProc(StatefulProcessor):
                def init(self, handle):
                    self._st = handle.getValueState("wc_entries", state_schema)

                def handleInputRows(self, key, rows, timerValues):
                    got = self._st.get() if self._st.exists() else None
                    smap = _json.loads(got[0]) if got is not None else {}
                    chunks = [c for c in rows if len(c)]
                    if chunks:
                        pdf = (
                            pd.concat(chunks, ignore_index=True)
                            if len(chunks) > 1
                            else chunks[0]
                        )
                        out = fold(pdf, smap)
                        self._st.update((_json.dumps(smap),))
                        yield out
                    else:
                        self._st.update((_json.dumps(smap),))

                def close(self):
                    pass

            return aug.groupBy("__wc_bkt").transformWithStateInPandas(
                _WcProc(),
                outputStructType=out_schema,
                outputMode="append",
                timeMode="None",
            )

        return aug.groupBy("__wc_bkt").applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=T.StructType([T.StructField("entries_json", T.StringType())]),
            outputMode="append",
            timeoutConf="NoTimeout",
        )

    def _join_window_distinct(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one GetWindowDistinct on a BATCH frame: distinct
        registered values per key in the trailing event-time window =
        size(collect_set) over a range window — one shuffle on the
        key, set state bounded by in-window distinct values. Gated-off
        and NULL values never enter the set (collect_set drops
        nulls). Streaming frames route through the fused state pass
        (apply() pending machinery) — there is deliberately no
        standalone streaming resolver to maintain."""
        from pyspark.sql import Window as W

        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        win = int(spec["window_seconds"])
        val = spec["value_col"]
        if spec["gate"] is not None:
            val = F.when(F.coalesce(spec["gate"], F.lit(False)), val)
        w = W.partitionBy(spec["key_col"]).orderBy(sec).rangeBetween(-(win - 1), 0)
        count = F.size(F.collect_set(val).over(w))
        return df.select("*", count.cast("long").alias(spec["name"]))

    def _join_unique_count(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one GetUniqueCount on a BATCH frame: lifetime
        distinct registered values per key = size(collect_set) over
        an UNBOUNDED-preceding range window — one shuffle on the key,
        set state bounded by the key's distinct values. A positive
        ``cap`` clamps with least() AFTER the exact count (the
        streaming fold stops tracking at cap, which yields the
        identical clamped value — see the fused fold). Streaming
        frames route through the fused state pass."""
        from pyspark.sql import Window as W

        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        val = spec["value_col"]
        if spec["gate"] is not None:
            val = F.when(F.coalesce(spec["gate"], F.lit(False)), val)
        w = W.partitionBy(spec["key_col"]).orderBy(sec).rangeBetween(
            W.unboundedPreceding, 0
        )
        count = F.size(F.collect_set(val).over(w)).cast("long")
        if spec["cap"]:
            count = F.least(count, F.lit(int(spec["cap"])).cast("long"))
        return df.select("*", count.alias(spec["name"]))

    def _join_window_sum(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one GetWindowSum on a BATCH frame: sum of the
        registered long amounts per key in the trailing event-time
        window = sum over a range window — one shuffle on the key.
        Gated-off events contribute 0; the empty window coalesces to
        0. Streaming frames route through the fused state pass — no
        standalone streaming resolver."""
        from pyspark.sql import Window as W

        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        win = int(spec["window_seconds"])
        val = spec["value_col"]
        if spec["gate"] is not None:
            val = F.when(F.coalesce(spec["gate"], F.lit(False)), val).otherwise(
                F.lit(0)
            )
        w = W.partitionBy(spec["key_col"]).orderBy(sec).rangeBetween(-(win - 1), 0)
        total = F.coalesce(F.sum(val).over(w), F.lit(0))
        return df.select("*", total.cast("long").alias(spec["name"]))

    def _join_decay_score(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one GetDecayScore on a BATCH frame: the decayed
        integer sum of every same-key registration at or before this
        row's second. collect_list over the UNBOUNDED range window
        (the GetUniqueCount window class — per-row cost bounded by
        key occupancy, conversations not corpus), then a pure-JVM HOF
        fold: weight = 2^20 >> bucket_age via a 21-entry literal
        array lookup (no float anywhere). Gated-off events register
        amount 0. Streaming frames route through the fused state
        pass."""
        from pyspark.sql import Window as W

        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        h = int(spec["halflife_s"])
        amt = spec["value_col"]
        if spec["gate"] is not None:
            amt = F.when(F.coalesce(spec["gate"], F.lit(False)), amt).otherwise(
                F.lit(0)
            )
        bkt = F.floor(sec / F.lit(h)).cast("long")
        w = (
            W.partitionBy(spec["key_col"])
            .orderBy(sec)
            .rangeBetween(W.unboundedPreceding, 0)
        )
        entries = F.collect_list(
            F.struct(bkt.alias("b"), amt.cast("long").alias("a"))
        ).over(w)
        # weights[d+1] = 2^20 >> d for d in 0..21; entry 22 is the
        # exact zero (2^20 >> 21), and the index clamp keeps every
        # lookup in bounds under ANSI element_at
        weights = F.array(*[F.lit((1 << 20) >> d) for d in range(22)])
        cur_b = bkt
        score = F.aggregate(
            entries,
            F.lit(0).cast("long"),
            lambda acc, e: acc
            + e["a"]
            * F.element_at(
                weights,
                (F.least(F.lit(21), cur_b - e["b"]) + 1).cast("int"),
            ),
        )
        return df.select("*", score.cast("long").alias(spec["name"]))

    def _join_transition_entropy(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one GetTransitionEntropy on a BATCH frame via the
        TELESCOPED two-window formulation: the per-pair running count
        c (a (key, pair)-partitioned rows window) turns each row into
        the exact-quantized delta ``r(c·ln c) − r((c−1)·ln(c−1))``,
        whose key-running sum telescopes to ``Σ_pairs r(c·ln c)`` at
        every row — so the running entropy needs NO per-row prefix
        scan and no map state: two shuffles (key+pair, then key), all
        JVM expressions, O(1) per row. First event of a key (no
        transition yet) reads 0.0."""
        from pyspark.sql import Window as W

        qf = 1e9
        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        order_cols = [sec] + (
            [spec["order_col"]] if spec["order_col"] is not None else []
        )
        name = spec["name"]
        p, d, v = f"{name}_p", f"{name}_d", f"{name}_v"
        sym = spec["state_col"]
        w_lag = W.partitionBy(spec["key_col"]).orderBy(*order_cols)
        prev = F.lag(sym).over(w_lag)
        pair = F.when(prev.isNotNull(), F.concat_ws("\x01", prev, sym))
        df1 = df.select("*", pair.alias(p))
        w_pair = (
            W.partitionBy(spec["key_col"], F.col(p))
            .orderBy(*order_cols)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        c = F.count(F.col(p)).over(w_pair)
        cd = c.cast("double")
        r1 = F.round(cd * F.log(cd) * F.lit(qf), 0).cast("long")
        c0d = (c - 1).cast("double")
        r0 = F.when(
            c >= 2, F.round(c0d * F.log(c0d) * F.lit(qf), 0).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        delta = F.when(F.col(p).isNotNull(), r1 - r0).otherwise(
            F.lit(0).cast("long")
        )
        df2 = df1.select(
            "*",
            delta.alias(d),
            F.col(p).isNotNull().cast("long").alias(v),
        )
        w_key = (
            W.partitionBy(spec["key_col"])
            .orderBy(*order_cols)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        s_run = F.sum(F.col(d)).over(w_key)
        n_run = F.sum(F.col(v)).over(w_key)
        nd = n_run.cast("double")
        # the feature is ROUNDED to 6 decimals by contract: JVM
        # Math.log and CPython/libm log differ by 1 ulp on some
        # inputs (measured: log(3.0)), so raw doubles cannot be
        # equal across the batch (JVM) and streaming (Python) paths;
        # 6-digit rounding absorbs that noise — the same absorption
        # every ln-using DuckDB oracle in this repo relies on.
        ent = F.when(
            n_run >= 1,
            F.round(
                F.log(nd) - s_run.cast("double") / (F.lit(qf) * nd), 6
            ),
        ).otherwise(F.lit(0.0))
        return df2.select("*", ent.alias(name)).drop(p, d, v)

    def _join_seen_before(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one SeenBefore on a BATCH frame: a conditional
        registration count over a (key, value)-partitioned RANGE
        window to the current second; a registering row needs >= 2
        (itself included), a non-registering reader >= 1 — both
        tie-order independent. One shuffle on (key, value); NULL
        values read False (their window partition is the NULL-value
        group, but the threshold comparison is nulled out below).
        Streaming frames route through the fused state pass."""
        from pyspark.sql import Window as W

        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        val = spec["value_col"]
        registers = val.isNotNull()
        if spec["gate"] is not None:
            registers = registers & F.coalesce(spec["gate"], F.lit(False))
        w = (
            W.partitionBy(spec["key_col"], val)
            .orderBy(sec)
            .rangeBetween(W.unboundedPreceding, 0)
        )
        cnt = F.count(F.when(registers, F.lit(1))).over(w)
        thresh = F.when(registers, F.lit(2)).otherwise(F.lit(1))
        seen = F.when(val.isNull(), F.lit(False)).otherwise(cnt >= thresh)
        return df.select("*", seen.alias(spec["name"]))

    def _join_window_minmax(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one GetWindowMax/Min on a BATCH frame: max (or
        min) of the registered long values per key in the trailing
        event-time window = max/min over a range window — one shuffle
        on the key. Gated-off and NULL values never register; an
        empty window yields NULL (not 0 — a real 0 must stay
        distinguishable). Streaming frames route through the fused
        state pass — no standalone streaming resolver."""
        from pyspark.sql import Window as W

        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        win = int(spec["window_seconds"])
        val = spec["value_col"]
        if spec["gate"] is not None:
            val = F.when(F.coalesce(spec["gate"], F.lit(False)), val)
        w = W.partitionBy(spec["key_col"]).orderBy(sec).rangeBetween(-(win - 1), 0)
        agg = F.max(val) if spec["mode"] > 0 else F.min(val)
        return df.select("*", agg.over(w).cast("long").alias(spec["name"]))

    def _join_rate_limit(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one RateLimit on a BATCH frame. The token bucket's
        recurrence (consumption depends on prior ALLOW decisions) has
        no window-function form, so: project a NARROW (rid, key, sec,
        order) relation, group it by a 1024-way hash bucket of the
        key (the state ops' coalescing discipline — per-group Arrow
        overhead amortizes across keys), fold each key's rows in
        (sec, order) order inside one applyInPandas pass, and join
        the boolean back by row id. Only 4 small columns ever cross
        the Arrow boundary — the wide feature frame stays JVM-side.
        Streaming frames route through the fused state pass carrying
        [tokens_units, last_sec] per key."""
        import os as _os

        import pandas as pd
        from pyspark.sql import types as T

        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        if df.isStreaming:  # pragma: no cover — apply() routes to fused
            raise SmlValidationError(
                "RateLimit on a streaming frame must resolve through the "
                "fused state pass"
            )
        rid = "__rl_rid"
        n_buckets = _state_bucket_count()
        # same rid discipline as _join_cache: pin one materialization
        df = df.withColumn(rid, F.monotonically_increasing_id()).persist()
        if not hasattr(self, "_cache_persists"):
            self._cache_persists = []
        self._cache_persists.append(df)
        ord_col = (
            spec["order_col"].cast("double")
            if spec["order_col"] is not None
            else F.lit(0.0)
        )
        narrow = df.select(
            F.col(rid).alias("_rlid"),
            spec["key_col"].cast("string").alias("_rlk"),
            sec.alias("_rls"),
            ord_col.alias("_rlo"),
            F.pmod(F.xxhash64(spec["key_col"].cast("string")), F.lit(n_buckets))
            .cast("int")
            .alias("_rlb"),
        )
        rate, cap, cost = spec["rate"], spec["cap"], spec["cost"]

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            pdf = pdf.sort_values(
                ["_rlk", "_rls", "_rlo"], kind="stable", na_position="last"
            )
            keys = pdf["_rlk"].to_numpy(dtype=object)
            secs = pdf["_rls"].to_numpy(dtype="int64")
            out = np.zeros(len(pdf), dtype=bool)
            tokens = last = None
            prev_key = object()
            for i in range(len(pdf)):
                k = keys[i]
                if k != prev_key:
                    tokens, last, prev_key = cap, secs[i], k
                tokens = min(cap, tokens + rate * (secs[i] - last))
                last = secs[i]
                if tokens >= cost:
                    tokens -= cost
                    out[i] = True
            return pd.DataFrame({"_rlid": pdf["_rlid"], "_rlv": out})

        res = narrow.groupBy("_rlb").applyInPandas(
            fold,
            T.StructType(
                [
                    T.StructField("_rlid", T.LongType()),
                    T.StructField("_rlv", T.BooleanType()),
                ]
            ),
        )
        return (
            df.join(res, F.col(rid) == F.col("_rlid"), "left")
            .drop("_rlid", rid)
            .withColumnRenamed("_rlv", spec["name"])
        )

    def _join_key_age(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one GetKeyAge on a BATCH frame: seconds since the
        key's first event = ``sec - min(sec)`` over a RANGE window to
        the current second — one shuffle on the key, whole-stage
        codegen. The min depends only on event times, so equal-second
        ties cannot reorder the result. Streaming frames route
        through the fused state pass carrying one long per key."""
        from pyspark.sql import Window as W

        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        w = (
            W.partitionBy(spec["key_col"])
            .orderBy(sec)
            .rangeBetween(W.unboundedPreceding, 0)
        )
        age = sec - F.min(sec).over(w)
        return df.select("*", age.cast("long").alias(spec["name"]))

    def _join_burstiness(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one GetBurstiness on a BATCH frame: per-key gap
        moments over a RANGE window to the current second. The lag
        that extracts each gap is tie-order dependent row-by-row, but
        a tie group's gap MULTISET is invariant (first row carries
        sec-prev, the rest carry 0) and the RANGE aggregate always
        sees the whole group, so every row's B is tie-independent.
        Moments are exact longs; B = (sigma-mu)/(sigma+mu) with the
        variance clamped at 0 (float dust) and ROUNDED to 6 by
        contract (the tent family's batch/stream equality contract).
        Keys with no gaps yet read the 0.0 Poisson-neutral default.
        Streaming frames route through the fused state pass carrying
        four ints per key."""
        from pyspark.sql import Window as W

        name = spec["name"]
        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        g, sc = f"__bs_{name}_g", f"__bs_{name}_sec"
        tmp = df.select(
            "*",
            sec.alias(sc),
            spec["key_col"].cast("string").alias(f"__bs_{name}_key"),
        )
        w_rows = W.partitionBy(f"__bs_{name}_key").orderBy(sc)
        tmp = tmp.select(
            "*", (F.col(sc) - F.lag(sc).over(w_rows)).alias(g)
        )
        w_range = (
            W.partitionBy(f"__bs_{name}_key")
            .orderBy(sc)
            .rangeBetween(W.unboundedPreceding, 0)
        )
        n_run = F.count(F.col(g)).over(w_range)
        s_run = F.sum(F.col(g)).over(w_range)
        q_run = F.sum(F.col(g) * F.col(g)).over(w_range)
        nd = n_run.cast("double")
        mu = s_run.cast("double") / nd
        var = q_run.cast("double") / nd - mu * mu
        sig = F.sqrt(F.greatest(F.lit(0.0), var))
        den = sig + mu
        b = F.when(
            (n_run >= 1) & (den > 0), F.round((sig - mu) / den, 6)
        ).otherwise(F.lit(0.0))
        return tmp.select("*", b.alias(name)).drop(
            g, sc, f"__bs_{name}_key"
        )

    def _join_session_count(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one GetSessionCount on a BATCH frame: lag-gap
        session break → running-sum session id → RANGE count within
        (key, session id). Both window stages cluster by the key (the
        second's (key, session) requirement is satisfied by the
        key-hash exchange), so the whole resolver is ONE shuffle +
        one sort. Tie rows (equal sec) always land in one session and
        RANGE counts the full tie group, so the result is independent
        of Spark's tie order. Streaming frames route through the
        fused state pass — no standalone streaming resolver."""
        from pyspark.sql import Window as W

        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        gap = int(spec["gap_seconds"])
        tmp = df.select(
            "*",
            spec["key_col"].cast("string").alias("__ss_key"),
            sec.alias("__ss_sec"),
        )
        w_ord = W.partitionBy("__ss_key").orderBy("__ss_sec")
        prev = F.lag("__ss_sec").over(w_ord)
        brk = F.when(
            prev.isNull() | ((F.col("__ss_sec") - prev) > F.lit(gap)), F.lit(1)
        ).otherwise(F.lit(0))
        tmp = tmp.select("*", brk.alias("__ss_brk"))
        tmp = tmp.select(
            "*",
            F.sum("__ss_brk")
            .over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("__ss_id"),
        )
        w_cnt = (
            W.partitionBy("__ss_key", "__ss_id")
            .orderBy("__ss_sec")
            .rangeBetween(W.unboundedPreceding, W.currentRow)
        )
        return tmp.select(
            "*", F.count(F.lit(1)).over(w_cnt).cast("long").alias(spec["name"])
        ).drop("__ss_key", "__ss_sec", "__ss_brk", "__ss_id")

    def _join_last_value(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one GetLastValue on a BATCH frame: ``lag(value)``
        over the key partitioned by (event time, order) — one key
        shuffle, whole-stage codegen, no self-join. Streaming frames
        route through the fused state pass carrying one string per
        key."""
        from pyspark.sql import Window as W

        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        order_cols = [sec] + (
            [spec["order_col"]] if spec["order_col"] is not None else []
        )
        w = W.partitionBy(spec["key_col"]).orderBy(*order_cols)
        return df.select(
            "*", F.lag(spec["value_col"]).over(w).alias(spec["name"])
        )

    def _join_seq_match(self, df: DataFrame, spec: dict) -> DataFrame:
        """Resolve one SequenceMatches. Batch frames: collect the
        rolling last-K symbol window with a rows-between window (one
        shuffle on the key, whole-stage codegen, JVM `rlike`).
        Streaming frames: key-coalesced applyInPandasWithState whose
        per-key state is the ≤K-char symbol suffix — the reference's
        tool_seq shape — carried across micro-batches, so a pattern
        completed by a later batch's event matches when that event
        arrives. Within a batch rows apply in (event time, order)
        order; the suffix semantics make streaming == batch whenever
        (event time, order) is a total order per key (equivalence- and
        restart-tested)."""
        name = spec["name"]
        k = int(spec["last_k"])
        pattern = spec["pattern"]
        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        order_cols = [sec] + (
            [spec["order_col"]] if spec["order_col"] is not None else []
        )
        if not df.isStreaming:
            from pyspark.sql import Window as W

            w = (
                W.partitionBy(spec["key_col"])
                .orderBy(*order_cols)
                .rowsBetween(-(k - 1), 0)
            )
            suffix = F.array_join(F.collect_list(spec["symbol_col"]).over(w), "")
            matched = F.coalesce(suffix.rlike(pattern), F.lit(False))
            return df.select("*", matched.alias(name))

        import json as _json
        import os as _os
        import re as _re

        import pandas as pd
        from pyspark.sql import types as T

        rx = _re.compile(pattern)
        n_buckets = _state_bucket_count()
        aug = df.select(
            "*",
            spec["key_col"].cast("string").alias("__sq_key"),
            sec.alias("__sq_sec"),
            (
                spec["order_col"].cast("double")
                if spec["order_col"] is not None
                else F.lit(0.0)
            ).alias("__sq_ord"),
            spec["symbol_col"].alias("__sq_sym"),
            F.pmod(F.xxhash64(spec["key_col"].cast("string")), F.lit(n_buckets))
            .cast("int")
            .alias("__sq_bkt"),
        )
        out_schema = T.StructType(
            [f for f in aug.schema.fields if not f.name.startswith("__sq_")]
            + [T.StructField(name, T.BooleanType())]
        )
        passthrough_cols = [
            f.name for f in aug.schema.fields if not f.name.startswith("__sq_")
        ]
        _NULL_KEY = "\x00"

        def fn(key, pdf_iter, state):
            smap = _json.loads(state.get[0]) if state.exists else {}
            chunks = [c for c in pdf_iter if len(c)]
            if not chunks:
                state.update((_json.dumps(smap),))
                return
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(
                ["__sq_key", "__sq_sec", "__sq_ord"], kind="stable", na_position="last"
            )
            keys = pdf["__sq_key"].to_numpy(dtype=object)
            syms = pdf["__sq_sym"].to_numpy(dtype=object)
            matched = [False] * len(keys)
            prev = None
            suffix = ""
            for i, (mk_raw, ch) in enumerate(zip(keys, syms)):
                mk = mk_raw if mk_raw is not None else _NULL_KEY
                if mk != prev:
                    if prev is not None:
                        smap[prev] = suffix
                    suffix = smap.get(mk, "")
                    prev = mk
                suffix = (suffix + ch)[-k:]
                matched[i] = rx.search(suffix) is not None
            if prev is not None:
                smap[prev] = suffix
            out = pdf[passthrough_cols].copy()
            out[name] = matched
            state.update((_json.dumps(smap),))
            yield out

        return aug.groupBy("__sq_bkt").applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=T.StructType(
                [T.StructField("suffix_json", T.StringType())]
            ),
            outputMode="append",
            timeoutConf="NoTimeout",
        )

    def _join_fused_state(
        self, df: DataFrame, fspecs: list[tuple[str, dict]]
    ) -> DataFrame:
        """Resolve a RUN of streaming state ops that share one key
        expression in a SINGLE applyInPandasWithState pass — N
        stateful mechanisms, ONE shuffle and ONE state-store
        round-trip per micro-batch instead of N of each.

        This is not merely an optimization: Spark permits exactly ONE
        applyInPandasWithState per streaming query
        (UnsupportedOperationChecker rejects chains), so a rule with
        a 1-minute counter, a 1-hour counter and a tool-sequence CEP
        pattern — all keyed by the same conversation entity, the
        common transcript shape — could not stream at all as
        sequential passes. Fusion folds all per-key mechanisms
        against one composite state (``[state_op0, state_op1, ...]``
        per bucket) inside one sorted pass over the group, making
        multi-mechanism stateful rules streamable AND paying one
        exchange + one store pass where a hypothetical chain would
        pay N. Groups fusion cannot merge (different keys, inter-op
        dependencies, cache ops) fail compile with an actionable
        split, not a deep Spark error.

        Semantics are pinned to the standalone resolvers: the fused
        sort key (key, sec, ord) refines the window counter's
        (key, sec) only among equal-timestamp rows, which cannot
        change a range-window count (counts compare ``sec`` values,
        not row positions); the sequence suffix fold sees the exact
        standalone order. Equivalence is regression-tested against
        the sequential (unfused) outputs AND the batch plans.

        Callers guarantee: every spec's key has the same column-node
        string, all seq specs share one order expression, and no
        spec's inputs reference another fused op's output (the run
        detector in apply() flushes otherwise).
        """
        import json as _json
        import os as _os
        import re as _re

        import pandas as pd
        from pyspark.sql import types as T

        sec = F.col(self.bindings.timestamp).cast("timestamp").cast("long")
        n_buckets = _state_bucket_count()
        key_col = fspecs[0][1]["key_col"]

        ord_expr = F.lit(0.0)
        for fam, sp in fspecs:
            if fam in ("seq", "last", "rl", "tent") and sp["order_col"] is not None:
                ord_expr = sp["order_col"].cast("double")
                break

        proj: list = [
            "*",
            key_col.cast("string").alias("__fs_key"),
            sec.alias("__fs_sec"),
            ord_expr.alias("__fs_ord"),
            F.pmod(F.xxhash64(key_col.cast("string")), F.lit(n_buckets))
            .cast("int")
            .alias("__fs_bkt"),
        ]
        metas: list[dict] = []
        out_fields: list = []
        for i, (fam, sp) in enumerate(fspecs):
            if fam == "window":
                gate = sp["gate"]
                proj.append(
                    F.coalesce(sp["incremented"], F.lit(False)).alias(f"__fs{i}_inc")
                )
                proj.append(
                    (
                        F.coalesce(gate, F.lit(False)) if gate is not None else F.lit(True)
                    ).alias(f"__fs{i}_gate")
                )
                metas.append(
                    {
                        "fam": "window",
                        "name": sp["name"],
                        "win": int(sp["window_seconds"]),
                        "cap": int(sp["cap"]),
                        "i": i,
                    }
                )
                out_fields.append(T.StructField(sp["name"], T.LongType()))
            elif fam == "seq":
                proj.append(sp["symbol_col"].alias(f"__fs{i}_sym"))
                metas.append(
                    {
                        "fam": "seq",
                        "name": sp["name"],
                        "k": int(sp["last_k"]),
                        "rx": _re.compile(sp["pattern"]),
                        "i": i,
                    }
                )
                out_fields.append(T.StructField(sp["name"], T.BooleanType()))
            elif fam == "wdistinct":
                gate = sp["gate"]
                proj.append(sp["value_col"].alias(f"__fs{i}_val"))
                proj.append(
                    (
                        F.coalesce(gate, F.lit(False)) if gate is not None else F.lit(True)
                    ).alias(f"__fs{i}_vg")
                )
                metas.append(
                    {
                        "fam": "wdistinct",
                        "name": sp["name"],
                        "win": int(sp["window_seconds"]),
                        "i": i,
                    }
                )
                out_fields.append(T.StructField(sp["name"], T.LongType()))
            elif fam == "seen":
                gate = sp["gate"]
                proj.append(sp["value_col"].alias(f"__fs{i}_sv"))
                proj.append(
                    (
                        F.coalesce(gate, F.lit(False)) if gate is not None else F.lit(True)
                    ).alias(f"__fs{i}_sg")
                )
                metas.append({"fam": "seen", "name": sp["name"], "i": i})
                out_fields.append(T.StructField(sp["name"], T.BooleanType()))
            elif fam == "wminmax":
                gate = sp["gate"]
                proj.append(sp["value_col"].alias(f"__fs{i}_mv"))
                proj.append(
                    (
                        F.coalesce(gate, F.lit(False)) if gate is not None else F.lit(True)
                    ).alias(f"__fs{i}_mg")
                )
                metas.append(
                    {
                        "fam": "wminmax",
                        "name": sp["name"],
                        "win": int(sp["window_seconds"]),
                        "mode": int(sp["mode"]),
                        "i": i,
                    }
                )
                out_fields.append(T.StructField(sp["name"], T.LongType()))
            elif fam == "unique":
                gate = sp["gate"]
                proj.append(sp["value_col"].alias(f"__fs{i}_uv"))
                proj.append(
                    (
                        F.coalesce(gate, F.lit(False)) if gate is not None else F.lit(True)
                    ).alias(f"__fs{i}_ug")
                )
                metas.append(
                    {
                        "fam": "unique",
                        "name": sp["name"],
                        "cap": int(sp["cap"]),
                        "i": i,
                    }
                )
                out_fields.append(T.StructField(sp["name"], T.LongType()))
            elif fam == "sess":
                metas.append(
                    {
                        "fam": "sess",
                        "name": sp["name"],
                        "gap": int(sp["gap_seconds"]),
                        "i": i,
                    }
                )
                out_fields.append(T.StructField(sp["name"], T.LongType()))
            elif fam == "last":
                proj.append(sp["value_col"].alias(f"__fs{i}_lv"))
                metas.append({"fam": "last", "name": sp["name"], "i": i})
                out_fields.append(T.StructField(sp["name"], T.StringType()))
            elif fam == "age":
                metas.append({"fam": "age", "name": sp["name"], "i": i})
                out_fields.append(T.StructField(sp["name"], T.LongType()))
            elif fam == "burst":
                metas.append({"fam": "burst", "name": sp["name"], "i": i})
                out_fields.append(T.StructField(sp["name"], T.DoubleType()))
            elif fam == "rl":
                metas.append(
                    {
                        "fam": "rl",
                        "name": sp["name"],
                        "rate": int(sp["rate"]),
                        "cap": int(sp["cap"]),
                        "cost": int(sp["cost"]),
                        "i": i,
                    }
                )
                out_fields.append(T.StructField(sp["name"], T.BooleanType()))
            elif fam == "wsum":
                gate = sp["gate"]
                amt = sp["value_col"]
                if gate is not None:
                    amt = F.when(F.coalesce(gate, F.lit(False)), amt).otherwise(
                        F.lit(0)
                    )
                proj.append(amt.cast("long").alias(f"__fs{i}_amt"))
                metas.append(
                    {
                        "fam": "wsum",
                        "name": sp["name"],
                        "win": int(sp["window_seconds"]),
                        "i": i,
                    }
                )
                out_fields.append(T.StructField(sp["name"], T.LongType()))
            elif fam == "tent":
                proj.append(sp["state_col"].alias(f"__fs{i}_tsym"))
                metas.append({"fam": "tent", "name": sp["name"], "i": i})
                out_fields.append(T.StructField(sp["name"], T.DoubleType()))
            elif fam == "decay":
                gate = sp["gate"]
                amt = sp["value_col"]
                if gate is not None:
                    amt = F.when(F.coalesce(gate, F.lit(False)), amt).otherwise(
                        F.lit(0)
                    )
                proj.append(amt.cast("long").alias(f"__fs{i}_dam"))
                metas.append(
                    {
                        "fam": "decay",
                        "name": sp["name"],
                        "h": int(sp["halflife_s"]),
                        "i": i,
                    }
                )
                out_fields.append(T.StructField(sp["name"], T.LongType()))
            else:  # cache — emits a RAW lookup column "__fcv_{i}";
                # default/gate post-processing happens JVM-side in the
                # caller (mirrors _join_cache_streaming's tail)
                sets_meta = []
                for j, s in enumerate(sp["sets"]):
                    set_gate = (
                        F.coalesce(s["gate"], F.lit(False))
                        if s["gate"] is not None
                        else F.lit(True)
                    )
                    proj.append(set_gate.alias(f"__fs{i}s{j}_g"))
                    proj.append(
                        s["value_col"].cast(sp["cast"]).alias(f"__fs{i}s{j}_v")
                    )
                    sets_meta.append(
                        {"j": j, "idx": int(s["idx"]), "ttl": round(s["ttl"])}
                    )
                metas.append(
                    {"fam": "cache", "name": sp["name"], "sets": sets_meta, "i": i}
                )
                out_fields.append(
                    T.StructField(f"__fcv_{i}", T._parse_datatype_string(sp["cast"]))
                )

        aug = df.select(*proj)
        passthrough_cols = [
            f.name for f in aug.schema.fields if not f.name.startswith("__fs")
        ]
        out_schema = T.StructType(
            [f for f in aug.schema.fields if not f.name.startswith("__fs")] + out_fields
        )
        _NULL_KEY = "\x00"
        n_ops = len(metas)

        def fn(key, pdf_iter, state):
            import numpy as np

            states = _json.loads(state.get[0]) if state.exists else [{} for _ in range(n_ops)]
            chunks = [c for c in pdf_iter if len(c)]
            if not chunks:
                state.update((_json.dumps(states),))
                return
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(
                ["__fs_key", "__fs_sec", "__fs_ord"], kind="stable", na_position="last"
            )
            n = len(pdf)
            keys = pdf["__fs_key"].to_numpy(dtype=object)
            sec_a = pdf["__fs_sec"].to_numpy(dtype="int64")
            op_in: list[dict] = []
            outs: list = []
            for m in metas:
                if m["fam"] == "window":
                    op_in.append(
                        {
                            "inc": pdf[f"__fs{m['i']}_inc"].to_numpy(dtype=bool),
                            "gate": pdf[f"__fs{m['i']}_gate"].to_numpy(dtype=bool),
                        }
                    )
                    outs.append(np.empty(n, dtype="int64"))
                elif m["fam"] == "seq":
                    op_in.append({"sym": pdf[f"__fs{m['i']}_sym"].to_numpy(dtype=object)})
                    outs.append(np.zeros(n, dtype=bool))
                elif m["fam"] == "wdistinct":
                    op_in.append(
                        {
                            "val": pdf[f"__fs{m['i']}_val"].to_numpy(dtype=object),
                            "vg": pdf[f"__fs{m['i']}_vg"].to_numpy(dtype=bool),
                        }
                    )
                    outs.append(np.empty(n, dtype="int64"))
                elif m["fam"] == "unique":
                    op_in.append(
                        {
                            "val": pdf[f"__fs{m['i']}_uv"].to_numpy(dtype=object),
                            "vg": pdf[f"__fs{m['i']}_ug"].to_numpy(dtype=bool),
                        }
                    )
                    outs.append(np.empty(n, dtype="int64"))
                elif m["fam"] == "wminmax":
                    op_in.append(
                        {
                            # object dtype keeps NULL values visible
                            "val": pdf[f"__fs{m['i']}_mv"].to_numpy(dtype=object),
                            "vg": pdf[f"__fs{m['i']}_mg"].to_numpy(dtype=bool),
                        }
                    )
                    outs.append(np.full(n, None, dtype=object))
                elif m["fam"] == "seen":
                    op_in.append(
                        {
                            "val": pdf[f"__fs{m['i']}_sv"].to_numpy(dtype=object),
                            "vg": pdf[f"__fs{m['i']}_sg"].to_numpy(dtype=bool),
                        }
                    )
                    outs.append(np.zeros(n, dtype=bool))
                elif m["fam"] == "sess":
                    op_in.append({})  # only needs (key, sec), already shared
                    outs.append(np.empty(n, dtype="int64"))
                elif m["fam"] == "last":
                    op_in.append(
                        {"val": pdf[f"__fs{m['i']}_lv"].to_numpy(dtype=object)}
                    )
                    outs.append(np.full(n, None, dtype=object))
                elif m["fam"] == "age":
                    op_in.append({})  # only needs (key, sec), already shared
                    outs.append(np.empty(n, dtype="int64"))
                elif m["fam"] == "burst":
                    op_in.append({})  # only needs (key, sec), already shared
                    outs.append(np.empty(n, dtype="float64"))
                elif m["fam"] == "rl":
                    op_in.append({})  # only needs (key, sec), already shared
                    outs.append(np.zeros(n, dtype=bool))
                elif m["fam"] == "wsum":
                    op_in.append(
                        {"amt": pdf[f"__fs{m['i']}_amt"].to_numpy(dtype="int64")}
                    )
                    outs.append(np.empty(n, dtype="int64"))
                elif m["fam"] == "tent":
                    op_in.append(
                        {"sym": pdf[f"__fs{m['i']}_tsym"].to_numpy(dtype=object)}
                    )
                    outs.append(np.empty(n, dtype="float64"))
                elif m["fam"] == "decay":
                    op_in.append(
                        {"amt": pdf[f"__fs{m['i']}_dam"].to_numpy(dtype="int64")}
                    )
                    outs.append(np.empty(n, dtype="int64"))
                else:  # cache
                    op_in.append(
                        {
                            "g": [
                                pdf[f"__fs{m['i']}s{s['j']}_g"].to_numpy(dtype=bool)
                                for s in m["sets"]
                            ],
                            "v": [
                                pdf[f"__fs{m['i']}s{s['j']}_v"].to_numpy(dtype=object)
                                for s in m["sets"]
                            ],
                        }
                    )
                    outs.append(np.full(n, None, dtype=object))
            change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [n]))
            for s, e in zip(starts, ends):
                mk = keys[s] if keys[s] is not None else _NULL_KEY
                seg_sec = sec_a[s:e]
                for m, inp, out_a, smap in zip(metas, op_in, outs, states):
                    if m["fam"] == "window":
                        win = m["win"]
                        entries = smap.get(mk, ())
                        inc_ts = np.sort(
                            np.concatenate(
                                [
                                    np.asarray(entries, dtype="int64"),
                                    seg_sec[inp["inc"][s:e]],
                                ]
                            )
                        )
                        hi = np.searchsorted(inc_ts, seg_sec, side="right")
                        lo = np.searchsorted(inc_ts, seg_sec - win + 1, side="left")
                        counts = hi - lo
                        if m["cap"]:
                            counts = np.minimum(counts, m["cap"])
                        out_a[s:e] = np.where(inp["gate"][s:e], counts, 0)
                        keep = int(seg_sec.max()) - win + 1
                        kept = inc_ts[np.searchsorted(inc_ts, keep, side="left"):]
                        if len(kept):
                            smap[mk] = [int(x) for x in kept]
                        elif mk in smap:
                            del smap[mk]
                    elif m["fam"] == "wdistinct":
                        # distinct registered values in the trailing
                        # window, judged like the batch range window:
                        # ALL visible same-key occurrences (carried
                        # deque + this whole segment) with ts in
                        # [sec_r - win + 1, sec_r] — including
                        # equal-timestamp occurrences from later rows,
                        # exactly what collect_set over RANGE sees.
                        win = m["win"]
                        occ = [tuple(o) for o in smap.get(mk, ())]
                        seg_sec = sec_a[s:e]
                        vals = inp["val"][s:e]
                        vgs = inp["vg"][s:e]
                        for j in range(e - s):
                            v = vals[j]
                            if vgs[j] and v is not None and not pd.isna(v):
                                occ.append((int(seg_sec[j]), v))
                        occ.sort(key=lambda o: o[0])
                        counts: dict = {}
                        distinct = 0
                        lo = hi = 0
                        seg_out = out_a[s:e]
                        for j in range(e - s):
                            t = int(seg_sec[j])
                            while hi < len(occ) and occ[hi][0] <= t:
                                v = occ[hi][1]
                                c = counts.get(v, 0)
                                if c == 0:
                                    distinct += 1
                                counts[v] = c + 1
                                hi += 1
                            floor_t = t - win + 1
                            while lo < hi and occ[lo][0] < floor_t:
                                v = occ[lo][1]
                                counts[v] -= 1
                                if counts[v] == 0:
                                    distinct -= 1
                                lo += 1
                            seg_out[j] = distinct
                        keep = int(seg_sec.max()) - win + 1
                        kept = [[t, v] for t, v in occ if t >= keep]
                        if kept:
                            smap[mk] = kept
                        elif mk in smap:
                            del smap[mk]
                    elif m["fam"] == "seen":
                        # repeated-content membership: per value, the
                        # TWO SMALLEST registration seconds (carried +
                        # this segment, min-merged — exact under late
                        # data). Row at t with value v: registrations
                        # of v with sec <= t, capped at 2; a
                        # registering row needs 2 (itself included), a
                        # reader 1 — tie-group inclusive either way.
                        pair = {
                            v: list(ss) for v, ss in smap.get(mk, ())
                        }  # value -> [s1] or [s1, s2], ascending
                        vals = inp["val"][s:e]
                        vgs = inp["vg"][s:e]
                        n_seg = e - s
                        events_s = []
                        for v, ss in pair.items():
                            for t0 in ss:
                                events_s.append((int(t0), v))
                        for j in range(n_seg):
                            v = vals[j]
                            if vgs[j] and v is not None and not pd.isna(v):
                                events_s.append((int(seg_sec[j]), str(v)))
                        events_s.sort()
                        # rebuild the two-smallest pairs from ALL events
                        merged: dict = {}
                        for t0, v in events_s:
                            lst = merged.setdefault(v, [])
                            if len(lst) < 2:
                                lst.append(t0)
                        counts_at: dict = {}
                        seg_out = out_a[s:e]
                        hi = 0
                        for j in range(n_seg):
                            t = int(seg_sec[j])
                            while hi < len(events_s) and events_s[hi][0] <= t:
                                v = events_s[hi][1]
                                c = counts_at.get(v, 0)
                                if c < 2:
                                    # only the two smallest count; later
                                    # duplicates of carried secs double-
                                    # count a registration, so consume
                                    # events from the MERGED pairs only
                                    if events_s[hi][0] in merged.get(v, ()):
                                        counts_at[v] = c + 1
                                        merged[v].remove(events_s[hi][0])
                                hi += 1
                            v = vals[j]
                            if v is None or pd.isna(v):
                                seg_out[j] = False
                            else:
                                sv = str(v)
                                reg = bool(vgs[j])
                                need = 2 if reg else 1
                                seg_out[j] = counts_at.get(sv, 0) >= need
                        # state: two smallest secs per value across
                        # carried + segment registrations
                        final_pairs: dict = {}
                        for t0, v in events_s:
                            lst = final_pairs.setdefault(v, [])
                            if len(lst) < 2:
                                lst.append(t0)
                        if final_pairs:
                            smap[mk] = sorted(
                                [v, ss] for v, ss in final_pairs.items()
                            )
                        elif mk in smap:
                            del smap[mk]
                    elif m["fam"] == "wminmax":
                        # trailing-window MAX/MIN, judged like the
                        # batch RANGE window: all visible same-key
                        # registrations with ts in [sec - win + 1,
                        # sec], equal-ts registrations from later rows
                        # included. Carried state is ALL in-window
                        # (sec, val) entries — an envelope prune is
                        # unsafe across batches (a late row's window
                        # may exclude the dominating later entry), so
                        # the monotonic deque is rebuilt per segment
                        # (O(n) amortized: each entry enters/leaves
                        # once) and only the time-expired entries drop
                        # from state, exactly like wsum.
                        win = m["win"]
                        mode = m["mode"]
                        entries = [tuple(o) for o in smap.get(mk, ())]
                        vals = inp["val"][s:e]
                        vgs = inp["vg"][s:e]
                        for j in range(e - s):
                            v = vals[j]
                            if vgs[j] and v is not None and not pd.isna(v):
                                entries.append((int(seg_sec[j]), int(v)))
                        entries.sort(key=lambda o: o[0])
                        dq: list = []  # (sec, mode*val), vals decreasing
                        head = 0
                        hi = 0
                        seg_out = out_a[s:e]
                        for j in range(e - s):
                            t = int(seg_sec[j])
                            while hi < len(entries) and entries[hi][0] <= t:
                                sv = mode * entries[hi][1]
                                while len(dq) > head and dq[-1][1] <= sv:
                                    dq.pop()
                                dq.append((entries[hi][0], sv))
                                hi += 1
                            floor_t = t - win + 1
                            while len(dq) > head and dq[head][0] < floor_t:
                                head += 1
                            seg_out[j] = (
                                mode * dq[head][1] if len(dq) > head else None
                            )
                        keep = int(seg_sec.max()) - win + 1
                        kept = [[t, v] for t, v in entries if t >= keep]
                        if kept:
                            smap[mk] = kept
                        elif mk in smap:
                            del smap[mk]
                    elif m["fam"] == "unique":
                        # lifetime distinct registered values, judged
                        # like the batch UNBOUNDED range window: every
                        # visible same-key registration with ts <= this
                        # row's second counts, INCLUDING equal-second
                        # later rows (tie-group inclusive, so the fold
                        # is tie-order independent). State carries each
                        # value's FIRST-SEEN second — a bare value set
                        # would overcount for LATE rows whose sec
                        # precedes a carried value's registration.
                        # cap>0 stops TRACKING once reached — exact for
                        # the clamped output: past cap both engines
                        # report cap forever (the count is monotone).
                        cap = m["cap"]
                        first = {v: int(t0) for v, t0 in smap.get(mk, ())}
                        vals = inp["val"][s:e]
                        vgs = inp["vg"][s:e]
                        n_seg = e - s
                        # merge carried first-seens with this segment's
                        # registrations into one sec-ordered event list
                        events_u = [(t0, v) for v, t0 in first.items()]
                        for j in range(n_seg):
                            v = vals[j]
                            if vgs[j] and v is not None and not pd.isna(v):
                                sv = str(v)
                                t_j = int(seg_sec[j])
                                if sv not in first or t_j < first[sv]:
                                    first[sv] = t_j
                                    events_u.append((t_j, sv))
                        events_u.sort()  # (sec, value): tie-deterministic
                        seen: set = set()
                        seg_out = out_a[s:e]
                        hi = 0
                        j = 0
                        while j < n_seg:
                            t = int(seg_sec[j])
                            while hi < len(events_u) and events_u[hi][0] <= t:
                                v = events_u[hi][1]
                                # count only the value's FIRST event
                                # (duplicates from a lowered first-seen
                                # are filtered by the dict check above)
                                if first.get(v) == events_u[hi][0] and (
                                    cap == 0 or len(seen) < cap
                                ):
                                    seen.add(v)
                                hi += 1
                            g = j
                            while g + 1 < n_seg and seg_sec[g + 1] == t:
                                g += 1
                            seg_out[j : g + 1] = len(seen)
                            j = g + 1
                        if cap:
                            # keep only the tracked (counted) values —
                            # the clamp makes extras irrelevant forever
                            kept_first = sorted(
                                first.items(), key=lambda kv: (kv[1], kv[0])
                            )[:cap]
                        else:
                            kept_first = sorted(first.items())
                        if kept_first:
                            smap[mk] = [[v, t0] for v, t0 in kept_first]
                        elif mk in smap:
                            del smap[mk]
                    elif m["fam"] == "sess":
                        # events in the current session, judged like
                        # the batch (key, session) RANGE count: a tie
                        # group (equal sec) shares a session and each
                        # tie row counts the whole group. Carried
                        # state [last_sec, open_count] continues the
                        # session when the segment's first event is
                        # within the gap.
                        gap = m["gap"]
                        st = smap.get(mk)  # [last_sec, open_count]
                        n_seg = e - s
                        seg_out = out_a[s:e]
                        starts_ses = [0]
                        bases = [
                            st[1]
                            if st is not None and int(seg_sec[0]) - st[0] <= gap
                            else 0
                        ]
                        for j in range(1, n_seg):
                            if int(seg_sec[j]) - int(seg_sec[j - 1]) > gap:
                                starts_ses.append(j)
                                bases.append(0)
                        si = 0
                        j = 0
                        while j < n_seg:
                            # advance to this row's session
                            while (
                                si + 1 < len(starts_ses)
                                and starts_ses[si + 1] <= j
                            ):
                                si += 1
                            hi = j
                            while hi + 1 < n_seg and seg_sec[hi + 1] == seg_sec[j]:
                                hi += 1
                            cnt = bases[si] + (hi - starts_ses[si] + 1)
                            seg_out[j : hi + 1] = cnt
                            j = hi + 1
                        smap[mk] = [
                            int(seg_sec[-1]),
                            int(bases[-1] + (n_seg - starts_ses[-1])),
                        ]
                    elif m["fam"] == "last":
                        # lag(value): first row of the segment sees
                        # the carried value (or None if the key is
                        # new), later rows the prior row's value;
                        # carry the final value forward. State is ONE
                        # JSON-safe string (or None) per key.
                        vals = inp["val"][s:e]
                        seg_out = out_a[s:e]
                        st = smap.get(mk)
                        seg_out[0] = st[0] if st is not None else None
                        if e - s > 1:
                            seg_out[1:] = vals[:-1]
                        v_last = vals[-1]
                        if v_last is not None and not (
                            isinstance(v_last, float) and pd.isna(v_last)
                        ):
                            v_last = str(v_last)
                        else:
                            v_last = None
                        smap[mk] = [v_last]
                    elif m["fam"] == "rl":
                        # token bucket: state [tokens_units, last_sec];
                        # a NEW key starts FULL. The fold is the exact
                        # recurrence the batch resolver runs — integer
                        # units throughout, denials consume nothing.
                        rate, cap, cost = m["rate"], m["cap"], m["cost"]
                        st = smap.get(mk)
                        tokens, last = (
                            (cap, int(seg_sec[0])) if st is None else st
                        )
                        seg_out = out_a[s:e]
                        for j in range(e - s):
                            t = int(seg_sec[j])
                            if t > last:  # cross-batch late rows refill 0
                                tokens = min(cap, tokens + rate * (t - last))
                                last = t
                            if tokens >= cost:
                                tokens -= cost
                                seg_out[j] = True
                        smap[mk] = [tokens, last]
                    elif m["fam"] == "age":
                        # seconds since the key's first-seen second.
                        # State is ONE long; min-fold makes a late
                        # out-of-order first event lower the carried
                        # floor (it reports age 0 itself because the
                        # segment is sec-sorted: seg_sec[0] <= all).
                        st = smap.get(mk)  # [first_sec]
                        first = int(seg_sec[0]) if st is None else min(
                            int(st[0]), int(seg_sec[0])
                        )
                        out_a[s:e] = seg_sec - first
                        smap[mk] = [first]
                    elif m["fam"] == "burst":
                        # Goh-Barabasi B over the key's inter-event
                        # gaps so far, judged like the batch RANGE
                        # window: a tie group (equal sec) folds ALL
                        # its gaps (first row sec-last, rest 0)
                        # before any row reads B, so every tie row
                        # reports the same value. State is four ints
                        # [last_sec, n_gaps, S, Q]; moments exact,
                        # B = (sigma-mu)/(sigma+mu) in IEEE doubles
                        # identical to the JVM expression, rounded 6
                        # half-away (the tent output contract).
                        # Cross-batch LATE rows clamp gap to 0 (batch
                        # would re-sort history; documented
                        # watermark-respecting equivalence).
                        import math as _math

                        st = smap.get(mk) or [None, 0, 0, 0]
                        last, ng, sg, qg = st[0], st[1], st[2], st[3]
                        seg_out = out_a[s:e]
                        n_seg = e - s
                        j = 0
                        while j < n_seg:
                            hi = j
                            while (
                                hi + 1 < n_seg
                                and seg_sec[hi + 1] == seg_sec[j]
                            ):
                                hi += 1
                            t = int(seg_sec[j])
                            g_sz = hi - j + 1
                            if last is None:
                                ng += g_sz - 1
                            else:
                                gap = t - last
                                if gap < 0:
                                    gap = 0
                                ng += g_sz
                                sg += gap
                                qg += gap * gap
                            last = t
                            if ng >= 1:
                                mu = sg / ng
                                var = qg / ng - mu * mu
                                if var < 0.0:
                                    var = 0.0
                                sig = _math.sqrt(var)
                                den = sig + mu
                                b = (sig - mu) / den if den > 0 else 0.0
                            else:
                                b = 0.0
                            rb = _math.floor(abs(b) * 1e6 + 0.5) / 1e6
                            if b < 0:
                                rb = -rb
                            seg_out[j : hi + 1] = rb
                            j = hi + 1
                        smap[mk] = [last, ng, sg, qg]
                    elif m["fam"] == "wsum":
                        # trailing-window SUM, judged like the batch
                        # RANGE window: all visible same-key amounts
                        # (carried entries + this whole segment) with
                        # ts in [sec_r - win + 1, sec_r] — equal-ts
                        # amounts from later rows included. Carried
                        # state is the in-window non-zero (sec, amt)
                        # entries, re-sorted because late data may
                        # put carried entries after segment rows.
                        win = m["win"]
                        entries = smap.get(mk, ())
                        prev = np.asarray(entries, dtype="int64").reshape(-1, 2)
                        all_sec = np.concatenate([prev[:, 0], seg_sec])
                        all_amt = np.concatenate([prev[:, 1], inp["amt"][s:e]])
                        order = np.argsort(all_sec, kind="stable")
                        all_sec = all_sec[order]
                        all_amt = all_amt[order]
                        csum = np.concatenate(([0], np.cumsum(all_amt)))
                        hi = np.searchsorted(all_sec, seg_sec, side="right")
                        lo = np.searchsorted(all_sec, seg_sec - win + 1, side="left")
                        out_a[s:e] = csum[hi] - csum[lo]
                        keep = int(seg_sec.max()) - win + 1
                        kidx = np.searchsorted(all_sec, keep, side="left")
                        kept = [
                            [int(t), int(a)]
                            for t, a in zip(all_sec[kidx:], all_amt[kidx:])
                            if a != 0
                        ]
                        if kept:
                            smap[mk] = kept
                        elif mk in smap:
                            del smap[mk]
                    elif m["fam"] == "decay":
                        # decayed registration sum, judged like the
                        # batch UNBOUNDED range window: every visible
                        # same-key amount with ts <= this row's second
                        # (equal-ts later rows included), weighted
                        # 2^20 >> halflife_bucket_age (zero beyond
                        # 20). State carries per-SECOND merged
                        # (sec, amt) entries within the 21-bucket
                        # horizon behind the key's newest event —
                        # older entries weigh 0 for every future row
                        # (bounded-lateness contract, like wsum).
                        h = m["h"]
                        entries = smap.get(mk, ())
                        prev = np.asarray(entries, dtype="int64").reshape(-1, 2)
                        all_sec = np.concatenate([prev[:, 0], seg_sec])
                        all_amt = np.concatenate([prev[:, 1], inp["amt"][s:e]])
                        order = np.argsort(all_sec, kind="stable")
                        all_sec = all_sec[order]
                        all_amt = all_amt[order]
                        # merge equal seconds (RANGE ties share the
                        # whole tie group, so per-sec sums are exact)
                        u_sec, inv = np.unique(all_sec, return_inverse=True)
                        u_amt = np.bincount(
                            inv, weights=all_amt.astype("float64")
                        ).astype("int64")
                        u_b = u_sec // h
                        csum = np.concatenate(([0], np.cumsum(u_amt)))
                        row_b = seg_sec // h
                        # same-bucket partial: sec <= row sec
                        lo0 = np.searchsorted(u_b, row_b, side="left")
                        hi0 = np.searchsorted(u_sec, seg_sec, side="right")
                        score = (csum[hi0] - csum[lo0]) * (1 << 20)
                        for dd in range(1, 21):
                            lb = np.searchsorted(u_b, row_b - dd, side="left")
                            rb2 = np.searchsorted(u_b, row_b - dd, side="right")
                            score += (csum[rb2] - csum[lb]) * ((1 << 20) >> dd)
                        out_a[s:e] = score
                        keep_b = int(seg_sec.max() // h) - 20
                        kidx = np.searchsorted(u_b, keep_b, side="left")
                        kept = [
                            [int(t), int(a)]
                            for t, a in zip(u_sec[kidx:], u_amt[kidx:])
                            if a != 0
                        ]
                        if kept:
                            smap[mk] = kept
                        elif mk in smap:
                            del smap[mk]
                    elif m["fam"] == "tent":
                        # running transition entropy: state =
                        # [last_symbol, n, sq, {pair: count}]; the
                        # quantized c*ln(c) deltas telescope exactly,
                        # matching the batch two-window formulation
                        # bit-for-bit under the same (sec, ord) order.
                        # c*ln(c) >= 0, so floor(x + 0.5) == the JVM
                        # HALF_UP round the batch path uses.
                        import math as _math

                        st = smap.get(mk) or [None, 0, 0, {}]
                        last, ncnt, sq, cnts = st[0], st[1], st[2], st[3]
                        syms = inp["sym"][s:e]
                        seg_out = out_a[s:e]
                        for j, ch in enumerate(syms):
                            if last is not None:
                                pr = last + "\x01" + ch
                                cc = cnts.get(pr, 0) + 1
                                cnts[pr] = cc
                                r1 = _math.floor(cc * _math.log(cc) * 1e9 + 0.5)
                                r0 = (
                                    _math.floor(
                                        (cc - 1) * _math.log(cc - 1) * 1e9 + 0.5
                                    )
                                    if cc >= 2
                                    else 0
                                )
                                sq += r1 - r0
                                ncnt += 1
                                h = _math.log(ncnt) - sq / (1e9 * ncnt)
                                # half-away round to 6, the batch
                                # path's output contract
                                seg_out[j] = (
                                    _math.floor(h * 1e6 + 0.5) / 1e6
                                )
                            else:
                                seg_out[j] = 0.0
                            last = ch
                        smap[mk] = [last, ncnt, sq, cnts]
                    elif m["fam"] == "seq":
                        k_len = m["k"]
                        rx = m["rx"]
                        suffix = smap.get(mk, "")
                        syms = inp["sym"][s:e]
                        seg_out = out_a[s:e]
                        for j, ch in enumerate(syms):
                            suffix = (suffix + ch)[-k_len:]
                            seg_out[j] = rx.search(suffix) is not None
                        if suffix:
                            smap[mk] = suffix
                        elif mk in smap:
                            del smap[mk]
                    else:
                        # cache: rebuild the standalone resolver's
                        # event stream for this segment — per row, its
                        # gated Set writes then its probe, globally
                        # sorted (sec, writes-first, stmt idx) — and
                        # fold the Redis overwrite state through it.
                        # events: (sec, kind 0=write/1=probe, idx, payload)
                        key_is_null = keys[s] is None
                        events = []
                        for r in range(s, e):
                            if not key_is_null:
                                for sm, g_a, v_a in zip(
                                    m["sets"], inp["g"], inp["v"]
                                ):
                                    if g_a[r]:
                                        v = v_a[r]
                                        events.append(
                                            (
                                                int(sec_a[r]),
                                                0,
                                                sm["idx"],
                                                None if pd.isna(v) else (
                                                    v.item() if hasattr(v, "item") else v
                                                ),
                                                int(sec_a[r]) + sm["ttl"] - 1,
                                            )
                                        )
                            events.append((int(sec_a[r]), 1, 0, r, 0))
                        events.sort(key=lambda ev: (ev[0], ev[1], ev[2]))
                        latest = smap.get(mk)  # [ts, idx, exp, val]
                        for ev in events:
                            if ev[1] == 0:
                                ts_w, _, idx_w, val_w, exp_w = ev
                                if latest is None or [ts_w, idx_w] >= latest[:2]:
                                    latest = [ts_w, idx_w, exp_w, val_w]
                            else:
                                r = ev[3]
                                if latest is not None and latest[2] >= ev[0]:
                                    out_a[r] = latest[3]
                        if latest is not None:
                            smap[mk] = latest
                        elif mk in smap:
                            del smap[mk]
            out = pdf[passthrough_cols].copy()
            for m, out_a in zip(metas, outs):
                col = f"__fcv_{m['i']}" if m["fam"] == "cache" else m["name"]
                out[col] = out_a
            state.update((_json.dumps(states),))
            yield out

        return aug.groupBy("__fs_bkt").applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=T.StructType(
                [T.StructField("states_json", T.StringType())]
            ),
            outputMode="append",
            timeoutConf="NoTimeout",
        )

    def _join_cache_streaming(self, df: DataFrame, spec: dict, sec: Column) -> DataFrame:
        """Streaming strategy for a CacheGet: each event row explodes
        into its Set-write pieces (narrow: key, ts, stmt idx, value,
        expiry) and one probe piece carrying every input column; the
        union groups by key value into applyInPandasWithState, whose
        state is just the LATEST write (Redis overwrite semantics
        makes the state O(1) per key). Probes re-emerge with the
        looked-up value — no stream-stream join-back. Within a key,
        pieces process in (ts, writes-before-reads) order; cross-batch
        late writes follow watermark limits.

        Groups by hash-BUCKET of the key with a {key: latest-write}
        map per bucket (same key-coalescing as the window counter:
        applyInPandasWithState's fixed per-group cost dominates at
        high key cardinality; per-key semantics are preserved by
        per-key segment folds within the (key, ts)-sorted bucket)."""
        import json as _json
        import os as _os

        import pandas as pd
        from pyspark.sql import types as T

        n_buckets = _state_bucket_count()
        cast = spec["cast"]
        probe = df.select(
            "*",
            spec["key_col"].cast("string").alias("__ck"),
            sec.alias("__cts"),
            F.lit(None).cast("long").alias("__cidx"),
            F.lit(None).cast("long").alias("__cexp"),
            F.lit(None).cast(cast).alias("__cv"),
            F.lit(0).alias("__cset"),
        )
        rel = probe
        for s in spec["sets"]:
            ttl = round(s["ttl"])
            set_gate = F.coalesce(
                s["gate"] if s["gate"] is not None else F.lit(True), F.lit(False)
            )
            piece = (
                df.filter(set_gate & s["key_col"].isNotNull())
                .select(
                    s["key_col"].cast("string").alias("__ck"),
                    sec.alias("__cts"),
                    F.lit(int(s["idx"])).cast("long").alias("__cidx"),
                    (sec + F.lit(ttl - 1)).alias("__cexp"),
                    s["value_col"].cast(cast).alias("__cv"),
                    F.lit(1).alias("__cset"),
                )
            )
            rel = rel.unionByName(piece, allowMissingColumns=True)
        passthrough_cols = [c for c in df.columns]
        out_schema = T.StructType(
            [f for f in df.schema.fields]
            + [T.StructField("__cval", probe.schema["__cv"].dataType)]
        )

        _NULL_KEY = "\x00"

        def fn(key, pdf_iter, state):
            import numpy as np

            smap = _json.loads(state.get[0]) if state.exists else {}
            # Materialize the whole group first — Arrow chunking is not
            # time-ordered, so per-chunk sorting + state folding would
            # let a chunk-1 write shadow a chunk-2 probe that precedes
            # it in event time (chunk-boundary-dependent lookups).
            chunks = [c for c in pdf_iter if len(c)]
            if not chunks:
                state.update((_json.dumps(smap),))
                return
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            # per key: writes before probes at equal ts; among same-ts
            # writes, statement idx ascending so "last position"
            # = max (ts, idx) — the batch window's struct max
            pdf = pdf.sort_values(
                ["__ck", "__cts", "__cset", "__cidx"],
                ascending=[True, True, False, True],
                kind="stable",
                na_position="last",
            )
            n = len(pdf)
            keys_a = pdf["__ck"].to_numpy(dtype=object)
            is_set_all = pdf["__cset"].to_numpy() == 1
            ts_all = pdf["__cts"].to_numpy(dtype="int64")
            idx_all = pdf["__cidx"].to_numpy(dtype="float64")
            exp_all = pdf["__cexp"].to_numpy(dtype="float64")
            val_all = pdf["__cv"].to_numpy(dtype=object)
            cval = np.empty(n, dtype=object)
            change = np.nonzero(keys_a[1:] != keys_a[:-1])[0] + 1
            for s, e in zip(
                np.concatenate(([0], change)), np.concatenate((change, [n]))
            ):
                mk = keys_a[s] if keys_a[s] is not None else _NULL_KEY
                latest = smap.get(mk)
                is_set = is_set_all[s:e]
                ts = ts_all[s:e]
                # position of the latest batch write at or before each
                # row (writes sort before probes at equal ts — the
                # zadd-then-read sequencing), fully columnar
                last_w = np.maximum.accumulate(
                    np.where(is_set, np.arange(e - s), -1)
                )
                pl = last_w[~is_set]
                probe_ts = ts[~is_set]
                safe = np.maximum(pl, 0)
                w_ts = ts[safe]
                w_idx = idx_all[s:e][safe]
                w_exp = exp_all[s:e][safe]
                w_val = val_all[s:e][safe]
                if latest is not None:
                    s_ts, s_idx, s_exp, s_val = latest
                    # Redis overwrite: lexicographically newest
                    # (ts, idx) write wins between carried state and
                    # batch writes
                    use_state = (
                        (pl < 0) | (s_ts > w_ts) | ((s_ts == w_ts) & (s_idx > w_idx))
                    )
                    exp_sel = np.where(use_state, float(s_exp), w_exp)
                    val_sel = np.where(
                        use_state, np.array([s_val], dtype=object)[0], w_val
                    )
                else:
                    use_none = pl < 0
                    exp_sel = np.where(use_none, -1.0, w_exp)
                    val_sel = np.where(use_none, None, w_val)
                valid = exp_sel >= probe_ts
                cval[s:e][~is_set] = np.where(valid, val_sel, None)
                # fold this key's newest batch write into the map
                if is_set.any():
                    bi = int(np.flatnonzero(is_set)[-1])
                    v = val_all[s:e][bi]
                    cand = [
                        int(ts[bi]),
                        int(idx_all[s:e][bi]),
                        int(exp_all[s:e][bi]),
                        None if pd.isna(v) else (v.item() if hasattr(v, "item") else v),
                    ]
                    if latest is None or cand[:2] >= latest[:2]:
                        smap[mk] = cand
            probes = ~is_set_all
            out = pdf[probes][passthrough_cols].copy()
            out["__cval"] = cval[probes]
            state.update((_json.dumps(smap),))
            yield out

        looked = rel.withColumn(
            "__cbkt",
            F.pmod(F.xxhash64(F.col("__ck")), F.lit(n_buckets)).cast("int"),
        ).groupBy("__cbkt").applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=T.StructType([T.StructField("latest_json", T.StringType())]),
            outputMode="append",
            timeoutConf="NoTimeout",
        )
        result = F.coalesce(F.col("__cval"), spec["default_col"])
        if spec["gate"] is not None:
            result = F.when(
                F.coalesce(spec["gate"], F.lit(False)), result
            ).otherwise(spec["default_col"])
        return looked.select("*", result.alias(spec["name"])).drop("__cval")

    def release_cache_state(self) -> None:
        """Unpersist the pinned row-id frames cache lookups created —
        call after materializing apply()'s result in long sessions."""
        for d in getattr(self, "_cache_persists", []):
            d.unpersist()
        self._cache_persists = []

    def _hoisted_feature_order(
        self,
        window_specs: dict,
        cache_specs: dict,
        seq_specs: dict | None = None,
        distinct_specs: dict | None = None,
        session_specs: dict | None = None,
        last_specs: dict | None = None,
        wsum_specs: dict | None = None,
        age_specs: dict | None = None,
        rl_specs: dict | None = None,
        unique_specs: dict | None = None,
        wminmax_specs: dict | None = None,
        seen_specs: dict | None = None,
        decay_specs: dict | None = None,
        tent_specs: dict | None = None,
        burst_specs: dict | None = None,
    ) -> list[tuple[str, Optional[Column]]]:
        """Feature materialization order with STATE OPS HOISTED as
        early as their dependencies allow.

        Why: the streaming window/cache ops ship every column of their
        input frame through Arrow (python state fn) and back. In
        source order a state op defined after N features carries all N
        through that boundary — measured 5x throughput loss on the
        40-feature bench ruleset (55k vs 271k turns/s) because Arrow
        serialization of the wide frame, a shared-bandwidth cost, not
        compute, dominates. Hoisting the op to just after its LAST
        dependency means only (source columns + the op's dep closure)
        cross the boundary; every other feature computes afterwards,
        JVM-side.

        Safety: SML is define-before-use, so no entry earlier in
        source order can reference a state op defined later — moving
        an op earlier past non-dependencies cannot break any earlier
        entry, and dependents compiled after it stay after it (their
        relative order is unchanged). Dependencies are extracted from
        the op's spec columns (key/increment/gate/default + paired
        cache writes) via the unresolved column tree, with a raw
        mangled-token scan as a conservative superset for columns
        built from SQL strings; unknown names are ignored. Batch
        frames get the same order — feature columns are pure
        expressions, so materialization order is semantics-free there.
        """
        # pure function of compile-time state — memoize so repeated
        # apply() calls skip the per-column py4j node().toString()
        # round trips (the compiled-ruleset session cache otherwise
        # pays them on every query build)
        cached = getattr(self, "_hoisted_order_cache", None)
        if cached is not None:
            return cached
        seq_specs = seq_specs or {}
        distinct_specs = distinct_specs or {}
        session_specs = session_specs or {}
        last_specs = last_specs or {}
        wsum_specs = wsum_specs or {}
        age_specs = age_specs or {}
        rl_specs = rl_specs or {}
        unique_specs = unique_specs or {}
        wminmax_specs = wminmax_specs or {}
        seen_specs = seen_specs or {}
        decay_specs = decay_specs or {}
        tent_specs = tent_specs or {}
        burst_specs = burst_specs or {}
        entries = list(self.ctx.feature_exprs)
        pos = {name: i for i, (name, _) in enumerate(entries)}
        label_specs = {s["name"]: s for s in self.ctx.label_lookups}

        def spec_cols(mangled: str) -> list[Column]:
            if mangled in session_specs:
                return [session_specs[mangled]["key_col"]]
            if mangled in last_specs:
                s = last_specs[mangled]
                cols = [s["key_col"], s["value_col"]]
                if s["order_col"] is not None:
                    cols.append(s["order_col"])
                return cols
            if mangled in wsum_specs:
                s = wsum_specs[mangled]
                cols = [s["key_col"], s["value_col"]]
                if s["gate"] is not None:
                    cols.append(s["gate"])
                return cols
            if mangled in decay_specs:
                s = decay_specs[mangled]
                cols = [s["key_col"], s["value_col"]]
                if s["gate"] is not None:
                    cols.append(s["gate"])
                return cols
            if mangled in tent_specs:
                s = tent_specs[mangled]
                cols = [s["key_col"], s["state_col"]]
                if s["order_col"] is not None:
                    cols.append(s["order_col"])
                return cols
            if mangled in age_specs:
                return [age_specs[mangled]["key_col"]]
            if mangled in burst_specs:
                return [burst_specs[mangled]["key_col"]]
            if mangled in rl_specs:
                s = rl_specs[mangled]
                cols = [s["key_col"]]
                if s["order_col"] is not None:
                    cols.append(s["order_col"])
                return cols
            if mangled in distinct_specs:
                s = distinct_specs[mangled]
                cols = [s["key_col"], s["value_col"]]
                if s["gate"] is not None:
                    cols.append(s["gate"])
                return cols
            if mangled in unique_specs:
                s = unique_specs[mangled]
                cols = [s["key_col"], s["value_col"]]
                if s["gate"] is not None:
                    cols.append(s["gate"])
                return cols
            if mangled in wminmax_specs:
                s = wminmax_specs[mangled]
                cols = [s["key_col"], s["value_col"]]
                if s["gate"] is not None:
                    cols.append(s["gate"])
                return cols
            if mangled in seen_specs:
                s = seen_specs[mangled]
                cols = [s["key_col"], s["value_col"]]
                if s["gate"] is not None:
                    cols.append(s["gate"])
                return cols
            if mangled in seq_specs:
                s = seq_specs[mangled]
                cols = [s["key_col"], s["symbol_col"]]
                if s["order_col"] is not None:
                    cols.append(s["order_col"])
                return cols
            if mangled in window_specs:
                s = window_specs[mangled]
                cols = [s["key_col"], s["incremented"]]
                if s["gate"] is not None:
                    cols.append(s["gate"])
                return cols
            if mangled in cache_specs:
                s = cache_specs[mangled]
                cols = [s["key_col"], s["default_col"]]
                if s["gate"] is not None:
                    cols.append(s["gate"])
                for st in s["sets"]:
                    cols.append(st["key_col"])
                    cols.append(st["value_col"])
                    if st["gate"] is not None:
                        cols.append(st["gate"])
                return cols
            return [label_specs[mangled]["entity_col"]]

        refs_of: dict[str, set] = {}
        state_ops: list[str] = []
        for name, defn in entries:
            if defn is None:
                cols = spec_cols(name)
                if (
                    name in window_specs
                    or name in cache_specs
                    or name in seq_specs
                    or name in distinct_specs
                    or name in session_specs
                    or name in last_specs
                    or name in wsum_specs
                    or name in age_specs
                    or name in rl_specs
                    or name in unique_specs
                    or name in wminmax_specs
                    or name in seen_specs
                    or name in decay_specs
                    or name in tent_specs
                    or name in burst_specs
                ):
                    state_ops.append(name)
            else:
                cols = [defn]
            deps: set = set()
            for c in cols:
                deps |= _column_refs(c)
            refs_of[name] = deps & set(pos)

        # hoist set = the Arrow state ops plus their transitive
        # dependency closures (closure members are as movable as the
        # ops: each only needs its OWN deps in place)
        hoist: set = set()
        stack = list(state_ops)
        while stack:
            n = stack.pop()
            if n in hoist:
                continue
            hoist.add(n)
            stack.extend(refs_of[n])

        rank: dict[str, float] = {}

        def r(n: str) -> float:
            got = rank.get(n)
            if got is not None:
                return got
            if n not in hoist:
                rank[n] = float(pos[n])
            else:
                # strictly after every dep; the epsilon stacks along
                # chains and stays far below the 1.0 gaps between
                # non-hoisted entries
                rank[n] = max((r(d) for d in refs_of[n]), default=-1.0) + 1e-6
            return rank[n]

        out = sorted(entries, key=lambda e: (r(e[0]), pos[e[0]]))
        self._hoisted_order_cache = out
        return out

    def apply(
        self,
        df: DataFrame,
        passthrough: Optional[list[str]] = None,
        labels_df: Optional[DataFrame] = None,
        sample_config: Optional[dict[str, int]] = None,
        sample_key: Optional[Column] = None,
    ) -> DataFrame:
        """``labels_df`` is the label-store snapshot required when the
        ruleset calls HasLabel: columns (entity_type, entity_id, label,
        status, expires_at_unix, mutation_ts) — the output of
        ``streaming.state.latest_labels``. ``sample_config`` enables
        per-action-name sampling *before* any feature evaluates (the
        filter sits directly over the scan, so Catalyst pushes it into
        the source and dropped events never cost a feature)."""
        b = self.bindings
        sample_rate_col: Optional[Column] = None
        if sample_config:
            df, sample_rate_col = self.sample_filter(df, sample_config, sample_key)
        specs = {s["name"]: s for s in self.ctx.label_lookups}
        if specs and labels_df is None:
            raise ValueError(
                "ruleset uses HasLabel — apply(labels_df=...) requires a label snapshot"
            )
        # Materialize features layer by layer; each definition may
        # reference earlier features by (mangled) column name. Catalyst
        # collapses single-use chains and keeps multi-use expressions
        # shared (collapseProjectAlwaysInline=false), so the optimized
        # plan stays linear in ruleset size.
        cache_specs = {s["name"]: s for s in getattr(self.ctx, "cache_lookups", [])}
        window_specs = {s["name"]: s for s in getattr(self.ctx, "window_lookups", [])}
        seq_specs = {s["name"]: s for s in getattr(self.ctx, "seq_lookups", [])}
        distinct_specs = {
            s["name"]: s for s in getattr(self.ctx, "distinct_lookups", [])
        }
        session_specs = {
            s["name"]: s for s in getattr(self.ctx, "session_lookups", [])
        }
        last_specs = {s["name"]: s for s in getattr(self.ctx, "last_lookups", [])}
        wsum_specs = {s["name"]: s for s in getattr(self.ctx, "wsum_lookups", [])}
        age_specs = {s["name"]: s for s in getattr(self.ctx, "age_lookups", [])}
        rl_specs = {
            s["name"]: s for s in getattr(self.ctx, "ratelimit_lookups", [])
        }
        unique_specs = {
            s["name"]: s for s in getattr(self.ctx, "unique_lookups", [])
        }
        wminmax_specs = {
            s["name"]: s for s in getattr(self.ctx, "wminmax_lookups", [])
        }
        seen_specs = {s["name"]: s for s in getattr(self.ctx, "seen_lookups", [])}
        decay_specs = {s["name"]: s for s in getattr(self.ctx, "decay_lookups", [])}
        tent_specs = {s["name"]: s for s in getattr(self.ctx, "tent_lookups", [])}
        burst_specs = {
            s["name"]: s for s in getattr(self.ctx, "burst_lookups", [])
        }
        # STATE-OP FUSION (streaming only): a maximal run of
        # consecutive window/seq state ops sharing one key expression
        # resolves through a single applyInPandasWithState — one
        # exchange + one state-store pass for N mechanisms. Runs break
        # on: a non-window/seq entry, a different key node, a second
        # seq order expression, or an op whose inputs reference a
        # fused op's output (it must see that column materialized).
        streaming = df.isStreaming

        def _node(col) -> str:
            try:
                return col._jc.node().toString()
            except Exception:  # pragma: no cover - defensive
                return repr(col)

        pending: list[tuple[str, dict]] = []
        state_passes: list[list[str]] = []

        def _register_pass(names: list[str]) -> None:
            # Spark allows ONE applyInPandasWithState per streaming
            # query; fusion collapses same-key window/seq runs into
            # one, but groups split by key changes, inter-op
            # dependencies, or cache ops cannot share a pass. Fail
            # here with the split, not deep inside Spark's
            # UnsupportedOperationChecker (or a scratch-column
            # resolution error) when the second pass builds.
            if streaming and state_passes:
                groups = "; ".join(
                    "{" + ", ".join(g) + "}" for g in state_passes + [names]
                )
                raise ValueError(
                    "streaming ruleset needs "
                    f"{len(state_passes) + 1} stateful passes ({groups}) but "
                    "Spark supports a single applyInPandasWithState per "
                    "query. Stateful features stream together only when they "
                    "share one key expression, do not read each other's "
                    "outputs, and do not mix with Cache* ops; split the "
                    "ruleset or evaluate the extra features in batch."
                )
            state_passes.append(names)

        def _flush(frame: DataFrame) -> DataFrame:
            if not pending:
                return frame
            _register_pass([sp["name"] for _, sp in pending])
            if len(pending) == 1 and pending[0][0] not in (
                "wdistinct",
                "sess",
                "last",
                "wsum",
                "age",
                "rl",
                "unique",
                "wminmax",
                "seen",
                "decay",
                "tent",
                "burst",
            ):
                fam, sp = pending[0]
                if fam == "window":
                    frame = self._join_window_count(frame, sp)
                elif fam == "seq":
                    frame = self._join_seq_match(frame, sp)
                else:
                    frame = self._join_cache(frame, sp)
            else:
                group = list(pending)
                frame = self._join_fused_state(frame, group)
                # cache entries come back as raw "__fcv_{i}" lookup
                # columns; apply default/gate JVM-side exactly like
                # the standalone resolver's tail
                for i, (fam, sp) in enumerate(group):
                    if fam != "cache":
                        continue
                    result = F.coalesce(F.col(f"__fcv_{i}"), sp["default_col"])
                    if sp["gate"] is not None:
                        result = F.when(
                            F.coalesce(sp["gate"], F.lit(False)), result
                        ).otherwise(sp["default_col"])
                    frame = frame.select("*", result.alias(sp["name"])).drop(
                        f"__fcv_{i}"
                    )
            pending.clear()
            return frame

        def _spec_refs(fam: str, sp: dict) -> set:
            cols = [sp["key_col"]]
            if fam == "window":
                cols.append(sp["incremented"])
                if sp["gate"] is not None:
                    cols.append(sp["gate"])
            elif fam == "seq":
                cols.append(sp["symbol_col"])
                if sp["order_col"] is not None:
                    cols.append(sp["order_col"])
            elif fam in ("wdistinct", "unique", "wminmax", "seen"):
                cols.append(sp["value_col"])
                if sp["gate"] is not None:
                    cols.append(sp["gate"])
            elif fam in ("sess", "age", "burst"):
                pass  # only the key
            elif fam == "rl":
                if sp["order_col"] is not None:
                    cols.append(sp["order_col"])
            elif fam == "last":
                cols.append(sp["value_col"])
                if sp["order_col"] is not None:
                    cols.append(sp["order_col"])
            elif fam in ("wsum", "decay"):
                cols.append(sp["value_col"])
                if sp["gate"] is not None:
                    cols.append(sp["gate"])
            elif fam == "tent":
                cols.append(sp["state_col"])
                if sp["order_col"] is not None:
                    cols.append(sp["order_col"])
            else:  # cache
                if sp["gate"] is not None:
                    cols.append(sp["gate"])
                cols.append(sp["default_col"])
                for s in sp["sets"]:
                    cols.append(s["key_col"])
                    cols.append(s["value_col"])
                    if s["gate"] is not None:
                        cols.append(s["gate"])
            refs: set = set()
            for c in cols:
                refs |= _column_refs(c)
            return refs

        def _fusable(fam: str, sp: dict) -> bool:
            if not pending:
                return True
            key_node = _node(pending[0][1]["key_col"])
            if _node(sp["key_col"]) != key_node:
                return False
            if fam == "cache":
                # every Set statement must write through the SAME key
                # the fused pass groups by, or its writes would land
                # in the wrong bucket
                for s in sp["sets"]:
                    if _node(s["key_col"]) != key_node:
                        return False
            if fam in ("seq", "last", "rl", "tent") and sp["order_col"] is not None:
                for pf, psp in pending:
                    if (
                        pf in ("seq", "last", "rl", "tent")
                        and psp["order_col"] is not None
                        and _node(psp["order_col"]) != _node(sp["order_col"])
                    ):
                        return False
            emitted = {psp["name"] for _, psp in pending}
            return not (_spec_refs(fam, sp) & emitted)

        for mangled, defn in self._hoisted_feature_order(
            window_specs,
            cache_specs,
            seq_specs,
            distinct_specs,
            session_specs,
            last_specs,
            wsum_specs,
            age_specs,
            rl_specs,
            unique_specs,
            wminmax_specs,
            seen_specs,
            decay_specs,
            tent_specs,
            burst_specs,
        ):
            if defn is None:
                if streaming and mangled in rl_specs:
                    sp = rl_specs[mangled]
                    if not _fusable("rl", sp):
                        df = _flush(df)
                    pending.append(("rl", sp))
                    continue
                if streaming and mangled in unique_specs:
                    sp = unique_specs[mangled]
                    if not _fusable("unique", sp):
                        df = _flush(df)
                    pending.append(("unique", sp))
                    continue
                if streaming and mangled in wminmax_specs:
                    sp = wminmax_specs[mangled]
                    if not _fusable("wminmax", sp):
                        df = _flush(df)
                    pending.append(("wminmax", sp))
                    continue
                if streaming and mangled in seen_specs:
                    sp = seen_specs[mangled]
                    if not _fusable("seen", sp):
                        df = _flush(df)
                    pending.append(("seen", sp))
                    continue
                if streaming and mangled in age_specs:
                    sp = age_specs[mangled]
                    if not _fusable("age", sp):
                        df = _flush(df)
                    pending.append(("age", sp))
                    continue
                if streaming and mangled in wsum_specs:
                    sp = wsum_specs[mangled]
                    if not _fusable("wsum", sp):
                        df = _flush(df)
                    pending.append(("wsum", sp))
                    continue
                if streaming and mangled in decay_specs:
                    sp = decay_specs[mangled]
                    if not _fusable("decay", sp):
                        df = _flush(df)
                    pending.append(("decay", sp))
                    continue
                if streaming and mangled in tent_specs:
                    sp = tent_specs[mangled]
                    if not _fusable("tent", sp):
                        df = _flush(df)
                    pending.append(("tent", sp))
                    continue
                if streaming and mangled in burst_specs:
                    sp = burst_specs[mangled]
                    if not _fusable("burst", sp):
                        df = _flush(df)
                    pending.append(("burst", sp))
                    continue
                if streaming and mangled in last_specs:
                    sp = last_specs[mangled]
                    if not _fusable("last", sp):
                        df = _flush(df)
                    pending.append(("last", sp))
                    continue
                if streaming and mangled in session_specs:
                    sp = session_specs[mangled]
                    if not _fusable("sess", sp):
                        df = _flush(df)
                    pending.append(("sess", sp))
                    continue
                if streaming and mangled in distinct_specs:
                    sp = distinct_specs[mangled]
                    if not _fusable("wdistinct", sp):
                        df = _flush(df)
                    pending.append(("wdistinct", sp))
                    continue
                if streaming and mangled in window_specs:
                    sp = window_specs[mangled]
                    if not _fusable("window", sp):
                        df = _flush(df)
                    pending.append(("window", sp))
                    continue
                if streaming and mangled in seq_specs:
                    sp = seq_specs[mangled]
                    if not _fusable("seq", sp):
                        df = _flush(df)
                    pending.append(("seq", sp))
                    continue
                if streaming and mangled in cache_specs:
                    sp = cache_specs[mangled]
                    key_node = _node(sp["key_col"])
                    internal_ok = all(
                        _node(s["key_col"]) == key_node for s in sp["sets"]
                    )
                    if not internal_ok:
                        # writes keyed differently from the reads:
                        # only the standalone union resolver can
                        # route them — force a singleton pass
                        df = _flush(df)
                        pending.append(("cache", sp))
                        df = _flush(df)
                        continue
                    if not _fusable("cache", sp):
                        df = _flush(df)
                    pending.append(("cache", sp))
                    continue
                df = _flush(df)
                if mangled in cache_specs:
                    df = self._join_cache(df, cache_specs[mangled])
                elif mangled in window_specs:
                    df = self._join_window_count(df, window_specs[mangled])
                elif mangled in seq_specs:
                    df = self._join_seq_match(df, seq_specs[mangled])
                elif mangled in distinct_specs:
                    df = self._join_window_distinct(df, distinct_specs[mangled])
                elif mangled in session_specs:
                    df = self._join_session_count(df, session_specs[mangled])
                elif mangled in last_specs:
                    df = self._join_last_value(df, last_specs[mangled])
                elif mangled in wsum_specs:
                    df = self._join_window_sum(df, wsum_specs[mangled])
                elif mangled in age_specs:
                    df = self._join_key_age(df, age_specs[mangled])
                elif mangled in burst_specs:
                    df = self._join_burstiness(df, burst_specs[mangled])
                elif mangled in rl_specs:
                    df = self._join_rate_limit(df, rl_specs[mangled])
                elif mangled in unique_specs:
                    df = self._join_unique_count(df, unique_specs[mangled])
                elif mangled in wminmax_specs:
                    df = self._join_window_minmax(df, wminmax_specs[mangled])
                elif mangled in seen_specs:
                    df = self._join_seen_before(df, seen_specs[mangled])
                elif mangled in decay_specs:
                    df = self._join_decay_score(df, decay_specs[mangled])
                elif mangled in tent_specs:
                    df = self._join_transition_entropy(df, tent_specs[mangled])
                else:
                    df = self._join_label(df, labels_df, specs[mangled])
            else:
                df = _flush(df)
                df = df.select("*", defn.alias(mangled))
        df = _flush(df)
        # Output-name collision guard: the result frame must be usable
        # under Spark's DEFAULT case-insensitive resolution, not just
        # under this engine's caseSensitive=true sessions. A ruleset
        # extracting `Role` with `role` passed through produces a frame
        # where any unqualified select of either name throws
        # AMBIGUOUS_REFERENCE on a default session — fail fast here
        # with an actionable message instead.
        out_names = list(passthrough or []) + list(self.ctx.extracted)
        by_fold: dict[str, list[str]] = {}
        for n in out_names:
            by_fold.setdefault(n.lower(), []).append(n)
        clashes = {k: v for k, v in by_fold.items() if len(v) > 1}
        if clashes:
            detail = "; ".join(
                " vs ".join(sorted(v)) for v in clashes.values()
            )
            raise ValueError(
                "apply() output would contain case-insensitively colliding "
                f"columns ({detail}) — ambiguous under Spark's default "
                "spark.sql.caseSensitive=false. Drop the colliding name "
                "from passthrough (the extracted feature already carries "
                "the value) or rename the feature."
            )
        cols: list[Column] = []
        for name in passthrough or []:
            cols.append(F.col(name))
        if b.action_id and b.action_id in df.columns:
            cols.append(F.col(b.action_id).cast("long").alias(ACTION_ID))
        else:
            # deterministic id when the input has none
            # (ref: worker/sinks/sink/rules_sink.py:152-153 generates one)
            cols.append(F.xxhash64(F.col(b.data)).alias(ACTION_ID))
        cols.append(F.col(b.timestamp).alias(TIMESTAMP))
        for name in self.ctx.extracted:
            v = self.ctx.features[name]
            cols.append(v.col.alias(name))
        cols.append(self.verdicts_column().alias(VERDICTS))
        cols.append(self.label_mutations_column().alias(LABEL_MUTATIONS))
        cols.append(self.label_effects_column().alias(LABEL_EFFECTS))
        if self.ctx.list_effects:
            # present only when the ruleset uses AtprotoList, matching
            # the reference's conditional custom extracted feature
            cols.append(self.atproto_list_column().alias("atproto_list"))
        # failed-node counter: the JVM-computable subset is required
        # extraction misses (ref counts every raised UDF; our Err→NULL
        # collapse keeps values identical and this keeps the count)
        indicators = getattr(self.ctx, "error_indicators", [])
        if indicators:
            err = sum(
                (ind.cast("int") for ind in indicators[1:]),
                indicators[0].cast("int"),
            )
            cols.append(F.coalesce(err, F.lit(0)).alias(ERROR_COUNT))
        else:
            cols.append(F.lit(0).alias(ERROR_COUNT))
        if sample_rate_col is not None:
            cols.append(sample_rate_col.alias(SAMPLE_RATE))
        return df.select(*cols)


def _default_registry() -> dict[str, Callable]:
    from ..functions.registry import REGISTRY

    return REGISTRY


def compile_ruleset(
    sources: dict[str, str],
    entry: str = "main.sml",
    bindings: Optional[InputBindings] = None,
    registry: Optional[dict[str, Callable]] = None,
    labels_config=None,
) -> CompiledRuleset:
    """Compile a rule-source tree (path → SML text) to a ruleset.

    ``entry`` mirrors the reference convention that execution starts
    from ``main.sml`` (ref: engine/ast/sources.py:14-25).
    ``labels_config``: optional ``LabelsConfig`` (labels.yaml stand-in)
    enabling compile-time label validation.
    """
    bindings = bindings or InputBindings()
    if labels_config is not None and not hasattr(labels_config, "labels"):
        from .labels_config import LabelsConfig

        labels_config = LabelsConfig.from_dict(labels_config)
    ctx = CompilerContext(
        sources, bindings, registry or _default_registry(), labels_config=labels_config
    )
    ctx.compile_path(entry, Span(entry, 0, 0))
    return CompiledRuleset(ctx=ctx, bindings=bindings)


def compile_sml(
    text: str,
    bindings: Optional[InputBindings] = None,
    registry: Optional[dict[str, Callable]] = None,
) -> CompiledRuleset:
    """Compile a single inline SML program (the reference's test style,
    ref: engine/conftest.py:283-376)."""
    return compile_ruleset({"main.sml": text}, "main.sml", bindings, registry)


def compile_query_filter(
    text: str,
    feature_types: dict[str, str],
    registry: Optional[dict[str, Callable]] = None,
) -> Column:
    """Compile a UI-style SML filter expression to a Spark predicate.

    Mirrors ``parse_query_to_validated_ast('Query = ' + filter)``
    (ref: engine/query_language/__init__.py:12-36) + the ClickHouse
    translator (ref: engine/query_language/ast_clickhouse_translator.py
    :50-223), except we emit a Spark ``Column`` directly — the sink
    table's columns are the feature namespace.
    """
    from ..functions.registry import QUERY_REGISTRY

    prog = parse_program("Query = (" + text + ")", "<query>")
    reg = dict(QUERY_REGISTRY)
    reg.update(registry or {})
    ctx = CompilerContext({}, InputBindings(), reg)
    scope = _FileScope(path="<query>")
    ctx._scopes.append(scope)
    for fname, ftype in feature_types.items():
        ctx.features[fname] = Value(col=F.col(fname), dtype=ftype)
    stmt = prog.statements[0]
    assert isinstance(stmt, Assign)
    value = ctx.compile_expr(stmt.value)
    return nullsafe.truthy(value)

"""Query-language UDFs — usable only in analytics filters over the
sink table (ref: engine/query_language/udfs/).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..compiler.compile import LABEL_MUTATIONS, VERDICTS
from ..compiler.values import Value
from .registry import const_arg, register_query


@register_query("DidDeclareVerdict")
def did_declare_verdict(ctx, call, args):
    """array-contains on __verdicts (ref: engine/query_language/udfs/
    did_declare_verdict.py:15-35)."""
    verdict = const_arg(ctx, call, args, "verdict")
    return Value(col=F.array_contains(F.col(VERDICTS), verdict), dtype="bool")


def _did_mutate_label(ctx, call, args, status: str) -> Value:
    entity_type = const_arg(ctx, call, args, "entity_type", required=False)
    label = const_arg(ctx, call, args, "label_name", required=False) or const_arg(
        ctx, call, args, "label", required=False
    )
    if label is None:
        raise ctx.error(f"{call.func} requires label_name=", call.span)
    prefix = f"{entity_type}/" if entity_type else ""
    pattern = f"{prefix}%{label}/{status}" if not entity_type else f"{entity_type}/{label}/{status}"
    col = F.exists(F.col(LABEL_MUTATIONS), lambda m: m.like(pattern))
    return Value(col=col, dtype="bool")


@register_query("DidAddLabel")
def did_add_label(ctx, call, args):
    """LIKE over __entity_label_mutations (ref: engine/query_language/
    udfs/did_mutate_label.py:24)."""
    return _did_mutate_label(ctx, call, args, "added")


@register_query("DidRemoveLabel")
def did_remove_label(ctx, call, args):
    """ref: engine/query_language/udfs/did_mutate_label.py:49."""
    return _did_mutate_label(ctx, call, args, "removed")

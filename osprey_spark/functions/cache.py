"""Per-key TTL'd K/V cache UDFs (CacheSet*/CacheGet*).

ref: example_plugins/src/udfs/cache.py:246-331 — Redis SET/GET with
TTL, gated on ``when_all``. The batch/streaming translation: a
CacheGet reads the most recent CacheSet *value for the same key* whose
event time lies within the set's TTL window, judged at the reading
row's event time — an event-time range window partitioned by the key
expression (one shuffle per distinct key expression; Catalyst shares
window frames between Get/Set pairs on the same key).

Pairing: Set and Get are matched by their compiled key *expression*
(same feature/column math), the way production rules share a key
feature. A Get whose key matches no Set in the program is a
validation error (the reference would silently read another rule
file's writes through Redis — cross-program state needs the label
store or the streaming state ops instead, documented divergence).
Within one row, set-then-get visibility follows statement order only
across rows (micro-batch semantics: a row's own set IS visible to its
own get, matching the reference's in-action sequencing when the set
statement precedes the get).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..compiler import nullsafe
from ..compiler.values import Value
from .registry import arg, const_arg, register

DAY = 86400.0


def _gate(ctx, call):
    from ..sml.nodes import ListLiteral

    when_all = call.kwargs.get("when_all")
    if when_all is None:
        return None
    if not isinstance(when_all, ListLiteral):
        raise ctx.error(f"{call.func} when_all= must be a list", call.span)
    conds = [ctx.compile_expr(e) for e in when_all.items]
    return nullsafe.strict_all(conds) if conds else None


def _cache_set(ctx, call, args, family: str):
    key_v = arg(ctx, call, args, "key")
    value_v = arg(ctx, call, args, "value")
    ttl = const_arg(ctx, call, args, "ttl_seconds", required=False, default=DAY)
    if float(ttl) < 1.0:
        raise ctx.error(
            f"{call.func}: ttl_seconds must be >= 1 (event-time cache reads have "
            f"whole-second resolution), got {ttl}",
            call.span,
        )
    gate = _gate(ctx, call)
    if not hasattr(ctx, "cache_sets"):
        ctx.cache_sets = []
    ctx.cache_sets.append(
        {
            "family": family,
            "key_repr": str(key_v.col),
            "key_col": key_v.col,
            "value_col": value_v.col,
            "gate": gate,
            "ttl": float(ttl),
            "idx": len(ctx.cache_sets),
        }
    )
    return Value(col=F.lit(None), dtype="none")


def _cache_get(ctx, call, args, family: str, default, out_dtype: str, cast: str):
    key_v = arg(ctx, call, args, "key")
    d = args.get("default")
    default_col = d.col if d is not None else F.lit(default)
    gate = _gate(ctx, call)
    sets = [
        s
        for s in getattr(ctx, "cache_sets", [])
        if s["family"] == family and s["key_repr"] == str(key_v.col)
    ]
    if not sets:
        raise ctx.error(
            f"{call.func}: no preceding Cache{'Set' + family} with the same key "
            "expression in this program (cross-program cache state is not "
            "supported — use labels or streaming state)",
            call.span,
        )
    from pyspark.sql import Window as W

    sec = F.col(ctx.bindings.timestamp).cast("timestamp").cast("long")
    candidates = []
    for s in sets:
        w = (
            W.partitionBy(s["key_col"])
            .orderBy(sec)
            # round() not int(): a fractional ttl (validated >= 1)
            # must not truncate a whole second off the frame
            .rangeBetween(-(round(s["ttl"]) - 1), 0)
        )
        set_row = s["gate"] if s["gate"] is not None else F.lit(True)
        set_row = F.coalesce(set_row, F.lit(False))
        # latest (ts, stmt_idx, value) among this statement's sets in-window
        cand = F.max(
            F.when(
                set_row,
                F.struct(
                    sec.alias("ts"),
                    F.lit(s["idx"]).alias("i"),
                    s["value_col"].cast(cast).alias("v"),
                ),
            )
        ).over(w)
        candidates.append(cand)
    latest = F.greatest(*candidates) if len(candidates) > 1 else candidates[0]
    result = F.coalesce(latest["v"], default_col)
    if gate is not None:
        result = F.when(F.coalesce(gate, F.lit(False)), result).otherwise(default_col)
    return Value(col=result, dtype=out_dtype)


@register("CacheSetStr")
def cache_set_str(ctx, call, args):
    """ref: example_plugins/src/udfs/cache.py:278-284."""
    return _cache_set(ctx, call, args, "Str")


@register("CacheSetInt")
def cache_set_int(ctx, call, args):
    """ref: example_plugins/src/udfs/cache.py:287-293."""
    return _cache_set(ctx, call, args, "Int")


@register("CacheSetFloat")
def cache_set_float(ctx, call, args):
    """ref: example_plugins/src/udfs/cache.py:296-302."""
    return _cache_set(ctx, call, args, "Float")


@register("CacheGetStr")
def cache_get_str(ctx, call, args):
    """ref: example_plugins/src/udfs/cache.py:305-311."""
    return _cache_get(ctx, call, args, "Str", "", "str", "string")


@register("CacheGetInt")
def cache_get_int(ctx, call, args):
    """ref: example_plugins/src/udfs/cache.py:314-320."""
    return _cache_get(ctx, call, args, "Int", 0, "int", "long")


@register("CacheGetFloat")
def cache_get_float(ctx, call, args):
    """ref: example_plugins/src/udfs/cache.py:323-329."""
    return _cache_get(ctx, call, args, "Float", 0.0, "float", "double")

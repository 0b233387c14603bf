"""List UDFs + blocklist membership (SURVEY.md §2.3).

Blocklists (``ListContains`` family, ref: example_plugins/src/udfs/
list.py) are compile-time constant sets here — at cluster scale a
large list becomes a broadcast join, which the engine layer provides
via ``operators.blocklist_join``.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ..compiler.values import Value
from .registry import arg, const_arg, const_str_list, raw_arg, register

# named lists registered by the host application
# (the reference loads them from a lists service; we keep a registry)
NAMED_LISTS: dict[str, list[str]] = {}


def register_named_list(name: str, values: list[str]) -> None:
    NAMED_LISTS[name] = list(values)


@register("ListLength")
def list_length(ctx, call, args):
    """ref: stdlib/udfs/list_length.py:11."""
    return Value(col=F.size(arg(ctx, call, args, "list").col), dtype="int")


@register("ListRead")
def list_read(ctx, call, args):
    """ref: stdlib/udfs/list_read.py:14 — 0-based index."""
    lst = arg(ctx, call, args, "list")
    index = const_arg(ctx, call, args, "index")
    return Value(col=F.element_at(lst.col, int(index) + 1), dtype=lst.elem_type)


@register("ListSort")
def list_sort(ctx, call, args):
    """ref: stdlib/udfs/list_sort.py:12."""
    lst = arg(ctx, call, args, "list")
    return Value(col=F.array_sort(lst.col), dtype=lst.dtype)


@register("ConcatStringLists")
def concat_string_lists(ctx, call, args):
    """ref: example_plugins/src/udfs/list.py:369 — None lists skipped."""
    from ..sml.nodes import ListLiteral

    node = raw_arg(ctx, call, args, "lists")
    if not isinstance(node, ListLiteral):
        raise ctx.error("ConcatStringLists requires lists=[...]", call.span)
    cols = [F.coalesce(ctx.compile_expr(e).col, F.array().cast("array<string>")) for e in node.items]
    return Value(col=F.concat(*cols) if cols else F.array().cast("array<string>"), dtype="list:str")


def _named_list(ctx, call, args) -> list[str]:
    name = const_arg(ctx, call, args, "list_name", required=False)
    if name is not None:
        values = NAMED_LISTS.get(name)
        if values is None:
            raise ctx.error(f"unknown named list {name!r}", call.span)
        return values
    return const_str_list(ctx, call, "values", args=args)


@register("SimpleListContains", query=True)
def simple_list_contains(ctx, call, args):
    """Is the string in the named list?
    (ref: example_plugins/src/udfs/list.py:270)."""
    s = args.get("s") or args.get("value") or args.get("target")
    if s is None:
        raise ctx.error("SimpleListContains requires s=", call.span)
    values = _named_list(ctx, call, args)
    return Value(col=F.coalesce(s.col.isin(values), F.lit(False)), dtype="bool")


@register("ListContains")
def list_contains(ctx, call, args):
    """First blocklisted item found in a string list, else NULL
    (ref: example_plugins/src/udfs/list.py:212)."""
    lst = arg(ctx, call, args, "list")
    values = _named_list(ctx, call, args)
    hits = F.array_intersect(lst.col, F.array(*[F.lit(v) for v in values]))
    return Value(col=F.element_at(hits, 1), dtype="str")


@register("ListContainsCount")
def list_contains_count(ctx, call, args):
    """How many list items are blocklisted
    (ref: example_plugins/src/udfs/list.py:240)."""
    lst = arg(ctx, call, args, "list")
    values = _named_list(ctx, call, args)
    hits = F.array_intersect(lst.col, F.array(*[F.lit(v) for v in values]))
    return Value(col=F.size(hits), dtype="int")


# Public-knowledge leetspeak confusable classes (deliberately NOT the
# reference's 1.9k-line confusables data table, which is data we don't
# copy — same idea, independent table).
_LEET = {
    "a": "a@4àáâä",
    "b": "b8",
    "c": "c<({[k",
    "e": "e3èéêë",
    "g": "g9",
    "i": "i1!íìî",
    "l": "l1|",
    "o": "o0òóôö",
    "s": "s5$z",
    "t": "t7+",
    "u": "uüùú",
    "z": "z2s",
}

_CLASS_ESCAPE = {c: "\\" + c for c in "\\]^-["}


def _censorize_regex(word: str, plurals: bool = False, word_boundaries: bool = True) -> str:
    """Compile one blocklist word to a Java regex matching leetspeak
    variants: each letter becomes its confusable class, with one
    optional separator char allowed between letters ('c a t', 'c.a.t')."""
    parts = []
    for ch in word.lower():
        cls = _LEET.get(ch)
        if cls:
            parts.append("[" + "".join(_CLASS_ESCAPE.get(c, c) for c in cls) + "]")
        else:
            parts.append(re.escape(ch))
    body = r"[\W_]?".join(parts)
    if plurals:
        body += r"(?:e?[sz])?"
    if word_boundaries:
        body = r"(?<![A-Za-z0-9])" + body + r"(?![A-Za-z0-9])"
    return "(?i)" + body


@register("CensorizedListContains")
def censorized_list_contains(ctx, call, args):
    """First blocklist word whose *censorized* regex matches any
    phrase, else NULL (ref: example_plugins/src/udfs/list.py:330-359
    CensorizedListContains — 'cat' also matches 'c@t'/'<4t').

    ``must_be_censorized=True`` returns a word only when the matched
    text is not the plain word itself (the reference's documented
    intent at list.py:325-328; its code compares the match against
    the whole phrase, which misfires for multi-word phrases — we
    compare against the word). Patterns compile once per ruleset;
    matching is JVM rlike/regexp_extract over the phrase array —
    no Python."""
    import re as _re

    phrases = args.get("phrases") or args.get("s")
    if phrases is None:
        raise ctx.error("CensorizedListContains requires phrases=", call.span)
    plurals = const_arg(ctx, call, args, "plurals", required=False, default=False)
    must_be = const_arg(ctx, call, args, "must_be_censorized", required=False, default=False)
    boundaries = const_arg(ctx, call, args, "word_boundaries", required=False, default=True)
    words = _named_list(ctx, call, args)
    arr = phrases.col if phrases.dtype.startswith("list") else F.array(phrases.col)
    col = F.lit(None).cast("string")
    branches = []
    def _hit_fn(pat: str, word: str):
        if must_be:
            return lambda ph: F.coalesce(ph, F.lit("")).rlike(pat) & (
                F.lower(F.regexp_extract(ph, pat, 0)) != F.lit(word.lower())
            )
        return lambda ph: F.coalesce(ph, F.lit("")).rlike(pat)

    for w in words:
        pat = _censorize_regex(w, plurals=plurals, word_boundaries=boundaries)
        _re.compile(pat)  # pattern syntax sanity at ruleset-compile time
        branches.append((F.exists(arr, _hit_fn(pat, w)), w))
    for hit, w in reversed(branches):
        col = F.when(hit, F.lit(w)).otherwise(col)
    return Value(col=col, dtype="str")


@register("RegexListContains")
def regex_list_contains(ctx, call, args):
    """Does any regex in the named list match the target?
    (ref: example_plugins/src/udfs/list.py:303)."""
    import re as _re

    target = args.get("target") or args.get("s")
    if target is None:
        raise ctx.error("RegexListContains requires target=", call.span)
    patterns = _named_list(ctx, call, args)
    col = F.lit(False)
    for p in patterns:
        _re.compile(p)
        col = col | F.coalesce(target.col.rlike(p), F.lit(False))
    return Value(col=col, dtype="bool")

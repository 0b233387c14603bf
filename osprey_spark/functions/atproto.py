"""Atproto (Bluesky) plugin UDFs: richtext facets + at:// URIs.

ref: example_plugins/src/udfs/atproto/facets.py. The reference walks
the action's ``operation.record.facets`` JSON with per-row Python; we
parse it once with ``from_json`` and extract links/mentions/tags with
higher-order array functions — all JVM-side.

Divergence (documented): the reference returns early from the facet
loop when a facet has no ``features`` key, silently dropping later
facets (facets.py:46-49); we scan all facets.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..compiler.values import Value
from .registry import arg, register

_FACETS_SCHEMA = (
    "array<struct<features:array<struct<`$type`:string,uri:string,did:string,tag:string>>>>"
)

_FACETS_PATH = "$.operation.record.facets"


def _all_features(ctx):
    facets = F.from_json(
        F.get_json_object(F.col(ctx.bindings.data), _FACETS_PATH), _FACETS_SCHEMA
    )
    return F.flatten(F.filter(F.transform(facets, lambda fa: fa["features"]), lambda x: x.isNotNull()))


def _facet_values(ctx, feature_type: str, field: str):
    feats = _all_features(ctx)
    vals = F.transform(
        F.filter(
            feats,
            lambda f: (f["$type"] == F.lit(feature_type)) & f[field].isNotNull(),
        ),
        lambda f: F.lower(f[field]),
    )
    # no facets → [] (ref: facets.py:39-40)
    return F.coalesce(vals, F.array().cast("array<string>"))


@register("LinksFromFacets")
def links_from_facets(ctx, call, args):
    """ref: example_plugins/src/udfs/atproto/facets.py:36-56."""
    return Value(col=_facet_values(ctx, "app.bsky.richtext.facet#link", "uri"), dtype="list:str")


@register("MentionsFromFacets")
def mentions_from_facets(ctx, call, args):
    """ref: example_plugins/src/udfs/atproto/facets.py:59-79."""
    return Value(col=_facet_values(ctx, "app.bsky.richtext.facet#mention", "did"), dtype="list:str")


@register("TagsFromFacets")
def tags_from_facets(ctx, call, args):
    """ref: example_plugins/src/udfs/atproto/facets.py (tag variant)."""
    return Value(col=_facet_values(ctx, "app.bsky.richtext.facet#tag", "tag"), dtype="list:str")


@register("AtprotoList")
def atproto_list(ctx, call, args):
    """List effect: add ``did`` to the moderation list at
    ``list_uri`` when the enclosing WhenRules fires (ref:
    example_plugins/src/udfs/atproto/list.py:59-62). Fired effects
    serialize into the ``atproto_list`` extracted-feature column as
    ``'did|list_uri'`` (to_str, list.py:31-32)."""
    from ..compiler.values import Effect

    did = arg(ctx, call, args, "did")
    list_uri = arg(ctx, call, args, "list_uri")
    return Value(
        col=F.lit(None),
        dtype="effect",
        effect=Effect(
            kind="list",
            extra={
                "did": did.col.cast("string"),
                "list_uri": list_uri.col.cast("string"),
            },
        ),
    )


@register("DidFromUri")
def did_from_uri(ctx, call, args):
    """``at://<did>/<collection>/<rkey>`` → did
    (ref: example_plugins/src/udfs/atproto/facets.py:17-29, lib/uri)."""
    uri = arg(ctx, call, args, "uri")
    did = F.regexp_extract(uri.col, r"^at://([^/]+)", 1)
    return Value(col=F.when(did != "", did), dtype="str")

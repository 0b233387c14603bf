"""Compile the reference's REAL example ruleset tree end-to-end.

Loads every ``*.sml`` under the reference checkout's ``example_rules/``
(read-only; tests skip when absent) into the compiler, evaluates
synthetic Bluesky-firehose actions, and asserts the rules fire as the
reference engine would (ref: example_rules/main.sml → rules/index.sml
→ rules/record/index.sml Require-dispatch by Collection).
"""

from __future__ import annotations

import json
import os
from datetime import datetime

import pytest

from pyspark.sql import functions as F

from osprey_spark.compiler import compile_ruleset

RULES_DIR = "/root/reference/example_rules"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RULES_DIR), reason="reference example_rules not available"
)


@pytest.fixture(scope="module")
def sources():
    out = {}
    for root, _dirs, files in os.walk(RULES_DIR):
        for f in files:
            if f.endswith(".sml"):
                full = os.path.join(root, f)
                out[os.path.relpath(full, RULES_DIR)] = open(full).read()
    return out


def _post_action(text, did="did:plc:someone", action="create", facets=None):
    record = {"text": text}
    if facets is not None:
        record["facets"] = facets
    return {
        "did": did,
        "eventMetadata": {"handle": "user.bsky.social", "pdsHost": "pds.example"},
        "operation": {
            "action": action,
            "collection": "app.bsky.feed.post",
            "path": "app.bsky.feed.post/3kabc",
            "cid": "bafy123",
            "record": record,
        },
    }


def _run(spark, sources, actions):
    rs = compile_ruleset(sources)
    rows = [
        (i + 1, a.get("_name", "record_event"), json.dumps(a), datetime(2024, 1, 1))
        for i, a in enumerate(actions)
    ]
    df = spark.createDataFrame(
        rows, "action_id long, action_name string, data string, ts timestamp"
    )
    out = rs.apply(df).orderBy("__action_id")
    return rs, [r.asDict() for r in out.collect()]


def test_full_tree_compiles(spark, sources):
    assert len(sources) == 25
    rs = compile_ruleset(sources)
    # spot-check features defined across the model chain
    for feat in ("ActionName", "UserId", "PostText", "PostContainsHelloRule",
                 "HaileyProfileRule", "FacetLinkDomains", "AtUri"):
        assert feat in rs.ctx.features, feat


def test_post_contains_hello_rule(spark, sources):
    link_facet = [{"features": [{"$type": "app.bsky.richtext.facet#link",
                                 "uri": "https://Spam.Example.com/x"}]}]
    _rs, rows = _run(
        spark,
        sources,
        [
            _post_action("well HELLO there"),
            _post_action("nothing to see"),
            _post_action("hello with link", facets=link_facet),
            _post_action("hello but deleted", action="delete"),
        ],
    )
    assert rows[0]["PostContainsHelloRule"] is True
    assert rows[1]["PostContainsHelloRule"] is False
    assert rows[2]["PostContainsHelloRule"] is True
    assert rows[2]["FacetLinkList"] == ["https://spam.example.com/x"]
    assert rows[2]["FacetLinkDomains"] == ["spam.example.com"]
    # delete op: post rules file not Required → guarded features null
    assert rows[3]["PostContainsHelloRule"] is None


# --- full record-type replay matrix -----------------------------------------
# One fixture action per Require-dispatched record type
# (ref: example_rules/rules/record/index.sml). Every rules/record/<type>/
# directory in the reference tree MUST have an entry here (enforced by
# test_every_record_type_has_a_replay_fixture), so a new record type in
# the reference fails this corpus loudly instead of being silently
# unreplayed. Skip-list for types using genuinely-external UDFs: empty —
# the whole tree compiles against this engine's registry.
UNREPLAYABLE_RECORD_TYPES: set[str] = set()

_SUBJECT_URI = "at://did:plc:subject/app.bsky.feed.post/3kpost"

RECORD_TYPE_FIXTURES = {
    "post": (
        "app.bsky.feed.post",
        {"text": "hello everyone"},
        {"PostText": "hello everyone", "PostContainsHelloRule": True},
    ),
    "profile": (
        "app.bsky.actor.profile",
        {"displayName": "someone"},
        {"HaileyProfileRule": False},
    ),
    "like": (
        "app.bsky.feed.like",
        {"subject": {"uri": _SUBJECT_URI}},
        {"LikeSubject": _SUBJECT_URI, "LikeSubjectDid": "did:plc:subject"},
    ),
    "repost": (
        "app.bsky.feed.repost",
        {"subject": {"uri": _SUBJECT_URI}},
        {"RepostSubject": _SUBJECT_URI, "RepostSubjectDid": "did:plc:subject"},
    ),
    "follow": (
        "app.bsky.graph.follow",
        {"subject": "did:plc:followee"},
        {"FollowSubjectDid": "did:plc:followee"},
    ),
    "block": (
        "app.bsky.graph.block",
        {"subject": "did:plc:blocked"},
        {"BlockSubjectDid": "did:plc:blocked"},
    ),
    "list": (
        "app.bsky.graph.list",
        {"name": "mute list", "purpose": "app.bsky.graph.defs#modlist"},
        {"ListName": "mute list", "ListPurpose": "app.bsky.graph.defs#modlist"},
    ),
    "listitem": (
        "app.bsky.graph.listitem",
        {"subject": "did:plc:member", "list": _SUBJECT_URI},
        {"ListitemSubjectDid": "did:plc:member", "ListitemList": _SUBJECT_URI},
    ),
    "starterpack": (
        "app.bsky.graph.starterpack",
        {"name": "starter", "list": _SUBJECT_URI},
        {"StarterpackList": _SUBJECT_URI, "StarterpackName": "starter"},
    ),
}


def _record_action(collection, record, action="create"):
    return {
        "did": "did:plc:author",
        "eventMetadata": {"handle": "user.bsky.social", "pdsHost": "pds.example"},
        "operation": {
            "action": action,
            "collection": collection,
            "path": f"{collection}/3kabc",
            "cid": "bafy123",
            "record": record,
        },
    }


def test_every_record_type_has_a_replay_fixture():
    on_disk = {
        d
        for d in os.listdir(os.path.join(RULES_DIR, "rules", "record"))
        if os.path.isdir(os.path.join(RULES_DIR, "rules", "record", d))
    }
    assert on_disk == set(RECORD_TYPE_FIXTURES) | UNREPLAYABLE_RECORD_TYPES


@pytest.mark.parametrize("rtype", sorted(RECORD_TYPE_FIXTURES))
def test_record_type_replay(spark, sources, rtype):
    """Replay the full reference tree on one action of each record
    type: the type's model features extract the reference values, the
    Require-dispatch gates every OTHER type's features to NULL, and
    the shared base-model features resolve."""
    collection, record, expected = RECORD_TYPE_FIXTURES[rtype]
    _rs, rows = _run(
        spark,
        sources,
        [_record_action(collection, record),
         _record_action(collection, record, action="delete")],
    )
    created, deleted = rows
    for feat, want in expected.items():
        assert created[feat] == want, (rtype, feat, created[feat])
        # delete ops never Require the type's rules file in
        # (ref: rules/record/index.sml require_if=IsCreate or IsUpdate)
        if not isinstance(want, bool):
            assert deleted[feat] is None, (rtype, feat)
    # base model resolves on every operation
    assert created["Collection"] == collection
    assert created["UserId"] == "did:plc:author"
    assert created["AtUri"] == f"at://did:plc:author/{collection}/3kabc"
    assert created["IsOperation"] is True
    # dispatch isolation: other types' marquee features stay NULL
    others = {
        feat
        for t, (_c, _r, exp) in RECORD_TYPE_FIXTURES.items()
        if t != rtype
        for feat in exp
        if not isinstance(exp[feat], bool)
    }
    for feat in others:
        assert created[feat] is None, (rtype, "leaked", feat)


def test_hailey_profile_label_effect(spark, sources):
    hailey = "did:plc:oisofpd7lj26yvgiivf3lxsi"
    profile = {
        "did": hailey,
        "eventMetadata": {"handle": "hailey.at", "pdsHost": "pds.example"},
        "operation": {
            "action": "update",
            "collection": "app.bsky.actor.profile",
            "path": "app.bsky.actor.profile/self",
            "cid": "bafy9",
            "record": {"displayName": "hailey"},
        },
    }
    _rs, rows = _run(spark, sources, [profile, _post_action("hi")])
    assert rows[0]["HaileyProfileRule"] is True
    assert rows[0]["__entity_label_mutations"] == ["UserId/hailey/added"]
    assert rows[1]["HaileyProfileRule"] is None  # profile file not required
    assert rows[1]["__entity_label_mutations"] == []

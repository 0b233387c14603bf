"""HasLabel / window-count / snowflake-bucket UDF semantics.

Mirrors the reference's per-UDF test style
(engine/stdlib/udfs/tests/test_*.py) through the Spark compiler.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from osprey_spark.compiler.compile import compile_sml
from osprey_spark.compiler.compile import InputBindings


def _apply(spark, sml, rows, labels_rows=None):
    import json

    data = [
        (i + 1, "a", json.dumps({k: v for k, v in r.items() if k != "_ts"}),
         r.get("_ts", datetime(2024, 1, 1)))
        for i, r in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "action_id long, action_name string, data string, ts timestamp"
    )
    labels_df = None
    if labels_rows is not None:
        labels_df = spark.createDataFrame(
            labels_rows,
            "entity_type string, entity_id string, label string, status string,"
            " expires_at_unix long, mutation_ts timestamp",
        )
    rs = compile_sml(sml, bindings=InputBindings())
    out = rs.apply(df, labels_df=labels_df).orderBy("__action_id")
    return [r.asDict() for r in out.collect()]


HASLABEL_SML = """
U: Entity[str] = EntityJson(type='User', path='$.uid')
Banned = HasLabel(entity=U, label='banned')
WasBanned = HasLabel(entity=U, label='banned', status='removed')
OldBan = HasLabel(entity=U, label='banned', min_label_age=TimeDelta(hours=2))
"""


def test_has_label_join(spark):
    ts = datetime(2024, 1, 1, 12, 0, 0)
    labels = [
        # active, mutated 3h before the action → also satisfies min_age
        ("User", "u1", "banned", "added", 0, datetime(2024, 1, 1, 9, 0, 0)),
        # expired before the action's event time
        ("User", "u2", "banned", "added", int(datetime(2024, 1, 1, 10, 0, 0).timestamp()), datetime(2024, 1, 1, 9, 0, 0)),
        # removed
        ("User", "u3", "banned", "removed", 0, datetime(2024, 1, 1, 9, 0, 0)),
        # fresh add (30 min old) → fails min_label_age=2h
        ("User", "u5", "banned", "added", 0, datetime(2024, 1, 1, 11, 30, 0)),
    ]
    rows = [{"uid": u, "_ts": ts} for u in ("u1", "u2", "u3", "u4", "u5")]
    out = _apply(spark, HASLABEL_SML, rows, labels)
    by_uid = {r["U"]: r for r in out}
    assert by_uid["u1"]["Banned"] is True and by_uid["u1"]["OldBan"] is True
    assert by_uid["u2"]["Banned"] is False  # expired
    assert by_uid["u3"]["Banned"] is False and by_uid["u3"]["WasBanned"] is True
    assert by_uid["u4"]["Banned"] is False  # never labeled
    assert by_uid["u5"]["Banned"] is True and by_uid["u5"]["OldBan"] is False


def test_has_label_requires_snapshot(spark):
    with pytest.raises(ValueError, match="HasLabel"):
        _apply(spark, HASLABEL_SML, [{"uid": "u1"}], labels_rows=None)


WINDOW_SML = """
K: str = JsonData(path='$.k')
N = IncrementWindow(key=K, window_seconds=60.0)
NGated = GetWindowCount(key=K, window_seconds=60.0, when_all=[K == 'a'])
"""


def test_window_count(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        {"k": "a", "_ts": t0},
        {"k": "a", "_ts": t0.replace(second=30)},
        {"k": "b", "_ts": t0.replace(second=40)},
        {"k": "a", "_ts": t0.replace(minute=1, second=20)},  # 00:00 fell out
        {"k": "a", "_ts": t0.replace(minute=5)},  # window empty again
    ]
    out = _apply(spark, WINDOW_SML, rows)
    ns = [r["N"] for r in out]
    assert ns == [1, 2, 1, 2, 1]
    gated = [r["NGated"] for r in out]
    assert gated == [1, 2, 0, 2, 1]  # 'b' row gated to 0


def test_snowflake_bucket(spark):
    # snowflake carrying ms timestamp 7_200_000 (02:00) → bucket 7200
    sf = 7_200_000 << 22
    out = _apply(
        spark,
        f"B = GetSnowflakeBucket(snowflake={sf}, granularity_seconds=3600)",
        [{}],
    )
    assert out[0]["B"] == 7200


def test_snowflake_bucket_rejects_small_granularity(spark):
    from osprey_spark.sml.errors import SmlValidationError

    with pytest.raises(SmlValidationError, match="3600"):
        _apply(spark, "B = GetSnowflakeBucket(snowflake=1, granularity_seconds=60)", [{}])


CACHE_SML = """
K: str = JsonData(path='$.k')
V: str = JsonData(path='$.v')
IsSet = V != 'x'
CacheSetStr(key=K, value=V, when_all=[IsSet], ttl_seconds=60.0)
Got = CacheGetStr(key=K, default='none')
"""


def test_cache_set_get(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        {"k": "a", "v": "v1", "_ts": t0},                       # sets a=v1
        {"k": "a", "v": "x", "_ts": t0.replace(second=30)},     # gated: no set; reads v1
        {"k": "b", "v": "x", "_ts": t0.replace(second=40)},     # b never set -> default
        {"k": "a", "v": "v2", "_ts": t0.replace(second=50)},    # overwrites a=v2
        {"k": "a", "v": "x", "_ts": t0.replace(minute=5)},      # ttl expired -> default
    ]
    out = _apply(spark, CACHE_SML, rows)
    assert [r["Got"] for r in out] == ["v1", "v1", "none", "v2", "none"]


def test_cache_get_requires_matching_set(spark):
    from osprey_spark.sml.errors import SmlValidationError

    with pytest.raises(SmlValidationError, match="no preceding"):
        _apply(spark, "K: str = JsonData(path='$.k')\nG = CacheGetInt(key=K)", [{"k": "a"}])


GATED_WINDOW_SML = """
K: str = JsonData(path='$.k')
IsErr: bool = JsonData(path='$.is_err', coerce_type='bool')
NErr = IncrementWindow(key=K, window_seconds=60.0, when_all=[IsErr])
ReadErr = GetWindowCount(key=K, window_seconds=60.0)
"""


def test_window_increment_gating(spark):
    """Only gated events zadd (ref cache.py:336-341): the counter is
    sum(increment_gate) in-window, not a count of all key events; a
    paired GetWindowCount reads the same gated counter."""
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        {"k": "a", "is_err": True, "_ts": t0},
        {"k": "a", "is_err": False, "_ts": t0.replace(second=10)},  # no zadd
        {"k": "a", "is_err": True, "_ts": t0.replace(second=20)},
        {"k": "a", "is_err": False, "_ts": t0.replace(second=30)},  # no zadd
    ]
    out = _apply(spark, GATED_WINDOW_SML, rows)
    # gated-off events return 0 AND don't count toward later windows
    assert [r["NErr"] for r in out] == [1, 0, 2, 0]
    # read-only pairing: counts increments only (2 by t=30), even on
    # events that did not themselves increment
    assert [r["ReadErr"] for r in out] == [1, 1, 2, 2]


def test_mx_lookup_table(spark):
    from osprey_spark.functions.core import MX_TABLE, register_mx_table

    sml = "D: str = JsonData(path='$.d')\nMx = MXLookup(domain=D)\n"
    register_mx_table({"Example.com": "mx1.example.com"})
    try:
        out = _apply(spark, sml, [{"d": "example.com"}, {"d": "EXAMPLE.COM"}, {"d": "nope.io"}])
        assert [r["Mx"] for r in out] == ["mx1.example.com", "mx1.example.com", None]
    finally:
        MX_TABLE.clear()
    # no snapshot registered -> failed-node NULL semantics
    out = _apply(spark, sml, [{"d": "example.com"}])
    assert out[0]["Mx"] is None


def test_window_count_cap(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [{"k": "a", "_ts": t0.replace(second=i)} for i in range(10)]
    sml = "K: str = JsonData(path='$.k')\nN = IncrementWindow(key=K, window_seconds=60.0, max_events_cap=4)\n"
    out = _apply(spark, sml, rows)
    assert [r["N"] for r in out] == [1, 2, 3, 4, 4, 4, 4, 4, 4, 4]


def test_cache_pairs_by_key_value_not_expression(spark):
    """Redis pairing: a Get under a DIFFERENT key expression reads a
    Set whose key evaluates to the same value."""
    sml = """
A: str = JsonData(path='$.a')
B: str = JsonData(path='$.b')
V: str = JsonData(path='$.v')
IsSet = V != ''
CacheSetStr(key=StringToLower(s=A), value=V, when_all=[IsSet], ttl_seconds=60.0)
Got = CacheGetStr(key=B, default='none')
"""
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        {"a": "K1", "b": "zzz", "v": "hello", "_ts": t0},            # writes key 'k1'
        {"a": "xx", "b": "k1", "v": "", "_ts": t0.replace(second=30)},  # reads 'k1' via B
        {"a": "xx", "b": "k2", "v": "", "_ts": t0.replace(second=31)},  # miss
    ]
    out = _apply(spark, sml, rows)
    got = {r["B"]: r["Got"] for r in out}
    assert got["k1"] == "hello" and got["k2"] == "none"


def test_cache_overwrite_expiry_is_redis_exact(spark):
    """A newer Set overwrites; if the newest write's TTL lapsed the
    key is GONE even though an older longer-TTL write would still be
    in range (Redis overwrite semantics)."""
    sml = """
K: str = JsonData(path='$.k')
V: str = JsonData(path='$.v')
T: float = JsonData(path='$.ttl', coerce_type='float')
IsSet = V != ''
CacheSetStr(key=K, value=V, when_all=[IsSet, T >= 50.0], ttl_seconds=100.0)
CacheSetStr(key=K, value=V, when_all=[IsSet, T < 50.0], ttl_seconds=5.0)
Got = CacheGetStr(key=K, default='gone')
"""
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        {"k": "x", "v": "long", "ttl": 100.0, "_ts": t0},
        {"k": "x", "v": "short", "ttl": 5.0, "_ts": t0.replace(second=10)},
        {"k": "x", "v": "", "ttl": 0.0, "_ts": t0.replace(second=12)},  # short still live
        {"k": "x", "v": "", "ttl": 0.0, "_ts": t0.replace(second=40)},  # short expired -> gone
    ]
    out = sorted(_apply(spark, sml, rows), key=lambda r: r["__timestamp"])
    assert out[2]["Got"] == "short"
    assert out[3]["Got"] == "gone"  # NOT 'long': overwritten then expired


def test_sequence_matches_rolling_suffix(spark):
    """SequenceMatches: per event, the rolling last-K symbol suffix
    (current event included) is searched — a match appears exactly when
    its last symbol arrives and persists while still inside the
    window."""
    sml = """
K: str = JsonData(path='$.conv')
R: str = JsonData(path='$.role')
I: int = JsonData(path='$.i', coerce_type='int')
Hit = SequenceMatches(key=K, symbol=R, pattern='at{2}', last_k=3, order=I)
"""
    t0 = datetime(2024, 1, 1)
    rows = [
        {"conv": "c", "role": role, "i": i, "_ts": t0.replace(minute=i)}
        for i, role in enumerate(["assistant", "tool", "tool", "user", "tool"])
    ]
    out = sorted(_apply(spark, sml, rows), key=lambda r: r["I"])
    # suffix windows (k=3): a, at, att*, ttu, tut
    assert [r["Hit"] for r in out] == [False, False, True, False, False]


def test_sequence_matches_order_breaks_ts_ties(spark):
    """Equal-timestamp events order by the order= expression."""
    sml = """
K: str = JsonData(path='$.conv')
R: str = JsonData(path='$.role')
I: int = JsonData(path='$.i', coerce_type='int')
Hit = SequenceMatches(key=K, symbol=R, pattern='at', last_k=2, order=I)
"""
    t0 = datetime(2024, 1, 1)
    # same ts; order= says assistant first, tool second -> 'at' matches
    rows = [
        {"conv": "c", "role": "tool", "i": 2, "_ts": t0},
        {"conv": "c", "role": "assistant", "i": 1, "_ts": t0},
    ]
    out = sorted(_apply(spark, sml, rows), key=lambda r: r["I"])
    assert [r["Hit"] for r in out] == [False, True]


def test_sequence_matches_validation(spark):
    from osprey_spark.sml.errors import SmlValidationError

    base = """
K: str = JsonData(path='$.conv')
R: str = JsonData(path='$.role')
Hit = SequenceMatches(key=K, symbol=R, pattern={pat}, last_k={k})
"""
    for pat, k, msg in [
        ("'a*'", 8, "empty"),
        ("'^at'", 8, "anchor"),
        ("'at'", 0, "last_k"),
        ("'at'", 1000, "last_k"),
        ("'(a'", 8, "invalid pattern"),
    ]:
        with pytest.raises(SmlValidationError, match=msg):
            compile_sml(base.format(pat=pat, k=k), bindings=InputBindings())

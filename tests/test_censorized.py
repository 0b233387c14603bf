"""CensorizedListContains (ref: example_plugins/src/udfs/list.py:330)
+ CheckCensorized single-UDF-evaluation plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from osprey_spark.compiler import compile_ruleset
from osprey_spark.functions.lists import register_named_list


def _apply(spark, sml, texts):
    rows = [(i, "act", '{"t": %s}' % __import__("json").dumps(t), "2024-01-01 00:00:00")
            for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "action_id long, action_name string, data string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return compile_ruleset({"main.sml": sml}).apply(df)


def test_censorized_matches_leet_variants(spark):
    register_named_list("badwords", ["cat", "virus"])
    sml = """
T: str = JsonData(path='$.t')
Hit = CensorizedListContains(phrases=[T], list_name='badwords')
"""
    texts = ["my c@t is cute", "the <4t ran", "v1ru5 alert", "plain cat", "dog only", "concatenate"]
    got = [r["Hit"] for r in _apply(spark, sml, texts).orderBy("__action_id").collect()]
    # word_boundaries=True: 'concatenate' must NOT match 'cat'
    assert got == ["cat", "cat", "virus", "cat", None, None]


def test_censorized_must_be_censorized(spark):
    register_named_list("badwords2", ["cat"])
    sml = """
T: str = JsonData(path='$.t')
Hit = CensorizedListContains(phrases=[T], list_name='badwords2', must_be_censorized=True)
"""
    texts = ["a c@t here", "a cat here", "no match"]
    got = [r["Hit"] for r in _apply(spark, sml, texts).orderBy("__action_id").collect()]
    assert got == ["cat", None, None]


def test_censorized_plurals_and_separators(spark):
    register_named_list("badwords3", ["cat"])
    sml = """
T: str = JsonData(path='$.t')
Hit = CensorizedListContains(phrases=[T], list_name='badwords3', plurals=True)
"""
    texts = ["the c.a.t.s", "c4ts run", "cats"]
    got = [r["Hit"] for r in _apply(spark, sml, texts).orderBy("__action_id").collect()]
    assert got == ["cat", "cat", "cat"]


def test_check_censorized_single_arrow_eval_node(spark):
    register_named_list("censor", ["virus", "badword", "spamword", "evil"])
    sml = """
T: str = JsonData(path='$.t')
Censored = CheckCensorized(s=T, list_name='censor')
"""
    out = _apply(spark, sml, ["a vírus here", "clean text"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1  # one cleaned-string eval for 4 words
    got = {r["__action_id"]: r["Censored"] for r in out.collect()}
    assert got == {0: True, 1: False}  # accent-folded 'vírus' -> 'virus'


def test_string_clean_options(spark):
    sml = """
T: str = JsonData(path='$.t')
Homo = StringClean(s=T)
Leet = StringClean(s=T, l33t=True, lower=True)
Bare = StringClean(s=T, remove_punctuation=True, remove_space=True, lower=True)
Upper = StringClean(s=T, upper=True)
"""
    texts = ["h3llo  wОrld!", "|4 C@T"]
    out = _apply(spark, sml, texts).orderBy("__action_id").collect()
    # homoglyph default: cyrillic О -> o (after lower? no — homoglyph
    # maps lowercase cyrillic; NFKC keeps О) ; space collapsed
    assert out[0]["Leet"] == "hello wоrld!"  # 3->e, lowercased
    assert out[1]["Homo"] == "|4 CaT"        # @ -> a
    assert out[0]["Bare"] == "h3llowоrld"
    assert out[1]["Upper"] == "|4 CAT"


def test_domain_tld_multilabel(spark):
    sml = "D: str = JsonData(path='$.t')\nTld = DomainTld(domain=D)\n"
    got = [r["Tld"] for r in _apply(
        spark, sml, ["shop.example.co.uk", "example.com", "foo.com.au", "bare"]
    ).orderBy("__action_id").collect()]
    assert got == ["co.uk", "com", "com.au", "bare"]


def test_ip_network_v4_and_v6(spark):
    sml = "IP: str = JsonData(path='$.t')\nNet = IpNetwork(ip=IP)\n"
    got = [r["Net"] for r in _apply(
        spark, sml, ["10.1.2.3", "2001:db8:abcd:12ff:1:2:3:4", "not an ip with : colon"]
    ).orderBy("__action_id").collect()]
    assert got == ["10.1.2.0/24", "2001:db8:abcd:12ff::/64", None]

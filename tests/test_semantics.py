"""Null/comparison/boolean semantics parity.

Cases lifted from the reference's tests:
- engine/executor/tests/test_binary_comparison.py (equality with
  None, in/not-in, ordering, and/or)
- docs/rules.md "Nulls" table (strict-list Rule nulling)
"""

from __future__ import annotations

import pytest

from osprey_spark.testing import execute_one

EQ_PROGRAM = """
Foo: ExtractLiteral[str] = "hello"
Bar: ExtractLiteral[str] = "world"
Bizz: Optional[str] = None
Buzz: Optional[str] = "some_value"
Ret: bool = {statement}
"""


@pytest.mark.parametrize(
    "statement, expected",
    [
        ('Foo == "hello"', True),
        ('"hello" == Foo', True),
        ('"world" == Foo', False),
        ('Foo == "world"', False),
        ("Foo == Bar", False),
        ("Bar == Foo", False),
        ("Foo == Foo", True),
        ("None == None", True),
        ("Bizz == None", True),
        ("Buzz == None", False),
        ("None == Bizz", True),
        ("None == Buzz", False),
    ],
)
def test_equality(spark, statement, expected):
    data = execute_one(spark, EQ_PROGRAM.format(statement=statement))
    assert data == {"Foo": "hello", "Bar": "world", "Ret": expected}


def test_in_list(spark):
    data = execute_one(
        spark,
        """
A = [1, 2, 3]
T = 3 in A
F = 6 in A
""",
    )
    assert data == {"T": True, "F": False}


def test_in_string(spark):
    data = execute_one(
        spark,
        """
A = "123"
T1 = "23" in A
T2 = "1" in A
F1 = "4" in A
F2 = "1234" in A
""",
    )
    assert data == {"T1": True, "T2": True, "F1": False, "F2": False}


def test_not_in(spark):
    data = execute_one(
        spark,
        """
A = [1, 2, 3]
T = 4 not in A
F = 2 not in A
B = "123"
T1 = "13" not in B
F1 = "2" not in B
""",
    )
    assert data == {"T": True, "F": False, "T1": True, "F1": False}


def test_in_null_shield(spark):
    """ref: binary_comparison_executor.py:54-66 in_operator."""
    data = execute_one(
        spark,
        """
NullStr: Optional[str] = None
S = "abc"
L = ["a", "b"]
A = NullStr in NullStr
B = NullStr in S
C = "x" in NullStr
D = NullStr in L
""",
    )
    assert data == {"A": True, "B": False, "C": False, "D": False}


@pytest.mark.parametrize(
    "statement, expected",
    [
        ("A < B", True),
        ("A <= A", True),
        ("B > A", True),
        ("B >= A", True),
        ("B < A", False),
        ("B <= A", False),
        ("A > B", False),
        ("A >= B", False),
    ],
)
def test_cmp(spark, statement, expected):
    data = execute_one(spark, f"A = 1\nB = 2\nRet = {statement}")
    assert data == {"Ret": expected}


@pytest.mark.parametrize(
    "statement, expected",
    [
        ("True or False", True),
        ("False or False or True", True),
        ("False or False", False),
        ("True and True and True", True),
        ("False and True and True", False),
        ("True and True and False", False),
    ],
)
def test_bool_ops(spark, statement, expected):
    data = execute_one(spark, f"Ret = {statement}")
    assert data == {"Ret": expected}


def test_null_coerces_falsey_in_bool_ops(spark):
    """ref: boolean_operation_executor.py:23-25 — failed operands are
    falsey inside and/or (unlike strict when_all lists)."""
    data = execute_one(
        spark,
        """
MaybeNull: Optional[bool] = None
AndRes = MaybeNull and True
OrRes = MaybeNull or True
OrRes2 = MaybeNull or False
""",
    )
    assert data == {"AndRes": False, "OrRes": True, "OrRes2": False}


def test_rule_null_semantics(spark):
    """docs/rules.md "Nulls": missing data → != Null is False;
    ordering comparison is NULL; dependent rules stay NULL."""
    data = execute_one(
        spark,
        """
Thing: int = JsonData(path='$.property_that_doesnt_exist', required=False)
MyFirstRule = Rule(when_all=[Thing != None], description='d1')
MySecondRule = Rule(when_all=[Thing > 1], description='d2')
MyThirdRule = Rule(when_all=[MySecondRule], description='d3')
""",
    )
    assert data["MyFirstRule"] is False
    assert data["MySecondRule"] is None
    assert data["MyThirdRule"] is None


def test_rule_and_verdict(spark):
    """PostContainsHello-shaped rule end-to-end
    (ref: example_rules/rules/record/post/post_contains_hello.sml:10-15)."""
    from osprey_spark.testing import execute_sml

    sml = """
PostText: str = JsonData(path='$.text', required=False)
PostContainsHelloRule = Rule(
    when_all=['hello' in StringToLower(s=PostText)],
    description='Post text contains hello',
)
WhenRules(rules_any=[PostContainsHelloRule], then=[DeclareVerdict(verdict='flag_hello')])
"""
    rows = execute_sml(
        spark,
        sml,
        [{"text": "Hello World"}, {"text": "nothing"}, {}],
        keep_reserved=True,
    )
    assert rows[0]["PostContainsHelloRule"] is True
    assert rows[0]["__verdicts"] == ["flag_hello"]
    assert rows[1]["PostContainsHelloRule"] is False
    assert rows[1]["__verdicts"] == []
    assert rows[2]["PostContainsHelloRule"] is None
    assert rows[2]["__verdicts"] == []


def test_arithmetic(spark):
    data = execute_one(
        spark,
        """
A = 7
B = 2
Add = A + B
Sub = A - B
Mul = A * B
Div = A / B
FloorDiv = A // B
Mod = A % B
Neg = -A
SConcat = "x" + "y"
""",
    )
    assert data == {
        "Add": 9,
        "Sub": 5,
        "Mul": 14,
        "Div": 3.5,
        "FloorDiv": 3,
        "Mod": 1,
        "Neg": -7,
        "SConcat": "xy",
    }


def test_fstring_and_locals(spark):
    data = execute_one(
        spark,
        """
_Local = "in"
Name = "world"
Greeting = f"hello {Name}"
UsesLocal = f"with{_Local}"
""",
    )
    assert data == {"Greeting": "hello world", "UsesLocal": "within"}
    assert "_Local" not in data


def test_secret_not_extracted(spark):
    data = execute_one(
        spark,
        """
Visible = "a"
Hidden: Secret[str] = "b"
ConstNotExtracted = "c"
ConstExtracted: ExtractLiteral[str] = "d"
UsesHidden = Hidden == "b"
""",
    )
    assert data == {"ConstExtracted": "d", "UsesHidden": True}


# --- static-type transitions (ref: validate_static_types.py:722-782) --------


def test_string_repetition(spark):
    data = execute_one(
        spark,
        'S: ExtractLiteral[str] = "ab"\nN: ExtractLiteral[int] = 3\n'
        "R1: str = S * N\nR2: str = N * S\n",
    )
    assert data["R1"] == "ababab" and data["R2"] == "ababab"


@pytest.mark.parametrize(
    "expr",
    [
        "'a' + 1",          # Add has no (str, num) transition
        "'a' - 'b'",        # Subtract is numeric-only
        "'a' * 'b'",        # Multiply: str*str invalid
        "'a' * 1.5",        # Multiply: str*float invalid
        "'a' < 'b'",        # ordering comparisons are numeric-only
        "1 < 'b'",
        "'a' == 1",         # incompatible kinds
        "[1] == 'a'",
        "1 in 5",           # `in` needs str or List on the right
        "1 in 'abc'",       # str `in` str needs str on the left
        "1.5 << 2",         # shifts are int-only
        "1 & 2.5",          # bitwise is int-only
    ],
)
def test_static_type_errors(spark, expr):
    from osprey_spark.compiler import compile_ruleset
    from osprey_spark.sml.errors import SmlError

    with pytest.raises(SmlError, match="unsupported operand|incompatible types"):
        compile_ruleset({"main.sml": f"X = {expr}\n"})


def test_annotated_operands_type_as_annotated(spark):
    # annotated JsonData carries its type into the transition checks;
    # un-annotated JsonData is a *string* feature here (documented) so
    # arithmetic on it errors — the reference is stricter still: an
    # un-annotated dynamic call is itself invalid (ref: ast_validator/
    # validators/validate_dynamic_calls_have_annotated_rvalue.py)
    from osprey_spark.compiler import compile_ruleset
    from osprey_spark.sml.errors import SmlError

    compile_ruleset(
        {"main.sml": "V: int = JsonData(path='$.v')\nX = V + 1\nY = V < 5\n"}
    )
    with pytest.raises(SmlError, match="unsupported operand"):
        compile_ruleset({"main.sml": "V = JsonData(path='$.v')\nX = V + 1\n"})

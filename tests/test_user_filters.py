"""User filter extension surface (SURVEY.md §2.6): plain Python
functions registered into a registry dict, shipped into the UDF."""

import json

import pytest

from scrapelect_spark.errors import EvalError
from scrapelect_spark.functions.dom import parse_html
from scrapelect_spark.functions.interpreter import Interpreter
from scrapelect_spark.functions.registry import extended_registry, register_filter
from scrapelect_spark.plans import parse_program


def make_registry():
    reg = extended_registry()

    @register_filter(reg, "shout", value_type="string")
    def shout(value):
        return value.upper()

    @register_filter(
        reg, "clamp", value_type="int",
        params=[("lo", "int", False), ("hi", "int", False)],
    )
    def clamp(value, lo, hi):
        return max(lo, min(hi, value))

    return reg


def test_user_filter_local():
    interp = Interpreter(registry=make_registry())
    out = interp.interpret_document(
        parse_program('a: "hi" | shout(); b: 99 | clamp(lo: 0, hi: 10);'),
        parse_html("<html></html>"),
        "file:///x",
    )
    assert out == {"a": "HI", "b": 10}


def test_user_filter_arg_validation():
    interp = Interpreter(registry=make_registry())
    with pytest.raises(EvalError, match="missing required argument"):
        interp.interpret_document(
            parse_program("a: 1 | clamp(lo: 0);"),
            parse_html("<html></html>"),
            "file:///x",
        )
    with pytest.raises(EvalError, match="expected a string"):
        interp.interpret_document(
            parse_program("a: 1 | shout();"),
            parse_html("<html></html>"),
            "file:///x",
        )


def test_user_filter_through_spark(spark):
    from scrapelect_spark.operators.extract import extract

    pages = spark.createDataFrame(
        [("u1", "<html><body><h1>quiet words</h1></body></html>")],
        ["url", "html"],
    )
    df = extract(
        pages,
        't: h1 { x: $element | text() | shout(); } | take(key: "x");',
        registry=make_registry(),
    )
    row = df.collect()[0]
    assert row.error is None
    assert json.loads(row.result) == {"t": "QUIET WORDS"}

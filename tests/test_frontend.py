"""Scanner + parser unit tests, ported from the reference's behavioral
suite (scanner.rs:239-379, parser.rs:459-561, grammar_tests.rs)."""

import pytest

from scrapelect_spark.errors import ParseError
from scrapelect_spark.plans import (
    Element,
    Leaf,
    Parser,
    Qualifier,
    Scanner,
    Token,
    parse_program,
)
from scrapelect_spark.plans.parser import parse_string_literal


def lex1(s: str):
    return Scanner(s).peek_token()[1]


# scanner.rs:273-286 test_matches corpus
@pytest.mark.parametrize(
    "tok,text",
    [
        (Token.ID, "a"),
        (Token.ID, "a-"),
        (Token.ID, "A9-9-9-9"),
        (Token.ID, "a____a"),
        (Token.INT, "+1"),
        (Token.INT, "1"),
        (Token.INT, "1234"),
        (Token.INT, "-1"),
        (Token.FLOAT, "0."),
        (Token.FLOAT, "-0.1234"),
        (Token.FLOAT, "+0.12345"),
        (Token.STRING, '"hello!"'),
        (Token.STRING, '""'),
        (Token.STRING, '"\\""'),
        (Token.DOT, "."),
        (Token.STAR, "*"),
        (Token.PLUS, "+"),
        (Token.QUESTION, "?"),
        (Token.PIPE, "|"),
        (Token.BRACKET_OPEN, "["),
        (Token.BRACKET_CLOSE, "]"),
    ],
)
def test_scanner_matches(tok, text):
    lx = lex1(text)
    assert lx.token is tok and lx.value == text


@pytest.mark.parametrize(
    "tok,text",
    [
        (Token.ID, "9"),
        (Token.ID, "-"),
        (Token.ID, "_"),
        (Token.INT, "+"),
        (Token.INT, "-"),
        (Token.FLOAT, "1"),
        (Token.FLOAT, ".5"),
        (Token.FLOAT, "-.5"),
        (Token.FLOAT, "."),
        (Token.STRING, '"""'),  # longest-match stops at ""
        (Token.STRING, '"\\"'),
    ],
)
def test_scanner_negative(tok, text):
    lx = lex1(text)
    assert not (lx.token is tok and lx.value == text)


def test_scanner_eat_sequence():
    # scanner.rs:298-311
    sc = Scanner("h3 h4#h5.h6 {}")
    seq = []
    while True:
        _, lx = sc.eat_token()
        if lx.token is Token.EOF:
            break
        seq.append((lx.token, lx.value))
    assert seq == [
        (Token.ID, "h3"),
        (Token.WHITESPACE, " "),
        (Token.ID, "h4"),
        (Token.HASH, "#"),
        (Token.ID, "h5"),
        (Token.DOT, "."),
        (Token.ID, "h6"),
        (Token.WHITESPACE, " "),
        (Token.BRACE_OPEN, "{"),
        (Token.BRACE_CLOSE, "}"),
    ]


def test_scanner_comments():
    # scanner.rs:350-372
    sc = Scanner(
        "// Hello! This is a comment!\n"
        "            b: a // and another! {\n"
        "            {\n"
        "            // } don't be fooled!\n"
        "            }"
    )
    assert sc.peek_non_whitespace()[1].value == "b"
    sc.eat_token()
    assert sc.peek_non_whitespace()[1].value == ":"
    sc.eat_token()
    assert sc.peek_non_whitespace()[1].value == "a"
    sc.eat_token()
    assert sc.peek_non_whitespace()[1].value == "{"
    sc.eat_token()
    assert sc.eat_token()[1].token is Token.WHITESPACE
    assert sc.eat_token()[1].value == "// } don't be fooled!"
    assert sc.peek_non_whitespace()[1].value == "}"


# parser.rs:552-560
@pytest.mark.parametrize(
    "raw,expected",
    [
        ('""', ""),
        ('"abcdef"', "abcdef"),
        ('"hello! \\n"', "hello! \n"),
        ('"my \\" crazy \\\\ lifestyle \\\\\\""', 'my " crazy \\ lifestyle \\"'),
    ],
)
def test_escape_strings(raw, expected):
    assert parse_string_literal(raw) == expected


def test_parse_shape():
    # parser.rs:466-549
    stmts = parse_program(
        'a: h1 {\n'
        '    x: $me | cat(i: "x", ) | meow();\n'
        '\n'
        '    y: h2#x > .cat  {\n'
        '\n'
        '    };\n'
        '};'
    )
    st = stmts[0]
    assert st.id == "a"
    el = st.value
    assert isinstance(el, Element)
    assert el.selector.css() == "h1"
    assert el.qualifier is Qualifier.ONE

    inner = el.statements[0]
    assert inner.id == "x"
    assert isinstance(inner.value, Leaf) and inner.value.kind == "var"
    assert inner.value.value == "me"
    assert [f.filter.id for f in inner.filters] == ["cat", "meow"]
    assert inner.filters[0].filter.args[0].id == "i"
    assert inner.filters[0].filter.args[0].value.value.value == "x"

    el2 = el.statements[1].value
    assert isinstance(el2, Element)
    assert el2.statements == ()
    assert el2.selector.css() == "h2#x > .cat"


def test_parse_all_goldens():
    import os

    for name in os.listdir("/root/reference/examples/scrps"):
        with open(f"/root/reference/examples/scrps/{name}") as f:
            parse_program(f.read())  # must not raise


def test_whitespace_merges_fragments():
    # Reference parity: `li .special` parses as ONE compound fragment
    # (parser.rs:268-272 peeks non-whitespace; ast.rs:190-191)
    stmts = parse_program("x: li .special {};")
    el = stmts[0].value
    assert el.selector.css() == "li.special"
    assert len(el.selector.combinators) == 0


def test_star_selector_is_parse_error():
    # Reference parity: the Star fragment is never eaten
    # (parser.rs:263), so `* {}` fails in the combinator parser.
    with pytest.raises(ParseError):
        parse_program("x: * {};")


def test_unterminated_statement_errors():
    with pytest.raises(ParseError):
        parse_program("x: 1")
    with pytest.raises(ParseError):
        parse_program("x 1;")
    with pytest.raises(ParseError):
        parse_program("x: a { y: 1; ;")


def test_trailing_garbage_errors():
    with pytest.raises(ParseError):
        parse_program("x: 1; }")

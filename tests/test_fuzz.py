"""Property tests: the parser never crashes — it either returns an AST
or raises ParseError (port of the reference's grammar fuzzer strategy,
examples/fuzzer.py: random programs generated from the grammar with
decaying recursion probability), plus hypothesis-driven junk input."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scrapelect_spark.errors import ParseError, ScrapelectError
from scrapelect_spark.functions.dom import parse_html
from scrapelect_spark.functions.interpreter import Interpreter
from scrapelect_spark.plans.parser import parse_program

IDENT = "abcdefgh"


class Gen:
    """Grammar-directed program generator (fuzzer.py:1-95 semantics:
    recursive productions decay with depth so programs terminate)."""

    def __init__(self, seed: int):
        self.r = random.Random(seed)

    def ident(self):
        n = self.r.randint(1, 6)
        return self.r.choice("abcdefghijklmnopqrstuvwxyz") + "".join(
            self.r.choice("abcdefghijklmnopqrstuvwxyz0123456789_-") for _ in range(n)
        )

    def leaf(self):
        k = self.r.randint(0, 3)
        if k == 0:
            return str(self.r.randint(-99, 99))
        if k == 1:
            return f"{self.r.randint(0, 99)}.{self.r.randint(0, 99)}"
        if k == 2:
            return '"' + self.ident() + '"'
        return "$" + self.ident()

    def named_selector(self):
        return self.r.choice(["", ".", "#"]) + self.ident()

    def selector(self, depth):
        frags = [self.named_selector()]
        while self.r.random() < 0.3 / (depth + 1):
            comb = self.r.choice([" > ", " + ", " ~ "])
            frags.append(comb + self.named_selector())
        return "".join(frags)

    def qualifier(self):
        return self.r.choice(["", "?", "*"])

    def filters(self, depth):
        out = ""
        while self.r.random() < 0.4 / (depth + 1):
            if self.r.random() < 0.8:
                args = ", ".join(
                    f"{self.ident()}: {self.leaf()}"
                    for _ in range(self.r.randint(0, 2))
                )
                out += f" | {self.ident()}({args}){self.qualifier()}"
            else:
                out += f" | [{self.ident()}: {self.leaf()}]{self.qualifier()}"
        return out

    def element(self, depth):
        url = f"<{self.leaf()}>" if self.r.random() < 0.2 else ""
        return (
            f"{url}{self.selector(depth)} {{ "
            + self.statements(depth + 1)
            + f" }}{self.qualifier()}"
        )

    def statement(self, depth):
        rv = (
            self.element(depth)
            if self.r.random() < 0.5 / (depth + 1)
            else self.leaf()
        )
        return f"{self.ident()}: {rv}{self.filters(depth)};"

    def statements(self, depth):
        n = self.r.randint(0, 3) if depth < 4 else 0
        return " ".join(self.statement(depth) for _ in range(n))

    def program(self):
        return " ".join(self.statement(0) for _ in range(self.r.randint(1, 5)))


@pytest.mark.parametrize("seed", range(200))
def test_generated_programs_parse(seed):
    pgm = Gen(seed).program()
    stmts = parse_program(pgm)  # grammar-valid → must parse
    assert isinstance(stmts, tuple)


@pytest.mark.parametrize("seed", range(100))
def test_generated_programs_interpret_or_clean_error(seed):
    """Interpretation of fuzzed programs either succeeds or raises the
    engine's error type — never an arbitrary exception."""
    pgm = Gen(seed + 10_000).program()
    try:
        stmts = parse_program(pgm)
    except ParseError:
        return
    interp = Interpreter()
    root = parse_html("<html><body><div><a href='/x'>t</a></div></body></html>")
    try:
        interp.interpret_document(stmts, root, "http://fuzz.test/")
    except ScrapelectError:
        pass


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_arbitrary_text_never_crashes_parser(text):
    try:
        parse_program(text)
    except ParseError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=500))
def test_arbitrary_html_never_crashes_dom(text):
    root = parse_html(text)
    assert root.tag == "html"
    for el in root.descendants():
        el.direct_text()

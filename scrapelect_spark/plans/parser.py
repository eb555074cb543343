"""Recursive-descent LL(1) parser for the scrp grammar.

Grammar: /root/reference/grammar.txt (proven predictive by the
reference's grammar meta-test, tests/grammar_tests.rs:318-343).
Behavioral model: /root/reference/src/frontend/parser.rs:64-456,
including the whitespace-significance disambiguation for descendant
combinators (parser.rs:217-257) and the string-escape semantics
(parser.rs:406-456: \\n, \\\\, \\" — unknown escapes keep the char).

Note the comma selector-list appears in grammar.txt:39 but is NOT
accepted by the reference parser; we match the parser (SURVEY.md §2.2).
"""

from __future__ import annotations

import sys

from ..errors import ParseError
from .ast import (
    Arg,
    Combinator,
    Element,
    Filter,
    FilterCall,
    FilterSelect,
    Inline,
    Leaf,
    NamedSelector,
    Qualifier,
    RValue,
    Selector,
    SelectorFragment,
    Statement,
)
from .scanner import Lexeme, Scanner, Span, Token


def _unexpected(expected: list[Token], lx: Lexeme, span: Span) -> ParseError:
    names = ", ".join(t.value for t in expected)
    return ParseError(
        f"Expected one of [{names}], got {lx.token.value} '{lx.value}' on line {span.line}"
    )


class Parser:
    def __init__(self, text: str):
        self.scanner = Scanner(text)

    def parse(self) -> tuple[Statement, ...]:
        stmts = self.parse_statement_list()
        self.try_eat(Token.EOF)
        return stmts

    def parse_statement_list(self) -> tuple[Statement, ...]:
        out = []
        while self.scanner.peek_non_whitespace()[1].token is Token.ID:
            out.append(self.parse_statement())
        return tuple(out)

    def parse_statement(self) -> Statement:
        ident = self.try_eat(Token.ID).value
        self.try_eat(Token.COLON)
        value = self.parse_rvalue()
        filters = self.parse_filter_list()
        self.try_eat(Token.SEMI)
        return Statement(id=ident, value=value, filters=filters)

    def parse_rvalue(self) -> RValue:
        _, lx = self.scanner.peek_non_whitespace()
        if lx.token in (Token.ID, Token.LESS, Token.DOT, Token.HASH):
            return self.parse_element()
        return self.parse_leaf()

    def parse_leaf(self) -> Leaf:
        self.scanner.peek_non_whitespace()
        span, lx = self.scanner.eat_token()
        if lx.token is Token.STRING:
            return Leaf("string", parse_string_literal(lx.value))
        if lx.token is Token.FLOAT:
            return Leaf("float", float(lx.value))
        if lx.token is Token.INT:
            return Leaf("int", int(lx.value))
        if lx.token is Token.DOLLAR:
            return Leaf("var", self.try_eat(Token.ID).value)
        raise _unexpected([Token.STRING, Token.FLOAT, Token.INT, Token.DOLLAR], lx, span)

    def try_eat(self, tk: Token) -> Lexeme:
        span, lx = self.scanner.peek_non_whitespace()
        self.scanner.eat_token()
        if lx.token is tk:
            return lx
        raise _unexpected([tk], lx, span)

    def parse_element(self) -> Element:
        url = self.parse_maybe_url()
        selector = self.parse_selector()
        self.try_eat(Token.BRACE_OPEN)
        statements = self.parse_statement_list()
        self.try_eat(Token.BRACE_CLOSE)
        qualifier = self.parse_qualifier()
        return Element(
            selector=selector, statements=statements, qualifier=qualifier, url=url
        )

    def parse_maybe_url(self) -> Inline | None:
        _, lx = self.scanner.peek_non_whitespace()
        if lx.token is Token.LESS:
            return self.parse_inline()
        return None

    def parse_inline(self) -> Inline:
        self.try_eat(Token.LESS)
        value = self.parse_leaf()
        filters = self.parse_filter_list()
        self.try_eat(Token.GREATER)
        return Inline(value=value, filters=filters)

    def parse_value(self) -> Inline:
        span, lx = self.scanner.peek_non_whitespace()
        if lx.token is Token.LESS:
            return self.parse_inline()
        if lx.token in (Token.DOLLAR, Token.INT, Token.FLOAT, Token.STRING):
            return Inline(value=self.parse_leaf())
        raise _unexpected(
            [Token.LESS, Token.DOLLAR, Token.INT, Token.FLOAT, Token.STRING], lx, span
        )

    def parse_selector(self) -> Selector:
        head = self.parse_selector_fragment()
        combinators = []
        while True:
            comb = self.parse_selector_combinator()
            if comb is None:
                break
            combinators.append((comb, self.parse_selector_fragment()))
        return Selector(head=head, combinators=tuple(combinators))

    def parse_selector_combinator(self) -> Combinator | None:
        span, lx = self.scanner.peek_non_comment()
        if lx.token is Token.WHITESPACE:
            self.scanner.eat_token()
            nspan, nlx = self.scanner.peek_non_whitespace()
            # whitespace is significant only if a selector fragment follows
            if nlx.token not in (Token.ID, Token.HASH, Token.DOT, Token.STAR):
                span, lx = nspan, nlx
        if lx.token in (Token.BRACE_OPEN, Token.PAREN_OPEN, Token.EOF):
            return None
        if lx.token is Token.WHITESPACE:
            return Combinator.DESCENDANT
        if lx.token is Token.GREATER:
            self.scanner.eat_token()
            return Combinator.CHILD
        if lx.token is Token.PLUS:
            self.scanner.eat_token()
            return Combinator.NEXT_SIBLING
        if lx.token is Token.TILDE:
            self.scanner.eat_token()
            return Combinator.SUBSEQUENT_SIBLING
        raise _unexpected(
            [Token.WHITESPACE, Token.GREATER, Token.PLUS, Token.TILDE], lx, span
        )

    def parse_selector_fragment(self) -> SelectorFragment:
        span, lx = self.scanner.peek_non_whitespace()
        if lx.token is Token.STAR:
            # Reference parity: the reference does NOT eat the Star here
            # (parser.rs:263), so `* { }` subsequently fails in
            # parse_selector_combinator.  We replicate that observable
            # behavior exactly (SURVEY.md §2.2 subset parity).
            return SelectorFragment(parts=())
        if lx.token in (Token.DOT, Token.ID, Token.HASH):
            parts = [self.parse_named_selector()]
            # Reference parity: this loop peeks *non-whitespace*
            # (parser.rs:268-272), so `li .special` merges into the single
            # compound fragment `li.special` and the whitespace-descendant
            # combinator is unreachable.  ast.rs:190-191 acknowledges the
            # tag+tag combo is "not parsable" — we match the reference.
            while self.scanner.peek_non_whitespace()[1].token in (
                Token.DOT,
                Token.ID,
                Token.HASH,
            ):
                parts.append(self.parse_named_selector())
            return SelectorFragment(parts=tuple(parts))
        raise _unexpected([Token.STAR, Token.DOT, Token.ID, Token.HASH], lx, span)

    def parse_named_selector(self) -> NamedSelector:
        span, lx = self.scanner.peek_non_whitespace()
        if lx.token is Token.DOT:
            self.scanner.eat_token()
            return NamedSelector("class", self.try_eat(Token.ID).value)
        if lx.token is Token.HASH:
            self.scanner.eat_token()
            return NamedSelector("id", self.try_eat(Token.ID).value)
        if lx.token is Token.ID:
            self.scanner.eat_token()
            return NamedSelector("tag", lx.value.lower())
        raise _unexpected([Token.DOT, Token.HASH, Token.ID], lx, span)

    def parse_filter_list(self) -> tuple[Filter, ...]:
        out = []
        while self.scanner.peek_non_whitespace()[1].token is Token.PIPE:
            self.scanner.eat_token()
            f = self.parse_filter()
            q = self.parse_qualifier()
            out.append(Filter(filter=f, qualifier=q))
        return tuple(out)

    def parse_filter(self):
        span, lx = self.scanner.peek_non_whitespace()
        self.scanner.eat_token()
        if lx.token is Token.ID:
            self.try_eat(Token.PAREN_OPEN)
            args = self.parse_arg_list()
            self.try_eat(Token.PAREN_CLOSE)
            return FilterCall(id=lx.value, args=args)
        if lx.token is Token.BRACKET_OPEN:
            name = self.try_eat(Token.ID).value
            self.try_eat(Token.COLON)
            leaf = self.parse_leaf()
            filters = self.parse_filter_list()
            self.try_eat(Token.BRACKET_CLOSE)
            return FilterSelect(name=name, value=Inline(value=leaf, filters=filters))
        raise _unexpected([Token.ID, Token.BRACKET_OPEN], lx, span)

    def parse_arg_list(self) -> tuple[Arg, ...]:
        out = []
        while True:
            span, lx = self.scanner.peek_non_whitespace()
            if lx.token is Token.PAREN_CLOSE:
                break
            if lx.token is Token.ID:
                self.scanner.eat_token()
                self.try_eat(Token.COLON)
                out.append(Arg(id=lx.value, value=self.parse_value()))
                # trailing comma allowed; no comma → no more args
                if self.scanner.peek_non_whitespace()[1].token is Token.COMMA:
                    self.scanner.eat_token()
                else:
                    break
            else:
                raise _unexpected([Token.PAREN_CLOSE, Token.ID], lx, span)
        return tuple(out)

    def parse_qualifier(self) -> Qualifier:
        _, lx = self.scanner.peek_non_whitespace()
        if lx.token is Token.QUESTION:
            self.scanner.eat_token()
            return Qualifier.OPTIONAL
        if lx.token is Token.STAR:
            self.scanner.eat_token()
            return Qualifier.COLLECTION
        return Qualifier.ONE


def parse_string_literal(s: str) -> str:
    """Unescape a quoted string literal: \\n, \\\\, \\"; unknown escapes
    keep the escaped char with a warning (parser.rs:406-456)."""
    assert len(s) >= 2 and s[0] == '"' and s[-1] == '"'
    body = s[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            n = body[i + 1]
            if n == "n":
                out.append("\n")
            elif n in ('"', "\\"):
                out.append(n)
            else:
                print(f"Unknown escape character {n!r}", file=sys.stderr)
                out.append(n)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def parse_program(text: str) -> tuple[Statement, ...]:
    """Parse a complete scrp program to its AST (the compiled plan)."""
    return Parser(text).parse()

"""Longest-match regex scanner for the scrp DSL.

Behavioral model: /root/reference/src/frontend/scanner.rs:87-204 — a set
of anchored token regexes, longest match wins; on a length tie the token
declared *later* wins (Rust ``max_by_key`` keeps the last maximum); no
match at all yields a 1-char ``UNKNOWN`` lexeme rather than an error.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum


class Token(Enum):
    ID = "ID"
    INT = "INT"
    FLOAT = "FLOAT"
    STRING = "STRING"
    DOT = "DOT"
    HASH = "HASH"
    STAR = "STAR"
    PLUS = "PLUS"
    GREATER = "GREATER"
    TILDE = "TILDE"
    WHITESPACE = "WHITESPACE"
    QUESTION = "QUESTION"
    BRACE_OPEN = "BRACE_OPEN"
    BRACE_CLOSE = "BRACE_CLOSE"
    DOLLAR = "DOLLAR"
    PIPE = "PIPE"
    PAREN_OPEN = "PAREN_OPEN"
    PAREN_CLOSE = "PAREN_CLOSE"
    COMMA = "COMMA"
    COLON = "COLON"
    SEMI = "SEMI"
    LESS = "LESS"
    BRACKET_OPEN = "BRACKET_OPEN"
    BRACKET_CLOSE = "BRACKET_CLOSE"
    COMMENT = "COMMENT"
    EOF = "EOF"
    UNKNOWN = "UNKNOWN"


# Declaration order matters for tie-breaking (later wins on equal length).
_TOKEN_PATTERNS: list[tuple[Token, str]] = [
    (Token.ID, r"[a-zA-Z][a-zA-Z0-9_-]*"),
    (Token.INT, r"[+-]?[0-9]+"),
    # at least one digit before the decimal point, not necessarily after
    (Token.FLOAT, r"[+-]?[0-9]+\.[0-9]*"),
    (Token.STRING, r'"(\\.|[^\\"])*"'),
    (Token.DOT, r"\."),
    (Token.HASH, r"#"),
    (Token.STAR, r"\*"),
    (Token.PLUS, r"\+"),
    (Token.GREATER, r">"),
    (Token.TILDE, r"~"),
    (Token.WHITESPACE, r"\s+"),
    (Token.QUESTION, r"\?"),
    (Token.BRACE_OPEN, r"\{"),
    (Token.BRACE_CLOSE, r"\}"),
    (Token.DOLLAR, r"\$"),
    (Token.PIPE, r"\|"),
    (Token.PAREN_OPEN, r"\("),
    (Token.PAREN_CLOSE, r"\)"),
    (Token.COMMA, r","),
    (Token.COLON, r":"),
    (Token.SEMI, r";"),
    (Token.LESS, r"<"),
    (Token.BRACKET_OPEN, r"\["),
    (Token.BRACKET_CLOSE, r"\]"),
    (Token.COMMENT, r"//[^\n]*"),
]

_COMPILED = [(tok, re.compile(pat, re.DOTALL)) for tok, pat in _TOKEN_PATTERNS]


@dataclass(frozen=True)
class Lexeme:
    token: Token
    value: str


@dataclass(frozen=True)
class Span:
    line: int
    start: int
    end: int


EOF_LEXEME = Lexeme(Token.EOF, "")


class Scanner:
    """Peek/eat scanner over program text with comment/whitespace skipping."""

    def __init__(self, text: str):
        self.text = text
        self.idx = 0
        self.line = 1

    def peek_token(self) -> tuple[Span, Lexeme]:
        if self.idx >= len(self.text):
            return Span(self.line, self.idx, self.idx), EOF_LEXEME
        best: Lexeme | None = None
        for tok, rx in _COMPILED:
            m = rx.match(self.text, self.idx)
            if m is not None:
                v = m.group(0)
                # >= replicates max_by_key's last-max-wins tie break
                if best is None or len(v) >= len(best.value):
                    best = Lexeme(tok, v)
        if best is None or not best.value:
            return (
                Span(self.line, self.idx, self.idx + 1),
                Lexeme(Token.UNKNOWN, self.text[self.idx : self.idx + 1]),
            )
        return Span(self.line, self.idx, self.idx + len(best.value)), best

    def eat_token(self) -> tuple[Span, Lexeme]:
        span, lx = self.peek_token()
        self.idx += len(lx.value)
        self.line += lx.value.count("\n")
        return span, lx

    def peek_non_comment(self) -> tuple[Span, Lexeme]:
        while self.peek_token()[1].token is Token.COMMENT:
            self.eat_token()
        return self.peek_token()

    def peek_non_whitespace(self) -> tuple[Span, Lexeme]:
        while self.peek_non_comment()[1].token is Token.WHITESPACE:
            self.eat_token()
        return self.peek_token()

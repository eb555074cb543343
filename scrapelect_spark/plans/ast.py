"""AST for the scrp DSL — plain frozen dataclasses, picklable.

Shape mirrors the behavior of /root/reference/src/frontend/ast.rs
(Statement, RValue, Element, Selector, Inline, Filter…).  This IS the
compiled plan: the reference interprets the AST directly
(SURVEY.md §3.1 step 3 — "the entire IR"); the Spark engine compiles it
once on the driver and ships it inside the extraction UDF closure.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Union


class Qualifier(Enum):
    ONE = "one"  # first match, error on zero (execution_mode.rs:57)
    OPTIONAL = "optional"  # `?` — first match or Null
    COLLECTION = "collection"  # `*` — all matches as a List


class Combinator(Enum):
    DESCENDANT = " "
    CHILD = ">"
    NEXT_SIBLING = "+"
    SUBSEQUENT_SIBLING = "~"


@dataclass(frozen=True)
class NamedSelector:
    kind: str  # "tag" | "class" | "id"
    name: str

    def css(self) -> str:
        return {"tag": "%s", "class": ".%s", "id": "#%s"}[self.kind] % self.name


@dataclass(frozen=True)
class SelectorFragment:
    """Either the wildcard `*` (parts=()) or a non-empty compound
    `tag.class#id` of named selectors ANDed together (ast.rs:5-86)."""

    parts: tuple[NamedSelector, ...]  # empty tuple = Any (`*`)

    @property
    def is_any(self) -> bool:
        return not self.parts

    def css(self) -> str:
        return "*" if self.is_any else "".join(p.css() for p in self.parts)


@dataclass(frozen=True)
class Selector:
    head: SelectorFragment
    combinators: tuple[tuple[Combinator, SelectorFragment], ...] = ()

    def css(self) -> str:
        s = self.head.css()
        for comb, frag in self.combinators:
            sep = " " if comb is Combinator.DESCENDANT else f" {comb.value} "
            s += sep + frag.css()
        return s


@dataclass(frozen=True)
class Leaf:
    """Literal or variable read: kind in {int,float,string,var}."""

    kind: str
    value: Union[int, float, str]


@dataclass(frozen=True)
class Inline:
    """`<leaf | filters>` — anonymous evaluated-once value
    (parser.rs:174-180, doc advanced-features.md:83-127)."""

    value: Leaf
    filters: tuple["Filter", ...] = ()


@dataclass(frozen=True)
class Arg:
    id: str
    value: Inline


@dataclass(frozen=True)
class FilterCall:
    id: str
    args: tuple[Arg, ...] = ()


@dataclass(frozen=True)
class FilterSelect:
    """`[name: leaf | filters]` per-item keep-if-true lambda
    (ast.rs:159-162, eval mod.rs:184-203)."""

    name: str
    value: Inline


@dataclass(frozen=True)
class Filter:
    filter: Union[FilterCall, FilterSelect]
    qualifier: Qualifier = Qualifier.ONE


@dataclass(frozen=True)
class Element:
    """Element context block: `<url>? selector { statements } qualifier`."""

    selector: Selector
    statements: tuple["Statement", ...] = ()
    qualifier: Qualifier = Qualifier.ONE
    url: Inline | None = None  # URL recursion (ast.rs:133-138)


RValue = Union[Leaf, Element]


@dataclass(frozen=True)
class Statement:
    id: str
    value: RValue
    filters: tuple[Filter, ...] = field(default_factory=tuple)

"""CSS subset matcher for the scrp selector grammar.

The subset is exactly what the reference grammar produces
(/root/reference/grammar.txt:18-39, ast.rs:5-86): compound fragments of
``tag`` / ``.class`` / ``#id`` joined by child ``>``, next-sibling ``+``
and subsequent-sibling ``~`` combinators (no pseudo-classes, no
attribute selectors; SURVEY.md §2.2).

Matching semantics mirror scraper/selectors: a selector matches an
element by checking the rightmost fragment against it and walking
combinators right-to-left through the *whole document tree* — ancestors
above the selection root still count.  ``select(root, sel)`` yields
matching descendants of ``root`` (excluding root) in document order
(scraper ``ElementRef::select``, used at interpreter mod.rs:140-141).

Selectors are compiled once on the driver (north_star requirement —
the reference recompiles per block evaluation, mod.rs:140) into a
:class:`CompiledSelector` that is pickled into the UDF closure.
"""

from __future__ import annotations

from typing import Iterator

from ..plans.ast import Combinator, Selector, SelectorFragment
from .dom import ElementNode


def _match_fragment(el: ElementNode, frag: SelectorFragment) -> bool:
    for part in frag.parts:
        if part.kind == "tag":
            if el.tag != part.name:
                return False
        elif part.kind == "class":
            if part.name not in el.classes:
                return False
        else:  # id
            if el.attrs.get("id") != part.name:
                return False
    return True


class CompiledSelector:
    """Driver-compiled matcher for one scrp selector."""

    __slots__ = ("frags", "combs", "css")

    def __init__(self, selector: Selector):
        self.frags: tuple[SelectorFragment, ...] = (selector.head,) + tuple(
            f for _, f in selector.combinators
        )
        self.combs: tuple[Combinator, ...] = tuple(c for c, _ in selector.combinators)
        self.css = selector.css()

    def matches(self, el: ElementNode) -> bool:
        return self._match_at(el, len(self.frags) - 1)

    def _match_at(self, el: ElementNode, i: int) -> bool:
        if not _match_fragment(el, self.frags[i]):
            return False
        if i == 0:
            return True
        comb = self.combs[i - 1]
        if comb is Combinator.CHILD:
            p = el.parent
            return p is not None and self._match_at(p, i - 1)
        if comb is Combinator.DESCENDANT:
            p = el.parent
            while p is not None:
                if self._match_at(p, i - 1):
                    return True
                p = p.parent
            return False
        if comb is Combinator.NEXT_SIBLING:
            s = el.prev_element_sibling()
            return s is not None and self._match_at(s, i - 1)
        # SUBSEQUENT_SIBLING
        s = el.prev_element_sibling()
        while s is not None:
            if self._match_at(s, i - 1):
                return True
            s = s.prev_element_sibling()
        return False

    def select(self, root: ElementNode) -> Iterator[ElementNode]:
        """Matching descendants of ``root`` in document order."""
        for el in root.descendants():
            if self.matches(el):
                yield el

    def __repr__(self) -> str:  # pragma: no cover
        return f"CompiledSelector({self.css!r})"

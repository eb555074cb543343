"""Minimal HTML DOM on top of stdlib ``html.parser``.

Role: the executor-side document model for the extraction UDF — the
equivalent of the reference's ``scraper::Html`` / ``ElementRef``
(/root/reference/src/interpreter/mod.rs:76, filter-types context.rs:9).
No third-party HTML parser is available in the runtime (no lxml /
selectolax), and the needed surface is small: element tree, document
order, direct-child text (builtin.rs:383-390), attributes, and the
CSS subset in css.py.

html5ever-alignment notes (what matters for golden parity):
- tag and attribute names are lowercased; entities decoded
  (``convert_charrefs=True``);
- duplicate attributes keep the first occurrence;
- void elements never take children;
- a ``<html>`` root always exists: if the document lacks one (or is
  empty, like filter_select.html), top-level content is wrapped in a
  synthesized ``html > body``;
- selection iterates descendants in document order, excluding the
  root itself (scraper ``ElementRef::select`` semantics).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# minimal HTML5 implied-end-tag handling for common structural tags
_AUTOCLOSE: dict[str, frozenset[str]] = {
    "li": frozenset(["li"]),
    "p": frozenset(["p"]),
    "tr": frozenset(["tr", "td", "th"]),
    "td": frozenset(["td", "th"]),
    "th": frozenset(["td", "th"]),
    "option": frozenset(["option"]),
    "dt": frozenset(["dt", "dd"]),
    "dd": frozenset(["dt", "dd"]),
}


class TextNode:
    __slots__ = ("text", "parent")

    def __init__(self, text: str, parent: "ElementNode | None"):
        self.text = text
        self.parent = parent


class ElementNode:
    __slots__ = ("tag", "attrs", "classes", "parent", "children", "order")

    def __init__(
        self,
        tag: str,
        attrs: dict[str, str],
        parent: "ElementNode | None",
        order: int,
    ):
        self.tag = tag
        self.attrs = attrs
        self.classes = frozenset(attrs.get("class", "").split())
        self.parent = parent
        self.children: list[ElementNode | TextNode] = []
        self.order = order

    # --- traversal -------------------------------------------------
    def child_elements(self) -> Iterator["ElementNode"]:
        for c in self.children:
            if isinstance(c, ElementNode):
                yield c

    def descendants(self) -> Iterator["ElementNode"]:
        """Pre-order document-order walk, excluding self."""
        stack = [c for c in reversed(self.children) if isinstance(c, ElementNode)]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(
                c for c in reversed(node.children) if isinstance(c, ElementNode)
            )

    def prev_element_sibling(self) -> Optional["ElementNode"]:
        if self.parent is None:
            return None
        prev = None
        for c in self.parent.children:
            if c is self:
                return prev
            if isinstance(c, ElementNode):
                prev = c
        return None

    # --- content ---------------------------------------------------
    def direct_text(self) -> str:
        """Concatenation of DIRECT child text nodes only — the `text()`
        filter semantics (builtin.rs:383-390: skips descendants)."""
        return "".join(c.text for c in self.children if isinstance(c, TextNode))

    def all_text(self) -> str:
        out = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, TextNode):
                out.append(c.text)
            else:
                stack.extend(reversed(c.children))
        return "".join(out)

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.tag} order={self.order}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.top: list[ElementNode | TextNode] = []
        self.stack: list[ElementNode] = []
        self.counter = 0

    def _append(self, node: ElementNode | TextNode) -> None:
        if self.stack:
            self.stack[-1].children.append(node)
        else:
            self.top.append(node)

    def handle_starttag(self, tag: str, attrs) -> None:
        if self.stack and self.stack[-1].tag in _AUTOCLOSE.get(tag, ()):
            self.stack.pop()
        amap: dict[str, str] = {}
        for k, v in attrs:
            if k not in amap:
                amap[k] = v if v is not None else ""
        self.counter += 1
        node = ElementNode(
            tag, amap, self.stack[-1] if self.stack else None, self.counter
        )
        self._append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <br/> style; never pushes onto the stack
        amap: dict[str, str] = {}
        for k, v in attrs:
            if k not in amap:
                amap[k] = v if v is not None else ""
        self.counter += 1
        self._append(
            ElementNode(tag, amap, self.stack[-1] if self.stack else None, self.counter)
        )

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignored (html5ever parse-error recovery)

    def handle_data(self, data: str) -> None:
        if data:
            self._append(TextNode(data, self.stack[-1] if self.stack else None))


def parse_html(text: str, fast: bool = True) -> ElementNode:
    """Parse a document and return its ``<html>`` root element.

    ``fast=True`` (default) tokenizes with :mod:`.fast_html` (a C-regex
    scan ~2× quicker than stdlib html.parser's goahead loop) feeding
    the same ``_TreeBuilder`` callbacks; any input outside the fast
    path's recognized subset falls back to html.parser for the whole
    document, so the DOM is identical either way
    (tests/test_fast_html.py pins the equivalence differentially)."""
    builder = _TreeBuilder()
    if fast:
        from .fast_html import FallbackNeeded, tokenize_into

        try:
            tokenize_into(builder, text)
        except FallbackNeeded:
            builder = _TreeBuilder()
            builder.feed(text)
            builder.close()
    else:
        builder.feed(text)
        builder.close()

    for node in builder.top:
        if isinstance(node, ElementNode) and node.tag == "html":
            return node

    # Synthesize html > body around whatever content exists (html5ever
    # always produces an <html> element, even for an empty document).
    html = ElementNode("html", {}, None, 0)
    body = ElementNode("body", {}, html, 0)
    html.children.append(body)
    for node in builder.top:
        node.parent = body
        body.children.append(node)
    # renumber document order
    counter = 0
    stack: list[ElementNode] = [html]
    while stack:
        el = stack.pop()
        el.order = counter
        counter += 1
        stack.extend(
            c for c in reversed(el.children) if isinstance(c, ElementNode)
        )
    return html

"""Fast HTML tokenizer: a C-regex scan that feeds the SAME tree-builder
callbacks as stdlib ``html.parser`` — with a whole-document fallback.

Motivation: parsing dominates per-page extraction cost (~0.6 ms of
~1.0 ms), and stdlib ``HTMLParser.goahead`` is a Python-level loop with
per-token regex dispatch and position bookkeeping.  This tokenizer
recognizes the common well-formed constructs with two compiled regexes
and ``str.find``; anything outside that subset (malformed tags, marked
sections, exotic attribute syntax) raises :class:`FallbackNeeded` and
the caller re-parses the WHOLE document with ``html.parser`` — so the
fast path can only ever diverge inside constructs it fully recognizes,
which the differential suite (tests/test_fast_html.py) pins to be
byte-identical to ``html.parser`` output.

Behavioral contract replicated from html.parser (convert_charrefs=True):
- tag/attr names lowercased; attribute entity refs unescaped; missing
  attr value → "" (the tree builder maps None → "" — we pass the raw
  value/None through identically);
- text chunks between tags arrive as ONE handle_data call with
  charrefs converted (html.parser buffers data until the next tag);
- <script>/<style> content is raw text (no charref conversion) until
  the matching close tag, or EOF;
- comments, <!DOCTYPE ...>, and <?...> are skipped (the builder defines
  no handlers for them);
- a ``<`` not opening a recognized construct is literal text.
"""

from __future__ import annotations

import re
from html import unescape


class FallbackNeeded(Exception):
    """Input is outside the fast path's recognized subset — re-parse
    the whole document with html.parser."""


# The unquoted-value branch is deliberately stricter than html.parser's
# attrfind_tolerant: html.parser uses (?!['\"])[^>\s]* after =+ — a
# quote-leading "unquoted" value means an unterminated quoted string and
# a repeated '=' folds into the =+ — both shapes parse DIFFERENTLY there,
# so the fast path must refuse them ((?!['\"=]) below) and fall back to a
# whole-document html.parser reparse rather than silently diverge.
_STARTTAG = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9:._-]*)"  # tag name
    r"((?:\s+[^\s/>=]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|(?!['\"=])[^\s>]+))?)*)"  # attrs
    r"\s*(/?)>"
)
_ATTR = re.compile(
    r"\s+([^\s/>=]+)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|((?!['\"=])[^\s>]+)))?"
)
_ENDTAG = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")

_RAWTEXT = ("script", "style")


def _parse_attrs(s: str) -> list[tuple[str, str | None]]:
    out = []
    pos = 0
    for m in _ATTR.finditer(s):
        if m.start() != pos:
            raise FallbackNeeded("junk between attributes")
        name = m.group(1).lower()
        if m.group(2) is not None:
            value: str | None = m.group(2)
        elif m.group(3) is not None:
            value = m.group(3)
        elif m.group(4) is not None:
            value = m.group(4)
        else:
            value = None  # bare attribute — html.parser reports None
        if value is not None and "&" in value:
            value = unescape(value)
        out.append((name, value))
        pos = m.end()
    if pos != len(s):
        raise FallbackNeeded("unparsed attribute tail")
    return out


def tokenize_into(builder, text: str) -> None:
    """Drive ``builder``'s handle_starttag / handle_startendtag /
    handle_endtag / handle_data with the same event stream
    ``html.parser`` would produce for ``text`` (or raise
    :class:`FallbackNeeded`)."""
    pos = 0
    n = len(text)
    find = text.find
    while pos < n:
        lt = find("<", pos)
        if lt == -1:
            chunk = text[pos:]
            if chunk:
                builder.handle_data(unescape(chunk) if "&" in chunk else chunk)
            break
        if lt > pos:
            chunk = text[pos:lt]
            builder.handle_data(unescape(chunk) if "&" in chunk else chunk)
        nxt = text[lt + 1] if lt + 1 < n else ""
        if nxt == "/":
            m = _ENDTAG.match(text, lt)
            if m is None:
                raise FallbackNeeded("malformed end tag")
            builder.handle_endtag(m.group(1).lower())
            pos = m.end()
        elif nxt.isalpha():
            m = _STARTTAG.match(text, lt)
            if m is None:
                raise FallbackNeeded("malformed start tag")
            tag = m.group(1).lower()
            attrs = _parse_attrs(m.group(2))
            pos = m.end()
            if m.group(3):
                builder.handle_startendtag(tag, attrs)
            elif tag in _RAWTEXT:
                builder.handle_starttag(tag, attrs)
                close = re.compile(rf"</\s*{tag}", re.IGNORECASE)
                data_start = pos
                while True:
                    rm = close.search(text, pos)
                    if rm is None:
                        # EOF inside rawtext: html.parser silently drops
                        # the buffered cdata — defer to it
                        raise FallbackNeeded("unclosed rawtext element")
                    em = _ENDTAG.match(text, rm.start())
                    if em is None or em.group(1).lower() != tag:
                        # `</scriptx>` etc: html.parser emits it as a
                        # separate data chunk and keeps scanning — the
                        # chunking differs from ours, so punt
                        raise FallbackNeeded("false rawtext close")
                    if rm.start() > data_start:
                        builder.handle_data(text[data_start : rm.start()])
                    builder.handle_endtag(tag)
                    pos = em.end()
                    break
            else:
                builder.handle_starttag(tag, attrs)
        elif nxt == "!":
            if text.startswith("<!--", lt):
                end = find("-->", lt + 4)
                if end == -1:
                    raise FallbackNeeded("unterminated comment")
                pos = end + 3
            else:
                end = find(">", lt + 2)
                decl = text[lt + 2 : end if end != -1 else n]
                if end == -1 or "[" in decl:
                    # marked section / internal subset: html.parser has
                    # bespoke recovery — punt
                    raise FallbackNeeded("complex declaration")
                pos = end + 1
        elif nxt == "?":
            end = find(">", lt + 2)
            if end == -1:
                raise FallbackNeeded("unterminated processing instruction")
            pos = end + 1
        else:
            # literal '<' in text (html.parser: invalid start → data)
            builder.handle_data("<")
            pos = lt + 1

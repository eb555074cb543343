"""Differential suite: the fast tokenizer's DOM must be IDENTICAL to
stdlib html.parser's for every input it accepts — and inputs it
rejects must fall back transparently (parse_html(fast=True) ==
parse_html(fast=False) for arbitrary input, always)."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scrapelect_spark.functions.dom import ElementNode, TextNode, parse_html


def dom_equal(a, b) -> bool:
    if isinstance(a, TextNode) or isinstance(b, TextNode):
        return (
            isinstance(a, TextNode)
            and isinstance(b, TextNode)
            and a.text == b.text
        )
    if a.tag != b.tag or dict(a.attrs) != dict(b.attrs):
        return False
    if len(a.children) != len(b.children):
        return False
    return all(dom_equal(x, y) for x, y in zip(a.children, b.children))


def assert_equivalent(html: str):
    fast = parse_html(html, fast=True)
    slow = parse_html(html, fast=False)
    assert dom_equal(fast, slow), html


WELL_FORMED = [
    "<html><body><h1>t</h1></body></html>",
    '<html><body><p class="a b" id="x" data-k="v">text</p></body></html>',
    "<div><ul><li>a</li><li>b</li></ul></div>",
    '<a href="/x?a=1&amp;b=2">link &lt;here&gt; &amp; there</a>',
    "<br/><img src='x.png'/><hr>",
    "<input type=checkbox checked><input value=unquoted>",
    "<!DOCTYPE html><html><body>x</body></html>",
    "<!-- comment --><p>after</p><!-- another -->",
    "<?xml version='1.0'?><p>pi</p>",
    "<script>if (a < b && c > d) { x(); }</script><p>after</p>",
    "<style>a > b { color: red; }</style>",
    "<SCRIPT>UPPER()</SCRIPT>",
    "<script src='x.js'></script>",
    "<p>a &#65; &#x42; &amp; &unknown; b</p>",
    "<div  a = '1'   b2-x:y = \"2\" >spacing</div>",
    "<td>auto</td><td>close</td>",
    "<li>one<li>two<li>three",
    "<p>unclosed <b>bold",
    "text before <p>para</p> text after",
    "",
    "plain text only",
    "<div></div>",
    "<div>\n  multi\n  line\n</div>",
    '<meta charset="utf-8"><title>T</title>',
    "<table><tr><td>1</td><td>2</td></tr></table>",
]

MALFORMED = [
    "<",
    "a < b",
    "1 < 2 > 3",
    "<1tag>",
    "<div",                      # EOF mid-tag → fallback
    "<div a=>x</div>",           # empty unquoted value
    "<div =x>",                  # attr starting with =
    "<div a//>",
    "<div / >",
    "</",
    "</ >",
    "</@bad>",
    "<!-- unterminated",
    "<![CDATA[raw]]>",
    "<!DOCTYPE doc [ <!ELEMENT x (y)> ]>",
    "<? unterminated",
    "<script>never closed",
    "<script>x</scriptx>more</script>after",
    "<p>&amp no-semicolon &;</p>",
    "<a href=>empty</a>",
    "\x00<p>null</p>",
    "<p>emoji 🎈 &#127880;</p>",
    # malformed-attribute shapes where html.parser's tolerant grammar
    # (=+ folding, (?!['\"]) unquoted values, unterminated quotes) parses
    # DIFFERENTLY from a naive regex — the fast path must fall back
    "<a e==&</style>",
    '<a e="</a>',
    '<a title="x<y',
    "<a e==x>y</a>",
    "<a b='x>z</a>",
    '<a b="x>z</a>',
    "<a e= =v>t</a>",
    "<a e===v>t</a>",
    '<a e="unterminated quote>t</a>',
    "<a e='>t</a>",
    "<a e=\"a\"b=c>t</a>",
    "<a e='v'x>t</a>",
]


@pytest.mark.parametrize("html", WELL_FORMED)
def test_well_formed_equivalent(html):
    assert_equivalent(html)


@pytest.mark.parametrize("html", MALFORMED)
def test_malformed_equivalent(html):
    assert_equivalent(html)


def test_golden_pages_equivalent():
    """Every page shape the crawl/bench/golden suites use."""
    items = "".join(
        f'<li class="it"><a href="/l{j}">item {j}</a><span>v{j}</span></li>'
        for j in range(20)
    )
    pages = [
        f"<html><body><h1>Page</h1><ul>{items}</ul></body></html>",
        '<html><body><h1 id="t">doc 7</h1><p class="meta" data-lang="en" '
        'data-source="s">meta</p><div class="body">text</div>'
        '<ul><li class="kw">kw1</li></ul></body></html>',
        "<html><body><h1>0/1</h1>"
        + "".join(f'<a href="http://h{k}.test/p/{k}">x</a>' for k in range(6))
        + "</body></html>",
    ]
    for p in pages:
        assert_equivalent(p)


def _random_html(seed: int) -> str:
    """Structured generator: nested tags, attrs, entities, comments."""
    r = random.Random(seed)
    tags = ["div", "p", "span", "a", "ul", "li", "h1", "b", "table", "td"]
    voids = ["br", "img", "hr", "input"]
    out = []

    def attrs():
        s = ""
        for _ in range(r.randint(0, 3)):
            name = r.choice(["class", "id", "href", "data-x", "title"])
            q = r.choice(['"', "'", ""])
            val = r.choice(["v1", "a b", "x&amp;y", "/p?a=1", ""])
            if q == "" and (" " in val or val == ""):
                val = "plain"
            s += f" {name}={q}{val}{q}" if r.random() < 0.9 else f" {name}"
        return s

    def node(depth):
        k = r.random()
        if k < 0.3 or depth > 4:
            out.append(
                r.choice(["text", "a &amp; b", "x &lt; y", "1 < 2", "  ws  "])
            )
        elif k < 0.4:
            out.append(f"<{r.choice(voids)}{attrs()}{r.choice(['>', '/>'])}")
        elif k < 0.5:
            out.append("<!-- c -->")
        elif k < 0.55:
            t = r.choice(["script", "style"])
            out.append(f"<{t}>if (a<b) x();</{t}>")
        else:
            t = r.choice(tags)
            out.append(f"<{t}{attrs()}>")
            for _ in range(r.randint(0, 3)):
                node(depth + 1)
            if r.random() < 0.85:  # sometimes leave unclosed
                out.append(f"</{t}>")

    for _ in range(r.randint(1, 6)):
        node(0)
    return "".join(out)


@pytest.mark.parametrize("seed", range(300))
def test_generated_html_equivalent(seed):
    assert_equivalent(_random_html(seed))


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=300))
def test_arbitrary_text_equivalent(text):
    assert_equivalent(text)


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet="<>/=\"' abc&;!-?x1",  # markup-dense alphabet
        max_size=120,
    )
)
def test_markup_soup_equivalent(text):
    assert_equivalent(text)


def _random_attr_junk(seed: int) -> str:
    """Adversarial attribute-syntax generator: repeated '=', quote-leading
    unquoted values, unterminated quotes, stray slashes — the tolerant
    corners of html.parser's attrfind grammar."""
    r = random.Random(seed)
    frags = []
    for _ in range(r.randint(1, 5)):
        tag = r.choice(["a", "div", "p", "style"])
        attrs = ""
        for _ in range(r.randint(0, 3)):
            name = r.choice(["e", "b", "title", "x-y", "data"])
            eq = r.choice(["=", "==", "= =", "===", " = ", ""])
            val = r.choice(
                ['"v"', "'v'", "v", '="v', '"unterm', "'unterm", '=v',
                 '"v"extra', "'v'x", "`v`", "a=b", '"x<y', "", "/v", "v/"]
            )
            attrs += f" {name}{eq}{val}"
        closer = r.choice([">", "/>", " >", " / >", ""])
        frags.append(f"<{tag}{attrs}{closer}")
        frags.append(r.choice(["text", "</a>", "&amp;", "", "<b>t</b>"]))
    return "".join(frags)


@pytest.mark.parametrize("seed", range(300))
def test_attr_junk_equivalent(seed):
    assert_equivalent(_random_attr_junk(seed))

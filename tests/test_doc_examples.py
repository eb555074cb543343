"""Conformance tests ported from the reference's documentation book
(/root/reference/doc/src/language-concepts/*.md, advanced-features.md).

Where the book contradicts the code, the code wins (SURVEY.md §2.4):
e.g. the URL-recursion example calls `take` directly on an element
(needs `attrs()` first) and `null` literals don't exist in the
grammar — such examples are ported with the code-correct spelling.
"""

import pytest

from scrapelect_spark.errors import EvalError
from scrapelect_spark.functions.dom import parse_html
from scrapelect_spark.functions.interpreter import Interpreter
from scrapelect_spark.plans import parse_program


def run(scrp: str, html: str = "<html></html>", fetcher=None):
    interp = Interpreter(fetcher=fetcher)
    return interp.interpret_document(
        parse_program(scrp), parse_html(html), "https://your-url.com/index.html"
    )


def test_simplest_statement():
    # statements-and-values.md: cat-says
    assert run('cat-says: "meow";') == {"cat-says": "meow"}


def test_reading_bindings():
    out = run('greeting: "hello!"; message: $greeting;')
    assert out == {"greeting": "hello!", "message": "hello!"}


def test_shadowing_snapshot():
    # statements-and-values.md §Shadowing
    out = run(
        'output: "Not me!";\n'
        'output: "or me...";\n'
        "// save $output at this point in time\n"
        "snapshot: $output;\n"
        'output: "I will be the final result!";'
    )
    assert out == {
        "output": "I will be the final result!",
        "snapshot": "or me...",
    }


def test_select_by_id():
    # elements-and-selectors.md §Creating an element context
    out = run(
        "special: #special { text: $element | text(); };",
        '<html><body><a>Not special</a><a id="special">Special</a></body></html>',
    )
    assert out == {"special": {"text": "Special"}}


def test_nested_contexts_subtree_scoped():
    # elements-and-selectors.md §Nested contexts: cats not dogs
    html = """
    <html><body>
    <ul id="cats"><li>calico</li><li>tabby</li></ul>
    <ul id="dogs"><li>shi tzu</li></ul>
    </body></html>
    """
    out = run(
        "cat: #cats { type: li { content: $element | text(); }; };", html
    )
    assert out == {"cat": {"type": {"content": "calico"}}}


def test_scope_shadowing_across_contexts():
    # elements-and-selectors.md §Scope
    html = "<html><body><parent><child></child></parent></body></html>"
    out = run(
        'context: "outer";\n'
        'outer: "outer";\n'
        "parent: parent {\n"
        '  context: "middle";\n'
        "  child: child {\n"
        "    context: $context;\n"
        "    outer: $outer;\n"
        "  };\n"
        "};",
        html,
    )
    assert out == {
        "context": "outer",
        "outer": "outer",
        "parent": {
            "child": {"context": "middle", "outer": "outer"},
            "context": "middle",
        },
    }


def test_element_lifetime_dropped():
    # elements-and-selectors.md §Element lifetime
    out = run(
        "child: a { this: $element; };\n"
        'unexpected: $child | take(key: "this");',
        "<html><body><a>x</a></body></html>",
    )
    assert out == {"child": {}, "unexpected": None}


def test_qualifier_triptych():
    # elements-and-selectors.md §Selecting multiple elements
    html = (
        "<html><body><li>1</li><li class=\"even\">2</li>"
        "<li>3</li><li class=\"even\">4</li></body></html>"
    )
    out = run(
        "first_num: li { text: $element | text(); };\n"
        "numbers: li { text: $element | text(); }*;\n"
        "optional: #not-here { text: $element | text(); }?;",
        html,
    )
    assert out == {
        "first_num": {"text": "1"},
        "numbers": [{"text": str(n)} for n in (1, 2, 3, 4)],
        "optional": None,
    }


def test_filters_do_not_mutate_bindings():
    # filters.md §Modifying filters
    out = run('bind: "5"; new: $bind | int();')
    assert out == {"bind": "5", "new": 5}
    assert isinstance(out["bind"], str) and isinstance(out["new"], int)


def test_filter_chaining():
    # filters.md §Chaining filters
    out = run('is-not-five: "5" | int() | eq(to: 5) | not();')
    assert out == {"is-not-five": False}


def test_filter_qualifiers_map_and_optional():
    # filters.md §Qualifiers (null literal doesn't exist in the
    # grammar — optional2 derives its null from an optional block)
    out = run(
        'floats: "1 2.3 4.5" | split() | float()*;\n'
        'optional: "3.4" | float()?;\n'
        "optional2: .nope {}? | float()?;",
        "<html><body></body></html>",
    )
    assert out == {
        "floats": [1.0, 2.3, 4.5],
        "optional": 3.4,
        "optional2": None,
    }
    assert all(isinstance(x, float) for x in out["floats"])


def test_inline_value_equivalence():
    # advanced-features.md §Inline values
    out1 = run('result: 5 | is_in(list: <"1 2 3 4 5" | split() | int()*>);')
    assert out1 == {"result": True}
    out2 = run(
        'intermediate: "1 2 3 4 5" | split() | int()*;\n'
        "result: 5 | is_in(list: $intermediate);"
    )
    assert out2 == {"intermediate": [1, 2, 3, 4, 5], "result": True}


def test_url_recursion_book_example():
    # advanced-features.md §URL Recursion (code-correct spelling:
    # href via attrs() | take)
    index = (
        "<html><body>"
        '<p id="story">There once lived a great animal.</p>'
        '<a id="next" href="page2.html">Continue</a>'
        "</body></html>"
    )
    page2 = (
        "<html><body>"
        '<p id="story">This animal was a great animal. The end.</p>'
        "</body></html>"
    )

    def fetch(url):
        assert url == "https://your-url.com/page2.html"
        return parse_html(page2)

    out = run(
        "next-page-link: #next {\n"
        '  link: $element | attrs() | take(key: "href");\n'
        '} | take(key: "link");\n'
        "page-1: #story { content: $element | text(); }\n"
        '  | take(key: "content");\n'
        "page-2: <$next-page-link> #story { content: $element | text(); }\n"
        '  | take(key: "content");',
        index,
        fetcher=fetch,
    )
    assert out == {
        "next-page-link": "page2.html",
        "page-1": "There once lived a great animal.",
        "page-2": "This animal was a great animal. The end.",
    }


def test_doc_whitespace_selector_contradiction():
    """The book claims `a#b .c.d` selects a descendant; the parser
    merges it into one compound (ast.rs:190-191, parser.rs:268-272).
    Code wins: the merged compound matches nothing here."""
    html = '<html><body><a id="b"><span class="c d">x</span></a></body></html>'
    with pytest.raises(EvalError, match="expected exactly one value"):
        run("x: a#b .c.d { t: $element | text(); };", html)

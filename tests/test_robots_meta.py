"""rel=nofollow / <meta name=robots> semantics: anchor-level and
page-level nofollow drop outlinks, noindex suppresses the record while
links are still followed, and the distributed crawl matches the
sequential simulator byte-for-byte on a corpus that exercises all of
it (both sides share the same directive functions by construction —
this pins the BEHAVIOR, not just the sharing).
"""

from scrapelect_spark.functions.dom import parse_html
from scrapelect_spark.streaming.crawl import (
    Crawler,
    CrawlConfig,
    extract_links,
    page_robots_directives,
)
from scrapelect_spark.streaming.reference_sim import SequentialCrawler

PROG = 'title: h1 { t: $element | text(); } | take(key: "t");'


def test_rel_nofollow_keeps_positions():
    html = (
        '<html><body>'
        '<a href="/a.html">a</a>'
        '<a rel="nofollow" href="/b.html">b</a>'
        '<a rel="NOFOLLOW noopener" href="/c.html">c</a>'
        '<a rel="noopener" href="/d.html">d</a>'
        "</body></html>"
    )
    links = extract_links(parse_html(html), "http://x.test/p.html")
    assert links == [
        "http://x.test/a.html",
        None,  # nofollow — position kept so link_seq lineage is stable
        None,  # case-insensitive, multi-token rel
        "http://x.test/d.html",
    ]


def test_base_href_resolution():
    html = (
        '<html><head><base href="/deep/dir/"></head><body>'
        '<a href="rel.html">r</a>'
        '<a href="/abs.html">a</a>'
        '<a href="http://other.test/x.html">x</a>'
        "</body></html>"
    )
    links = extract_links(parse_html(html), "http://x.test/p.html")
    assert links == [
        "http://x.test/deep/dir/rel.html",   # against the base element
        "http://x.test/abs.html",            # absolute path unaffected
        "http://other.test/x.html",          # absolute URL unaffected
    ]
    # base itself resolves against the page URL when relative; only
    # the FIRST base element counts
    html2 = (
        '<html><head><base href="sub/"><base href="/other/"></head>'
        '<body><a href="leaf.html">l</a></body></html>'
    )
    links2 = extract_links(parse_html(html2), "http://x.test/a/p.html")
    assert links2 == ["http://x.test/a/sub/leaf.html"]
    # no base tag: unchanged behavior
    html3 = '<html><body><a href="leaf.html">l</a></body></html>'
    assert extract_links(parse_html(html3), "http://x.test/a/p.html") == [
        "http://x.test/a/leaf.html"
    ]


def test_page_robots_directives():
    def d(meta):
        return page_robots_directives(
            parse_html(f"<html><head>{meta}</head><body></body></html>")
        )

    assert d('<meta name="robots" content="noindex, nofollow">') == {
        "noindex", "nofollow",
    }
    assert d('<meta name="ROBOTS" content="NOINDEX">') == {"noindex"}
    assert d('<meta name="robots" content="none">') >= {
        "noindex", "nofollow",
    }
    assert d('<meta name="viewport" content="width=1">') == frozenset()
    assert d("") == frozenset()
    # two tags merge
    assert d(
        '<meta name="robots" content="noindex">'
        '<meta name="robots" content="nofollow">'
    ) == {"noindex", "nofollow"}


def _corpus(base):
    return {
        f"{base}/root.html": (
            "<html><body><h1>root</h1>"
            f'<a href="{base}/noidx.html">ni</a>'
            f'<a href="{base}/nofol.html">nf</a>'
            f'<a rel="nofollow" href="{base}/orphan.html">o</a>'
            "</body></html>"
        ),
        # noindex: no record, but its link IS followed
        f"{base}/noidx.html": (
            '<html><head><meta name="robots" content="noindex"></head>'
            f'<body><h1>noidx</h1><a href="{base}/leaf.html">l</a>'
            "</body></html>"
        ),
        # page-level nofollow: record kept, outlink dropped
        f"{base}/nofol.html": (
            '<html><head><meta name="robots" content="nofollow"></head>'
            f'<body><h1>nofol</h1><a href="{base}/dead.html">d</a>'
            "</body></html>"
        ),
        f"{base}/leaf.html": "<html><body><h1>leaf</h1></body></html>",
        f"{base}/orphan.html": "<html><body><h1>orphan</h1></body></html>",
        f"{base}/dead.html": "<html><body><h1>dead</h1></body></html>",
    }


def test_crawl_honors_meta_robots(spark, tmp_path):
    base = "http://m.test"
    corpus = _corpus(base)
    corpus_df = spark.createDataFrame(
        list(corpus.items()), "url string, html string"
    )
    seeds = [(f"{base}/root.html", 0)]
    cfg = CrawlConfig(
        batch_size=8, per_host_limit=8, fetch_partitions=2, compact_every=0
    )

    c = Crawler(
        spark, str(tmp_path / "m"), corpus_df, seeds, program=PROG,
        config=cfg,
    )
    c.run(max_batches=5)
    sim = SequentialCrawler(corpus, seeds, program=PROG, config=cfg)
    sim.run()

    visited = {u for u, _, _ in c.visit_log()}
    # anchor-level nofollow: orphan never discovered
    assert f"{base}/orphan.html" not in visited
    # page-level nofollow: dead never discovered
    assert f"{base}/dead.html" not in visited
    # noindex page itself IS crawled and its links followed
    assert f"{base}/noidx.html" in visited
    assert f"{base}/leaf.html" in visited

    recs = c.records_json()
    assert f"{base}/noidx.html" not in recs     # noindex → no record
    assert '"nofol"' in recs[f"{base}/nofol.html"]  # nofollow → record kept
    assert '"leaf"' in recs[f"{base}/leaf.html"]

    # distributed crawl ≡ sequential simulator, byte-for-byte
    assert c.visit_log() == sim.visit_log
    assert c.records_json() == sim.records


def test_extract_image_refs(spark):
    from scrapelect_spark.operators.curation import extract_image_refs

    html = (
        '<html><head><base href="/deep/"></head><body>'
        '<img src="a.png" alt="A">'
        '<img srcset=" b1.png 480w , b2.png 2x ,, " alt="B">'
        '<img data-src="c.png">'
        '<img src="d.png" data-src="ignored.png">'
        "<img>"  # no source at all → no row
        "</body></html>"
    )
    df = spark.createDataFrame(
        [("http://x.test/p/page.html", html),
         ("http://x.test/none.html", None)],
        "url string, html string",
    )
    rows = extract_image_refs(df).orderBy("seq").collect()
    assert [r.img_url for r in rows] == [
        "http://x.test/deep/a.png",       # base href applies
        "http://x.test/deep/b1.png",
        "http://x.test/deep/b2.png",
        "http://x.test/deep/c.png",
        "http://x.test/deep/d.png",       # src wins over data-src
    ]
    assert [r.source for r in rows] == [
        "src", "srcset", "srcset", "data-src", "src"
    ]
    assert [r.descriptor for r in rows] == [None, "480w", "2x", None, None]
    assert rows[0].alt == "A" and rows[3].alt is None
    assert all(r.page_url == "http://x.test/p/page.html" for r in rows)


def test_extract_main_text(spark):
    from scrapelect_spark.operators.curation import extract_image_refs  # noqa: F401
    from scrapelect_spark.operators.textstats import extract_main_text

    prose = "This is a long enough paragraph of real prose " + "y" * 20
    linky = '<a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a>'
    html = (
        "<html><body>"
        f"<p>{linky}</p>"                 # pure links → dropped
        f"<p>{prose}</p>"                 # kept
        "<p>   </p>"                      # empty after normalize → no-op
        "<p>short</p>"                    # < 40 chars → dropped
        f'<p>{prose} <a href="/x">tiny</a></p>'  # low density → kept
        "</body></html>"
    )
    df = spark.createDataFrame(
        [("http://x.test/a.html", html)], "url string, html string"
    )
    r = extract_main_text(df).collect()[0]
    assert r.n_blocks == 5
    assert r.n_kept == 2
    assert r.main_text == prose + "\n" + prose + " tiny"
    assert r.main_len == len(r.main_text)
    # dropped: 'one two three' (13) + 'short' (5); the whitespace-only
    # block contributes nothing
    assert r.boiler_len == 13 + 5


def test_extract_image_refs_picture_source(spark):
    from scrapelect_spark.operators.curation import extract_image_refs

    html = (
        "<html><body><picture>"
        '<source srcset="w1.webp 1x, w2.webp 2x" type="image/webp">'
        '<img src="fallback.png" alt="Pic">'
        "</picture>"
        '<source srcset="orphan.png">'  # source outside picture: no alt
        "</body></html>"
    )
    df = spark.createDataFrame(
        [("http://x.test/p.html", html)], "url string, html string"
    )
    rows = extract_image_refs(df).orderBy("seq").collect()
    assert [(r.img_url.rsplit("/", 1)[1], r.alt, r.source, r.descriptor)
            for r in rows] == [
        ("w1.webp", "Pic", "source", "1x"),
        ("w2.webp", "Pic", "source", "2x"),
        ("fallback.png", "Pic", "src", None),
        ("orphan.png", None, "source", "1x"),
    ]


def test_extract_og_meta(spark):
    from scrapelect_spark.operators.curation import extract_og_meta

    html = (
        '<html><head><base href="/art/">'
        '<meta property="og:title" content=" Spaced Title ">'
        '<meta property="og:image" content="pic.png">'
        '<meta name="twitter:card" content="summary">'
        '<meta property="og:title" content="duplicate-loses">'
        '<meta name="description" content="plain, not og">'
        "</head><body></body></html>"
    )
    bare = "<html><head></head><body>no tags</body></html>"
    df = spark.createDataFrame(
        [("http://x.test/p/a.html", html),
         ("http://x.test/p/b.html", bare)],
        "url string, html string",
    )
    rows = {r.page_url: r for r in extract_og_meta(df).collect()}
    a = rows["http://x.test/p/a.html"]
    assert a.og_title == "Spaced Title"          # first wins, stripped
    assert a.og_image == "http://x.test/art/pic.png"  # base href applies
    assert a.twitter_card == "summary"
    assert a.og_description is None and a.has_og == 1
    b = rows["http://x.test/p/b.html"]
    assert b.has_og == 0 and b.og_title is None and b.og_image is None


def test_extract_jsonld(spark):
    from scrapelect_spark.operators.curation import extract_jsonld

    html = (
        '<html><head><base href="/news/">'
        '<script type="application/ld+json">'
        '{"@graph": [{"@type": ["NewsArticle", "Article"], '
        '"headline": "H1", "image": {"@type": "ImageObject", '
        '"url": "a.png"}, "author": [{"name": "Ann"}]}, '
        '{"@type": "Organization", "name": "Org"}]}'
        "</script>"
        '<script type="application/ld+json">broken {</script>'
        '<script type="text/javascript">var x = 1;</script>'
        "</head><body></body></html>"
    )
    df = spark.createDataFrame(
        [("http://x.test/p.html", html)], "url string, html string"
    )
    rows = extract_jsonld(df).orderBy("seq").collect()
    assert len(rows) == 3
    a = rows[0]
    assert a.ld_type == "NewsArticle"          # list → first
    assert a.headline == "H1"
    assert a.image_url == "http://x.test/news/a.png"  # ImageObject + base
    assert a.author == "Ann"                   # list of Person → name
    o = rows[1]
    assert o.ld_type == "Organization" and o.headline == "Org"
    assert o.image_url is None
    bad = rows[2]
    assert bad.parse_error and bad.ld_type is None


def test_extract_microdata_nesting(spark):
    from scrapelect_spark.operators.curation import extract_microdata

    html = (
        '<html><head><base href="/shop/"></head><body>'
        '<div itemscope itemtype="https://schema.org/Product">'
        '<span itemprop="name">Widget</span>'
        '<div itemscope itemtype="https://schema.org/Offer">'
        '<meta itemprop="price" content="9.99">'
        "</div>"
        '<img itemprop="image" src="w.png">'
        '<time itemprop="releaseDate" datetime="2024-05-06">May</time>'
        "</div></body></html>"
    )
    df = spark.createDataFrame(
        [("http://x.test/p/page.html", html)], "url string, html string"
    )
    rows = extract_microdata(df).collect()
    by = {(r.item_seq, r.prop): r for r in rows}
    # outer item owns name/image/releaseDate; the nested Offer's price
    # belongs to the INNER scope which is not a top-level item here —
    # it is swallowed by the inner-scope cut (props of nested items
    # are not the outer item's)
    assert (0, "name") in by and by[(0, "name")].value == "Widget"
    assert by[(0, "image")].value == "http://x.test/shop/w.png"
    assert by[(0, "releaseDate")].value == "2024-05-06"
    assert (0, "price") not in by
    types = {r.item_type for r in rows}
    assert types == {"https://schema.org/Product"}
